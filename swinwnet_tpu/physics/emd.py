"""Peak-shape Wasserstein-1 (EMD) metrics — on-device variants.

Profiles are normalized to unit mass, resampled onto a relative grid
``x = (d - d_peak) / d_peak`` over ``linspace(-0.03, 0.03, 64)`` and compared
via W1 = sum |CDF_p - CDF_q| * dx (reference: Diffraction_metrics.py:150-203).
The host-side spec transcription lives in :mod:`.host_oracle` and is
re-exported here; this module adds the fixed-shape vmap-friendly JAX versions
used inside compiled reward graphs.
"""

from __future__ import annotations

import jax.numpy as jnp

from .host_oracle import (  # noqa: F401
    X_REF,
    emd_1d,
    emd_shape_loss,
    normalize_profile,
    resample_profile,
)


# ---------------------------------------------------------------------------
# On-device variants (fixed shapes, vmap-friendly)
# ---------------------------------------------------------------------------


def jnp_interp_profile(d, I, valid, d_center, x_ref):
    """jnp.interp with masked samples; invalid samples are excluded by pushing
    their x beyond the grid so left/right fill (0) applies."""
    x = (d - d_center) / jnp.maximum(d_center, 1e-12)
    s = jnp.sum(jnp.where(valid, I, 0.0))
    I_norm = jnp.where(valid, I, 0.0) / jnp.maximum(s, 1e-30)
    x = jnp.where(valid, x, 1e9)
    order = jnp.argsort(x)
    return jnp.interp(x_ref, x[order], I_norm[order], left=0.0, right=0.0), s > 0


def emd_1d_jnp(p, q, dx):
    return jnp.sum(jnp.abs(jnp.cumsum(p) - jnp.cumsum(q))) * dx
