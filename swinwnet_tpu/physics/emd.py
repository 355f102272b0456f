"""Peak-shape Wasserstein-1 (EMD) metrics (reference: Diffraction_metrics.py:150-203).

Profiles are normalized to unit mass, resampled onto a relative grid
``x = (d - d_peak) / d_peak`` over ``linspace(-0.03, 0.03, 64)`` and compared
via W1 = sum |CDF_p - CDF_q| * dx. Pure-numpy host versions for the eval
harness plus a vectorized JAX version for compiled reward graphs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

X_REF = np.linspace(-0.03, 0.03, 64)


def normalize_profile(I):
    s = np.sum(I)
    if s <= 0:
        return None
    return I / s


def resample_profile(d, I, d_center, x_ref):
    x = (d - d_center) / d_center
    I_norm = normalize_profile(I)
    if I_norm is None:
        return None
    return np.interp(x_ref, x, I_norm, left=0.0, right=0.0)


def emd_1d(p, q, dx):
    cdf_p = np.cumsum(p)
    cdf_q = np.cumsum(q)
    return np.sum(np.abs(cdf_p - cdf_q)) * dx


def emd_shape_loss(peak1, peak2, x_ref=X_REF, eps=1e-12):
    p1 = resample_profile(peak1["profile_d"], peak1["profile_I"], peak1["d"], x_ref)
    p2 = resample_profile(peak2["profile_d"], peak2["profile_I"], peak2["d"], x_ref)
    if p1 is None or p2 is None:
        return 0.0
    p1 = np.maximum(p1, 0)
    p2 = np.maximum(p2, 0)
    p1 = p1 / (np.sum(p1) + eps)
    p2 = p2 / (np.sum(p2) + eps)
    dx = x_ref[1] - x_ref[0]
    return emd_1d(p1, p2, dx)


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
