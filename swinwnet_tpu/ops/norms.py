"""Input preparation + piecewise log normalization.

Functional equivalents of the static methods copy-pasted across five reference
files (canonical: ST_Inference_Pipline.py:32-67). `normalize_piecewise`
min-max scales per image, then applies log1p above a threshold;
`denormalize_piecewise` is its exact inverse given the saved params.

All ops are elementwise/reduction — XLA fuses them into adjacent kernels.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def ensure_2ch(x: jnp.ndarray) -> jnp.ndarray:
    """[B,1,H,W] -> [B,2,H,W] by synthesizing the Poisson error channel
    err = sqrt(|I|) (ST_Inference_Pipline.py:32-37)."""
    if x.shape[1] == 2:
        return x
    err = jnp.sqrt(jnp.abs(x))
    return jnp.concatenate([x, err], axis=1)


def normalize_piecewise(
    x: jnp.ndarray, threshold: float = 0.01, eps: float = 1e-6
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-image min-max to [0,1], log1p where above threshold
    (ST_Inference_Pipline.py:39-55)."""
    x_min = jnp.min(x, axis=(2, 3), keepdims=True)
    x_max = jnp.max(x, axis=(2, 3), keepdims=True)
    x01 = (x - x_min) / (x_max - x_min + eps)
    x_norm = jnp.where(x01 > threshold, jnp.log1p(x01), x01)
    params = {"x_min": x_min, "x_max": x_max, "threshold": threshold}
    return x_norm, params


def denormalize_piecewise(
    x_norm: jnp.ndarray, params: Dict[str, jnp.ndarray], eps: float = 1e-6
) -> jnp.ndarray:
    """Inverse of `normalize_piecewise` (ST_Inference_Pipline.py:57-67)."""
    x_min = params["x_min"]
    x_max = params["x_max"]
    threshold = params["threshold"]
    x01 = jnp.where(x_norm > threshold, jnp.expm1(x_norm), x_norm)
    return x01 * (x_max - x_min + eps) + x_min


# ---------------------------------------------------------------------------
# The *notebook* convention (the published physical-metrics protocol)
# ---------------------------------------------------------------------------

_LOG2 = 0.6931471805599453  # log1p(1.0)


def normalize_piecewise_notebook(
    x: jnp.ndarray, threshold: float = 0.01, eps: float = 1e-6
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The evaluation notebook's normalize: identical to
    `normalize_piecewise` except the log branch divides by ``log1p(1.0)``
    (experiments/Physycal_metrics_test.ipynb cells 12 and 18), mapping the
    strong-pixel range onto [0, 1] instead of [0, 0.693].

    This is NOT the convention the models are trained/served with (every
    trainer and inference pipeline uses the plain-log1p form, e.g.
    Upscaler_pretrain.py:144) — but it IS the convention that produced all
    four published ``*_physycal_metrics_extended.json`` baselines, so
    physical-metric comparisons against those files must run through this
    pair. Crucially its `denormalize` partner (below, == the shared
    plain-expm1 denorm) is *not* its inverse: denorm(norm(x01)) =
    expm1(log1p(x01)/log2) inflates strong pixels nonlinearly (3.23x at the
    max). Measured on the real reference patterns, that inflation almost
    exactly cancels the published protocol's `scale=True` /4 + the
    HR-vs-LR-grid pixel-count ratio, which is why the published bilinear
    baseline shows a tiny Peak Intensity error (0.199) — reproducing those
    numbers requires reproducing this quirk.
    """
    x_min = jnp.min(x, axis=(2, 3), keepdims=True)
    x_max = jnp.max(x, axis=(2, 3), keepdims=True)
    x01 = (x - x_min) / (x_max - x_min + eps)
    x_norm = jnp.where(x01 > threshold, jnp.log1p(x01) / _LOG2, x01)
    params = {"x_min": x_min, "x_max": x_max, "threshold": threshold}
    return x_norm, params


def denormalize_piecewise_notebook(
    x_norm: jnp.ndarray, params: Dict[str, jnp.ndarray], eps: float = 1e-6
) -> jnp.ndarray:
    """The notebook's denormalize (ipynb cell 12/18): plain ``expm1`` — the
    same numerics as `denormalize_piecewise`, aliased for protocol clarity.
    See `normalize_piecewise_notebook` for why the pair is intentionally
    non-inverse."""
    return denormalize_piecewise(x_norm, params, eps)
