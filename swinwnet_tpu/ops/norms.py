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
