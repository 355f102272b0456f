"""Image resize ops with PyTorch-compatible semantics.

The reference relies on three torch resize flavors:
* `F.interpolate(mode='bilinear', align_corners=False)` for head upsampling
  (SwinWNet.py:526) — half-pixel centers, matches `jax.image.resize('linear')`;
* `F.interpolate(scale_factor=0.5, mode='bilinear')` to synthesize LR training
  inputs (Upscaler_pretrain.py:200-205);
* `F.interpolate(mode='nearest-exact')` for 2x mask upsampling
  (FullModel_supervised_trainer.py:275-279) — half-pixel nearest.

All are static-shape ops and lower to XLA gathers/convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of [..., H, W] with half-pixel centers
    (== torch align_corners=False)."""
    out_shape = x.shape[:-2] + (out_h, out_w)
    return jax.image.resize(x, out_shape, method="linear")


def bilinear_downscale_half(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [..., H//2, W//2] bilinear, torch scale_factor=0.5 semantics."""
    return bilinear_resize(x, x.shape[-2] // 2, x.shape[-1] // 2)


def nearest_exact_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch 'nearest-exact': src = floor((dst + 0.5) * scale_inv).

    For integer upsampling this picks the rounded-nearest source pixel
    (unlike legacy 'nearest' which floors).
    """
    H, W = x.shape[-2], x.shape[-1]
    rows = jnp.clip(jnp.floor((jnp.arange(out_h) + 0.5) * (H / out_h)).astype(jnp.int32), 0, H - 1)
    cols = jnp.clip(jnp.floor((jnp.arange(out_w) + 0.5) * (W / out_w)).astype(jnp.int32), 0, W - 1)
    return x[..., rows, :][..., :, cols]
