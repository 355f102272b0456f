"""Image resize ops with PyTorch-compatible semantics.

The reference relies on three torch resize flavors:
* `F.interpolate(mode='bilinear', align_corners=False)` for head upsampling
  (SwinWNet.py:526);
* `F.interpolate(scale_factor=0.5, mode='bilinear')` to synthesize LR training
  inputs (Upscaler_pretrain.py:200-205);
* `F.interpolate(mode='nearest-exact')` for 2x mask upsampling
  (FullModel_supervised_trainer.py:275-279).

torch bilinear uses half-pixel source mapping WITHOUT antialiasing — for
downscaling this differs from `jax.image.resize`, which antialiases by
widening the triangle kernel. We therefore implement the separable gather
form directly: per output pixel, src = (dst + 0.5) * scale - 0.5, clamped,
two taps per axis. Static shapes; XLA lowers the gathers to cheap dynamic
slices / one-hot matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _axis_weights(out_size: int, in_size: int):
    """Half-pixel (align_corners=False) source taps + lerp weights, static."""
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of [..., H, W], exact torch
    `interpolate(mode='bilinear', align_corners=False)` semantics (up AND
    down — no antialias)."""
    H, W = x.shape[-2], x.shape[-1]
    if (out_h, out_w) == (H, W):
        return x

    rlo, rhi, rw = _axis_weights(out_h, H)
    clo, chi, cw = _axis_weights(out_w, W)
    rw = jnp.asarray(rw)[:, None]  # [out_h, 1]
    cw = jnp.asarray(cw)  # [out_w]

    top = x[..., rlo, :]
    bot = x[..., rhi, :]
    rows = top * (1 - rw) + bot * rw  # [..., out_h, W]

    left = rows[..., :, clo]
    right = rows[..., :, chi]
    return left * (1 - cw) + right * cw


def bilinear_downscale_half(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [..., H//2, W//2], torch `scale_factor=0.5` bilinear.

    For even sizes this is exactly 2x2 average pooling (each output center
    falls midway between two source pixels per axis), which XLA lowers to a
    single reduce-window — cheaper than the gather form."""
    H, W = x.shape[-2], x.shape[-1]
    if H % 2 == 0 and W % 2 == 0:
        shape = x.shape[:-2] + (H // 2, 2, W // 2, 2)
        return x.reshape(shape).mean(axis=(-3, -1))
    return bilinear_resize(x, H // 2, W // 2)


def nearest_exact_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch 'nearest-exact': src = floor((dst + 0.5) * scale_inv)."""
    H, W = x.shape[-2], x.shape[-1]
    rows = jnp.clip(jnp.floor((jnp.arange(out_h) + 0.5) * (H / out_h)).astype(jnp.int32), 0, H - 1)
    cols = jnp.clip(jnp.floor((jnp.arange(out_w) + 0.5) * (W / out_w)).astype(jnp.int32), 0, W - 1)
    return x[..., rows, :][..., :, cols]
