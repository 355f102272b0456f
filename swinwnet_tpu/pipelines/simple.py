"""Single-tower inference pipelines (BASELINE configs #1 and #2).

* `make_segmentation_fn(SwinUNet)` — [B,1|2,H,W] -> sigmoid probability map
  (checkpoint: SwinUnet_binary_segmentation_diffraction.pth).
* `make_sr_fn(SwinUNetSR)` — masked pattern -> 2x super-resolved pattern
  (checkpoint: SwinUnetSR_upscaler_for_segmented_diffraction.pth), with the
  reference's normalize -> upscale -> denormalize wrapping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.swin_unet import SwinUNet, SwinUNetSR
from ..ops.norms import denormalize_piecewise, normalize_piecewise


def make_segmentation_fn(model: SwinUNet):
    @jax.jit
    def fn(variables, images):
        logits = model.apply(variables, images)
        return jax.nn.sigmoid(logits)

    return fn


def make_sr_fn(model: SwinUNetSR, normalize: bool = True):
    @jax.jit
    def fn(variables, images):
        if normalize:
            norm, params = normalize_piecewise(images)
            up = model.apply(variables, norm)
            return denormalize_piecewise(up, params)
        return model.apply(variables, images)

    return fn
