"""Split-compilation variant of the 8-stage pipeline.

`make_split_inference_fn` compiles segment_1 / upscale / segment_2 as three
separate XLA executables chained by a thin python driver (arrays stay on
device between them). Compared to the single-graph `make_inference_fn` this
gives up cross-stage elementwise fusion but:

* cuts peak compile memory ~3x (relevant where kernel compilation is
  memory-constrained, e.g. remote-compile services, and for Mosaic-heavy
  `use_pallas` builds);
* caches/compiles incrementally, so partial pipelines (segmentation-only
  serving) reuse the same executables.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..models.swin_wnet import SwinWNet
from ..ops.norms import denormalize_piecewise, ensure_2ch, normalize_piecewise


def make_split_inference_fn(model: SwinWNet):
    @jax.jit
    def stage_a(variables, images):
        images = ensure_2ch(images)
        seg, skips_seg = model.apply(variables, images, method=SwinWNet.segment_1)
        seg_map_lr = jax.nn.sigmoid(seg)
        images_masked_lr = images * seg_map_lr
        norm, params_norm = normalize_piecewise(images_masked_lr)
        return images, seg_map_lr, images_masked_lr, norm, params_norm, skips_seg

    @jax.jit
    def stage_b(variables, norm, params_norm, skips_seg):
        upscaled_norm, skips_sr = model.apply(variables, norm, skips_seg, method=SwinWNet.upscale)
        upscaled_denorm = denormalize_piecewise(upscaled_norm, params_norm)
        return upscaled_norm, upscaled_denorm, skips_sr

    @jax.jit
    def stage_c(variables, upscaled_denorm, skips_sr):
        seg_high, _ = model.apply(variables, upscaled_denorm, skips_sr, method=SwinWNet.segment_2)
        seg_map_hr = jax.nn.sigmoid(seg_high)
        return seg_map_hr, upscaled_denorm * seg_map_hr

    def fn(variables, images) -> Dict[str, jnp.ndarray]:
        images, seg_map_lr, images_masked_lr, norm, params_norm, skips_seg = stage_a(
            variables, images
        )
        upscaled_norm, upscaled_denorm, skips_sr = stage_b(variables, norm, params_norm, skips_seg)
        seg_map_hr, images_masked_hr = stage_c(variables, upscaled_denorm, skips_sr)
        return {
            "images": images,
            "seg_map_lr": seg_map_lr,
            "images_masked_lr": images_masked_lr,
            "norm": norm,
            "upscaled_norm": upscaled_norm,
            "upscaled_denorm": upscaled_denorm,
            "seg_map_hr": seg_map_hr,
            "images_masked_hr": images_masked_hr,
        }

    return fn
