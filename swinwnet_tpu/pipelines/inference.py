"""The canonical 8-stage SwinWNet inference pipeline, as ONE jitted function.

The reference `SwinWNetInference` (ST_Inference_Pipline.py:4-135) runs eight
eager stages and stashes every intermediate on `self`. Here the whole flow —
ensure_2ch -> segment_1 -> mask -> normalize -> upscale -> denormalize ->
segment_2 -> mask — is a single pure function returning a stages pytree, so
XLA fuses across stage boundaries, nothing round-trips through host memory,
and the same compiled executable `pjit`s over a data mesh unchanged.

A thin class wrapper restores the reference's attribute API
(`infer.seg_map_lr`, ...) for drop-in compatibility.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..models.swin_wnet import SwinWNet
from ..ops.norms import denormalize_piecewise, ensure_2ch, normalize_piecewise

STAGE_NAMES = (
    "images",
    "seg_map_lr",
    "images_masked_lr",
    "norm",
    "upscaled_norm",
    "upscaled_denorm",
    "seg_map_hr",
    "images_masked_hr",
)


def inference_stages(model: SwinWNet, variables, images) -> Dict[str, jnp.ndarray]:
    """Pure 8-stage forward (ST_Inference_Pipline.py:73-135). Returns the full
    stages dict; jit-wrap with `model` static (see `make_inference_fn`)."""
    # 1. ensure 2 channels
    images = ensure_2ch(images)

    # 2. low-resolution segmentation
    seg, skips_seg = model.apply(variables, images, method=SwinWNet.segment_1)
    seg_map_lr = jax.nn.sigmoid(seg)

    # 3. filtering (LR)
    images_masked_lr = images * seg_map_lr

    # 4. normalization
    norm, params_norm = normalize_piecewise(images_masked_lr)

    # 5. upscaling
    upscaled_norm, skips_sr = model.apply(variables, norm, skips_seg, method=SwinWNet.upscale)

    # 6. denormalization
    upscaled_denorm = denormalize_piecewise(upscaled_norm, params_norm)

    # 7. high-resolution segmentation
    seg_high, _ = model.apply(variables, upscaled_denorm, skips_sr, method=SwinWNet.segment_2)
    seg_map_hr = jax.nn.sigmoid(seg_high)

    # 8. final filtering
    images_masked_hr = upscaled_denorm * seg_map_hr

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


def make_inference_fn(model: SwinWNet, donate: bool = False):
    """jit-compiled (variables, images) -> stages dict."""
    fn = functools.partial(inference_stages, model)
    return jax.jit(fn, donate_argnums=(1,) if donate else ())


class SwinWNetInference:
    """Reference-compatible wrapper: call with a batch, read stage attributes
    (ST_Inference_Pipline.py:17-26). Returns `images_masked_hr`.

    `split=True` compiles the three towers as separate XLA executables
    (pipelines/split.py) instead of one whole-pipeline graph — ~3x lower
    peak compile memory, for memory-constrained compile services (the
    round-4 remote-compile HTTP 500s) at the cost of cross-stage fusion."""

    def __init__(self, model: SwinWNet, variables, split: bool = False):
        self.model = model
        self.variables = variables
        if split:
            from .split import make_split_inference_fn

            self._fn = make_split_inference_fn(model)
        else:
            self._fn = make_inference_fn(model)
        self._reset_outputs()

    def _reset_outputs(self):
        for name in STAGE_NAMES:
            setattr(self, name, None)

    # static utils kept on the class for API parity
    ensure_2ch = staticmethod(ensure_2ch)
    normalize_piecewise = staticmethod(normalize_piecewise)
    denormalize_piecewise = staticmethod(denormalize_piecewise)

    def __call__(self, images):
        self._reset_outputs()
        stages = self._fn(self.variables, jnp.asarray(images))
        for name in STAGE_NAMES:
            setattr(self, name, stages[name])
        return self.images_masked_hr
