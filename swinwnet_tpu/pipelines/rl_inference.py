"""RL-augmented inference: the ST pipeline with a deterministic alpha-policy
gain applied to the SR output (reference: RL_Inference_Pipline.py:6-146).

Stage order (reference :95-145): ensure_2ch -> segment_1 -> mask ->
normalize -> policy(mu) -> upscale -> apply_action -> denormalize ->
segment_2 -> mask. One jitted function, `alpha` exposed as an extra stage.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..models.alpha_policy import AlphaPolicy, apply_action
from ..models.swin_wnet import SwinWNet
from ..ops.norms import denormalize_piecewise, ensure_2ch, normalize_piecewise
from .inference import STAGE_NAMES


def rl_inference_stages(
    model: SwinWNet, policy: AlphaPolicy, variables, policy_variables, images
) -> Dict[str, jnp.ndarray]:
    images = ensure_2ch(images)

    seg, skips_seg = model.apply(variables, images, method=SwinWNet.segment_1)
    seg_map_lr = jax.nn.sigmoid(seg)
    images_masked_lr = images * seg_map_lr
    norm, params_norm = normalize_piecewise(images_masked_lr)

    # policy: deterministic action = mu (RL_Inference_Pipline.py:113-116)
    mu, _ = policy.apply(policy_variables, norm)
    alpha = mu

    upscaled_norm, skips_sr = model.apply(variables, norm, skips_seg, method=SwinWNet.upscale)
    upscaled_norm = apply_action(upscaled_norm, alpha)

    upscaled_denorm = denormalize_piecewise(upscaled_norm, params_norm)
    seg_high, _ = model.apply(variables, upscaled_denorm, skips_sr, method=SwinWNet.segment_2)
    seg_map_hr = jax.nn.sigmoid(seg_high)
    images_masked_hr = upscaled_denorm * seg_map_hr

    return {
        "images": images,
        "seg_map_lr": seg_map_lr,
        "images_masked_lr": images_masked_lr,
        "norm": norm,
        "alpha": alpha,
        "upscaled_norm": upscaled_norm,
        "upscaled_denorm": upscaled_denorm,
        "seg_map_hr": seg_map_hr,
        "images_masked_hr": images_masked_hr,
    }


def make_rl_inference_fn(model: SwinWNet, policy: AlphaPolicy):
    fn = functools.partial(rl_inference_stages, model, policy)
    return jax.jit(fn)


class RLInference:
    """Reference-compatible wrapper (same attribute API as SwinWNetInference,
    plus `alpha`)."""

    def __init__(self, model: SwinWNet, variables, policy: AlphaPolicy, policy_variables):
        self.model = model
        self.variables = variables
        self.policy = policy
        self.policy_variables = policy_variables
        self._fn = make_rl_inference_fn(model, policy)
        self._reset_outputs()

    def _reset_outputs(self):
        for name in STAGE_NAMES + ("alpha",):
            setattr(self, name, None)

    def __call__(self, images):
        self._reset_outputs()
        stages = self._fn(self.variables, self.policy_variables, jnp.asarray(images))
        for name, value in stages.items():
            setattr(self, name, value)
        return self.images_masked_hr
