"""Supervised losses (reference: supervised_losses.py).

Functional jnp ports with torch-matching semantics. Segmentation losses take
logits [N,1,H,W] and float targets; SR losses are plain regressions. The
string registries preserve the reference's public loss vocabulary
(Segmentator_pretrain.py:39-52, Upscaler_pretrain.py:39-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def bce_with_logits(logits, target, reduction: str = "mean"):
    """Numerically stable BCE-with-logits (torch semantics)."""
    target = target.astype(logits.dtype)
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def dice_loss(pred_logits, target, eps: float = 1e-6):
    """supervised_losses.py:26-37."""
    pred = _sigmoid(pred_logits)
    target = target.astype(pred.dtype)
    intersection = (pred * target).sum(axis=(1, 2, 3))
    union = pred.sum(axis=(1, 2, 3)) + target.sum(axis=(1, 2, 3))
    dice = (2.0 * intersection + eps) / (union + eps)
    return 1.0 - dice.mean()


def tversky_loss(pred_logits, target, alpha: float = 0.5, beta: float = 0.5, eps: float = 1e-6):
    """supervised_losses.py:40-53."""
    pred = _sigmoid(pred_logits)
    target = target.astype(pred.dtype)
    TP = (pred * target).sum(axis=(1, 2, 3))
    FP = (pred * (1 - target)).sum(axis=(1, 2, 3))
    FN = ((1 - pred) * target).sum(axis=(1, 2, 3))
    tversky = (TP + eps) / (TP + alpha * FP + beta * FN + eps)
    return 1.0 - tversky.mean()


def focal_tversky_loss(pred_logits, target, alpha: float = 0.5, beta: float = 0.5, gamma: float = 0.75):
    """supervised_losses.py:55-62 (note: the reference computes
    1 - tversky_score**gamma via t = 1 - loss)."""
    t = 1.0 - tversky_loss(pred_logits, target, alpha, beta)
    return 1.0 - t**gamma


def focal_bce(logits, target, alpha: float = 0.25, gamma: float = 2.0, reduction: str = "mean"):
    """supervised_losses.py:65-81."""
    target = target.astype(logits.dtype)
    bce = bce_with_logits(logits, target, reduction="none")
    pred_prob = _sigmoid(logits)
    p_t = target * pred_prob + (1 - target) * (1 - pred_prob)
    mod = (1 - p_t) ** gamma
    loss = alpha * mod * bce
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def combined_loss(
    logits, target, boundary_weight_map=None, w_bce: float = 1.0, w_dice: float = 1.0
):
    """BCE + Dice with optional per-pixel boundary weights
    (supervised_losses.py:84-102)."""
    bce = bce_with_logits(logits, target, reduction="none")
    if boundary_weight_map is not None:
        bce = (bce * boundary_weight_map).mean()
    else:
        bce = bce.mean()
    return w_bce * bce + w_dice * dice_loss(logits, target)


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def smooth_l1_loss(pred, target, beta: float = 1.0):
    """torch F.smooth_l1_loss semantics."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def ssim_loss(pred, target, data_range: float = 1.0):
    """1 - SSIM on the eval protocol's domain (clamped [0,1] normalized
    patterns — tests.py:307-399 computes SSIM on clamp(norm, 0, 1)).

    TPU-native extra beyond the reference's loss menu: the published SR
    quality gate is SSIM 0.964 but the reference trains pure SmoothL1 —
    pixel losses optimize PSNR-like error and leave the structural metric
    unattended (round-3 runs: PSNR within 0.3 dB of published, SSIM 0.645
    vs 0.964). The SSIM map is a differentiable stack of convolutions, so
    optimizing it directly is free on the MXU. Clamping zeroes the SSIM
    gradient outside [0,1]; pair with a pixel loss for coverage there."""
    from ..evalharness.image_metrics import ssim

    p = jnp.clip(pred, 0.0, 1.0)
    t = jnp.clip(target, 0.0, 1.0)
    return 1.0 - ssim(p, t, data_range=data_range)


def smooth_l1_ssim_loss(pred, target, ssim_weight: float = 0.5, beta: float = 1.0):
    """SmoothL1 + ssim_weight * (1 - SSIM): the reference recipe's pixel
    term plus a direct structural term (see ssim_loss)."""
    return smooth_l1_loss(pred, target, beta) + ssim_weight * ssim_loss(pred, target)


_SEG_LOSSES = {
    "CombinedLoss": combined_loss,
    "DiceLoss": dice_loss,
    "TverskyLoss": tversky_loss,
    "FocalTverskyLoss": focal_tversky_loss,
    "FocalBCE": focal_bce,
}

_SR_LOSSES = {
    "MSELoss": mse_loss,
    "L1Loss": l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "SSIMLoss": ssim_loss,
    "SmoothL1SSIMLoss": smooth_l1_ssim_loss,
}


def get_segmentation_loss(name: str):
    if name not in _SEG_LOSSES:
        raise KeyError(f"unknown segmentation loss {name!r}; options: {sorted(_SEG_LOSSES)}")
    return _SEG_LOSSES[name]


def get_upscaler_loss(name: str):
    if name not in _SR_LOSSES:
        raise KeyError(f"unknown upscaler loss {name!r}; options: {sorted(_SR_LOSSES)}")
    return _SR_LOSSES[name]
