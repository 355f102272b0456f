"""Image-quality metrics: confusion-matrix segmentation scores, PSNR, SSIM.

Ports of the reference helpers (tests.py:12-73) plus torchmetrics-compatible
PSNR/SSIM (PeakSignalNoiseRatio / StructuralSimilarityIndexMeasure with
data_range=1.0, gaussian kernel 11 / sigma 1.5 — tests.py:176-177). Everything
is jnp and vmap-friendly, so whole-batch evaluation is one compiled call
instead of the reference's per-sample python loop.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def binarize_prediction(pred_probs, threshold: float = 0.5):
    """tests.py:12-16."""
    return (pred_probs >= threshold).astype(jnp.uint8)


def confusion_matrix_binary(pred_bin, gt_bin):
    """tests.py:18-30. Reduces over ALL axes (whole sample or whole batch,
    matching how the reference flattens)."""
    pred = pred_bin.reshape(-1).astype(jnp.bool_)
    gt = gt_bin.reshape(-1).astype(jnp.bool_)
    TP = jnp.sum(pred & gt).astype(jnp.float32)
    TN = jnp.sum(~pred & ~gt).astype(jnp.float32)
    FP = jnp.sum(pred & ~gt).astype(jnp.float32)
    FN = jnp.sum(~pred & gt).astype(jnp.float32)
    return TP, TN, FP, FN


def _scores(TP, TN, FP, FN, eps=1e-8):
    return {
        "PixelAccuracy": (TP + TN) / (TP + TN + FP + FN + eps),
        "IoU": TP / (TP + FP + FN + eps),
        "Dice": (2 * TP) / (2 * TP + FP + FN + eps),
        "Precision": TP / (TP + FP + eps),
        "Recall": TP / (TP + FN + eps),
    }


def compute_all_metrics(pred_probs, gt_mask, threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Per-sample metric dict (tests.py:61-75)."""
    pred_bin = binarize_prediction(pred_probs, threshold)
    gt_bin = gt_mask.astype(jnp.uint8)
    TP, TN, FP, FN = confusion_matrix_binary(pred_bin, gt_bin)
    return _scores(TP, TN, FP, FN)


@functools.partial(jax.jit, static_argnames=("threshold",))
def segmentation_metrics_batch(pred_probs, gt_mask, threshold: float = 0.5):
    """[B,1,H,W] probabilities + masks -> dict of [B] per-sample scores
    (vectorized across the batch)."""
    def one(p, g):
        return compute_all_metrics(p, g, threshold)

    return jax.vmap(one)(pred_probs, gt_mask)


# ---------------------------------------------------------------------------
# PSNR / SSIM (torchmetrics-compatible)
# ---------------------------------------------------------------------------


def psnr(pred, target, data_range: float = 1.0):
    """10 log10(range^2 / mse) over all elements (torchmetrics default)."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-20))


@functools.lru_cache(maxsize=4)
def _gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    k2d = np.outer(g, g)
    return k2d.astype(np.float32)


def _valid_conv_per_channel(x, kernel):
    """x: [B, C, H, W]; depthwise VALID conv with a shared [kh, kw] kernel."""
    B, C, H, W = x.shape
    k = jnp.asarray(kernel)[None, None]  # [1,1,kh,kw] OIHW
    x2 = x.reshape(B * C, 1, H, W)
    y = jax.lax.conv_general_dilated(
        x2, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(B, C, y.shape[2], y.shape[3])


def ssim(
    pred,
    target,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Structural similarity, torchmetrics defaults (gaussian 11x11 sigma 1.5,
    k1=0.01, k2=0.03, mean over the valid SSIM map)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    kern = _gaussian_kernel(kernel_size, sigma)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _valid_conv_per_channel(pred, kern)
    mu_t = _valid_conv_per_channel(target, kern)
    mu_pp = _valid_conv_per_channel(pred * pred, kern)
    mu_tt = _valid_conv_per_channel(target * target, kern)
    mu_pt = _valid_conv_per_channel(pred * target, kern)

    sigma_p = mu_pp - mu_p * mu_p
    sigma_t = mu_tt - mu_t * mu_t
    sigma_pt = mu_pt - mu_p * mu_t

    num = (2 * mu_p * mu_t + c1) * (2 * sigma_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)
