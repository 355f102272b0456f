"""Loss parity vs torch.nn.functional (the reference's backends)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from swinwnet_tpu.train.losses import (  # noqa: E402
    bce_with_logits,
    combined_loss,
    dice_loss,
    focal_bce,
    focal_tversky_loss,
    get_segmentation_loss,
    get_upscaler_loss,
    l1_loss,
    mse_loss,
    smooth_l1_loss,
    tversky_loss,
)

rng = np.random.default_rng(0)
logits = rng.normal(size=(2, 1, 16, 20)).astype(np.float32)
target = (rng.uniform(size=(2, 1, 16, 20)) > 0.5).astype(np.float32)
tl, tt = torch.from_numpy(logits), torch.from_numpy(target)


def close(a, b, tol=1e-5):
    np.testing.assert_allclose(float(a), float(b), rtol=tol, atol=tol)


def test_bce():
    close(bce_with_logits(logits, target), F.binary_cross_entropy_with_logits(tl, tt))


def test_dice():
    pred = torch.sigmoid(tl)
    inter = (pred * tt).sum(dim=[1, 2, 3])
    union = pred.sum(dim=[1, 2, 3]) + tt.sum(dim=[1, 2, 3])
    want = 1 - ((2 * inter + 1e-6) / (union + 1e-6)).mean()
    close(dice_loss(logits, target), want)


def test_tversky_reduces_to_dice_relation():
    # alpha=beta=0.5 => tversky == TP/(TP+0.5FP+0.5FN) (== dice score)
    t = 1 - float(tversky_loss(logits, target))
    d = 1 - float(dice_loss(logits, target))
    np.testing.assert_allclose(t, d, rtol=1e-5)


def test_focal_tversky_formula():
    t_score = 1 - float(tversky_loss(logits, target))
    want = 1 - t_score**0.75
    close(focal_tversky_loss(logits, target), want)


def test_focal_bce():
    bce = F.binary_cross_entropy_with_logits(tl, tt, reduction="none")
    p = torch.sigmoid(tl)
    p_t = tt * p + (1 - tt) * (1 - p)
    want = (0.25 * (1 - p_t) ** 2 * bce).mean()
    close(focal_bce(logits, target), want)


def test_combined():
    bce = F.binary_cross_entropy_with_logits(tl, tt).item()
    want = bce + float(dice_loss(logits, target))
    close(combined_loss(logits, target), want)


def test_combined_with_boundary_weights():
    w = rng.uniform(0.5, 2.0, size=target.shape).astype(np.float32)
    bce = F.binary_cross_entropy_with_logits(tl, tt, reduction="none")
    want = (bce * torch.from_numpy(w)).mean().item() + float(dice_loss(logits, target))
    close(combined_loss(logits, target, boundary_weight_map=w), want)


def test_regression_losses():
    a = rng.normal(size=(2, 2, 8, 8)).astype(np.float32)
    b = rng.normal(size=(2, 2, 8, 8)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    close(mse_loss(a, b), F.mse_loss(ta, tb))
    close(l1_loss(a, b), F.l1_loss(ta, tb))
    close(smooth_l1_loss(a, b), F.smooth_l1_loss(ta, tb))
    close(smooth_l1_loss(a, b, beta=0.5), F.smooth_l1_loss(ta, tb, beta=0.5))


def test_registry():
    assert get_segmentation_loss("CombinedLoss") is combined_loss
    assert get_upscaler_loss("SmoothL1Loss") is smooth_l1_loss
    with pytest.raises(KeyError):
        get_segmentation_loss("nope")


def test_ssim_losses():
    """SSIM-aware SR losses (TPU-native extra beyond the reference menu):
    zero at identity, monotone under noise, differentiable, registered."""
    from swinwnet_tpu.train.losses import smooth_l1_ssim_loss, ssim_loss

    a = rng.uniform(0.1, 0.9, size=(2, 2, 32, 32)).astype(np.float32)
    assert float(ssim_loss(a, a)) < 1e-6
    small = a + rng.normal(0, 0.02, a.shape).astype(np.float32)
    big = a + rng.normal(0, 0.2, a.shape).astype(np.float32)
    assert float(ssim_loss(small, a)) < float(ssim_loss(big, a))
    # composed loss = pixel term + weighted structural term
    close(
        smooth_l1_ssim_loss(small, a, ssim_weight=0.5),
        float(smooth_l1_loss(small, a)) + 0.5 * float(ssim_loss(small, a)),
    )
    # gradient flows through the SSIM term
    import jax

    g = jax.grad(lambda x: ssim_loss(x, a))(small)
    assert np.isfinite(np.asarray(g)).all() and float(np.abs(np.asarray(g)).max()) > 0
    assert get_upscaler_loss("SSIMLoss") is ssim_loss
    assert get_upscaler_loss("SmoothL1SSIMLoss") is smooth_l1_ssim_loss
