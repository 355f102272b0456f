"""PSNR/SSIM cross-check against the torchmetrics algorithm.

The published SR baselines were computed with torchmetrics'
PeakSignalNoiseRatio / StructuralSimilarityIndexMeasure (reference:
tests.py:176-177). torchmetrics is NOT installed in this image, so the ground
truth here is a literal torch port of its functional implementation
(`torchmetrics.functional.image.ssim._ssim_update`, v1.x): reflect-pad by
(kernel_size-1)//2, grouped gaussian conv2d, crop the pad border off the SSIM
map, mean per image — plus its PSNR formula (10*log10(range^2 / batch-MSE)).
This is an independent computation path (torch conv vs XLA VALID conv,
reflection padding vs no padding) so agreement is meaningful.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from swinwnet_tpu.evalharness.image_metrics import psnr, ssim  # noqa: E402


def torchmetrics_psnr_port(preds, target, data_range=1.0):
    mse = torch.mean((preds.double() - target.double()) ** 2)
    return float(10.0 * torch.log10(data_range**2 / mse))


def torchmetrics_ssim_port(preds, target, data_range=1.0, kernel_size=11, sigma=1.5,
                           k1=0.01, k2=0.03):
    """Literal port of torchmetrics _ssim_update (gaussian kernel defaults)."""
    pad = (kernel_size - 1) // 2
    ch = preds.shape[1]
    preds = F.pad(preds, (pad, pad, pad, pad), mode="reflect")
    target = F.pad(target, (pad, pad, pad, pad), mode="reflect")

    coords = torch.arange(kernel_size, dtype=torch.float64) - (kernel_size - 1) / 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    kern = (g[:, None] @ g[None, :]).float()
    kern = kern.expand(ch, 1, kernel_size, kernel_size).contiguous()

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    inp = torch.cat([preds, target, preds * preds, target * target, preds * target])
    out = F.conv2d(inp, kern, groups=ch)
    B = preds.shape[0]
    mu_p, mu_t, mu_pp, mu_tt, mu_pt = out.split(B)
    s_p = mu_pp - mu_p**2
    s_t = mu_tt - mu_t**2
    s_pt = mu_pt - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * s_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (s_p + s_t + c2)
    ssim_map = (num / den)[..., pad:-pad, pad:-pad]
    return ssim_map.reshape(B, -1).mean(-1)


def _pair(seed, B=2, C=1, H=64, W=96, corr=0.9):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
    # smooth both so SSIM isn't in its noise floor
    k = np.ones((1, 1, 5, 5), np.float32) / 25
    ts = F.conv2d(torch.from_numpy(t), torch.from_numpy(k).expand(C, 1, 5, 5), padding=2, groups=C).numpy()
    p = np.clip(corr * ts + (1 - corr) * rng.uniform(0, 1, ts.shape).astype(np.float32), 0, 1)
    return p.astype(np.float32), ts.astype(np.float32)


@pytest.mark.parametrize("seed,shape", [(0, (2, 1, 64, 96)), (1, (3, 2, 50, 60)), (2, (1, 3, 128, 128))])
def test_psnr_matches_torchmetrics_port(seed, shape):
    B, C, H, W = shape
    p, t = _pair(seed, B, C, H, W)
    want = torchmetrics_psnr_port(torch.from_numpy(p), torch.from_numpy(t))
    got = float(psnr(np.asarray(p), np.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("seed,shape", [(0, (2, 1, 64, 96)), (1, (3, 2, 50, 60)), (2, (1, 3, 128, 128))])
def test_ssim_matches_torchmetrics_port(seed, shape):
    B, C, H, W = shape
    p, t = _pair(seed, B, C, H, W)
    want = torchmetrics_ssim_port(torch.from_numpy(p), torch.from_numpy(t))
    got = float(ssim(np.asarray(p), np.asarray(t)))
    np.testing.assert_allclose(got, float(want.mean()), rtol=2e-5, atol=2e-6)
    assert 0.3 < got < 1.0  # non-degenerate regime


def test_ssim_identical_is_one():
    p, t = _pair(3)
    np.testing.assert_allclose(float(ssim(np.asarray(t), np.asarray(t))), 1.0, atol=1e-6)


def test_psnr_known_value():
    # constant offset: mse = 0.01 -> psnr = 20 dB at range 1
    t = np.zeros((1, 1, 32, 32), np.float32)
    p = t + 0.1
    np.testing.assert_allclose(float(psnr(p, t)), 20.0, rtol=1e-5)
