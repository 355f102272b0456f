"""Parity of the fully on-device physical metrics vs the host scipy pipeline.

Both consume the same rebinned spectra; the device path must reproduce the
host's per-sample Integral/Peak-intensity and W1 shape totals so the RL reward
computed inside the jitted step matches the reference's CPU computation.
"""

import numpy as np
import pytest

from swinwnet_tpu.physics import find_peaks_for_batch, peak_matching_loss, d_centers_hr
from swinwnet_tpu.physics.device_metrics import diffraction_metrics_device


def synth_spectrum(rng, n, n_peaks=8):
    x = np.linspace(0, 7.5, n)
    I = np.zeros(n)
    for _ in range(n_peaks):
        c = rng.uniform(0.3, 7.0)
        w = rng.uniform(0.03, 0.12)
        a = rng.uniform(0.3, 5.0)
        I += a * np.exp(-0.5 * ((x - c) / w) ** 2)
    return I.astype(np.float32)


def host_metrics(pred, true, centers):
    pred_DI = [{"d": centers, "I": p} for p in pred]
    true_DI = [{"d": centers, "I": t} for t in true]
    pp = find_peaks_for_batch(pred_DI)
    tp = find_peaks_for_batch(true_DI)
    return peak_matching_loss(pp, tp)


@pytest.mark.parametrize("seed", range(4))
def test_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    n = len(d_centers_hr)
    B = 3
    pred = np.stack([synth_spectrum(rng, n) for _ in range(B)])
    # true = perturbed pred so peaks mostly match but intensities differ
    true = pred * rng.uniform(0.7, 1.3, size=(B, 1)).astype(np.float32)
    true += np.stack([synth_spectrum(rng, n, n_peaks=2) * 0.3 for _ in range(B)])

    want = host_metrics(pred, true, d_centers_hr)
    got = diffraction_metrics_device(pred, true, d_centers_hr)

    for key in ("Integral Intensity", "Peak Intensity", "Shape"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), rtol=2e-3, atol=2e-3,
            err_msg=key,
        )


def test_identical_zero():
    rng = np.random.default_rng(42)
    n = len(d_centers_hr)
    pred = np.stack([synth_spectrum(rng, n) for _ in range(2)])
    got = diffraction_metrics_device(pred, pred, d_centers_hr)
    np.testing.assert_allclose(np.asarray(got["Integral Intensity"]), 0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got["Peak Intensity"]), 0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got["Shape"]), 0, atol=1e-6)


def test_empty_spectra():
    n = len(d_centers_hr)
    zeros = np.zeros((2, n), np.float32)
    got = diffraction_metrics_device(zeros, zeros, d_centers_hr)
    for key in got:
        np.testing.assert_allclose(np.asarray(got[key]), 0, atol=1e-8)
