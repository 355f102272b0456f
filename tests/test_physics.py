"""Physics subsystem tests: d-space rebinning, peak finding, EMD, matching.

The rebinner is checked against an independent brute-force numpy oracle; the
on-device peak finder is checked against scipy.signal.find_peaks with the
reference gating parameters (Diffraction_metrics.py:109-118).
"""

import numpy as np
import pytest
from scipy.signal import find_peaks

from swinwnet_tpu.physics import (
    DiffractionMetricsCalculator,
    Qwrapper,
    centers_to_edges,
    d_centers_hr,
    d_centers_lr,
    find_peaks_for_batch,
    make_d_grid,
    peak_matching_loss,
)
from swinwnet_tpu.physics.peaks import find_peaks_device


def brute_force_rebin(img, centers, theta_range=(-170, 170), L_range=(0.1, 10), d_max=7.5):
    """Independent O(H*W*log n) oracle: per-pixel bin search with edge rules
    matching torch.bucketize(right=False) - 1, clamped."""
    H, W = img.shape
    edges = centers_to_edges(centers)
    d_grid = make_d_grid(H, W, theta_range, L_range)
    out = np.zeros(len(centers), dtype=np.float64)
    for i in range(H):
        for j in range(W):
            d = d_grid[i, j]
            if d > d_max:
                continue
            # first edge strictly greater than d, minus one
            k = int(np.searchsorted(edges, d, side="right")) - 1
            k = min(max(k, 0), len(centers) - 1)
            out[k] += img[i, j]
    return out


class TestQwrapper:
    def test_rebin_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        H, W = 25, 48  # small grid for the O(HW) oracle
        img = rng.uniform(0, 10, size=(2, 1, H, W)).astype(np.float32)
        centers = np.linspace(0.05, 7.49, 111)
        qw = Qwrapper(fixed_centers=centers)
        got = np.asarray(qw.rebin(img))
        for b in range(2):
            want = brute_force_rebin(img[b, 0], centers)
            np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)

    def test_tensor_to_d_schema(self):
        img = np.ones((3, 1, 250, 480), dtype=np.float32)
        qw = Qwrapper(fixed_centers=d_centers_lr)
        out = qw.tensor_to_d(img)
        assert len(out) == 3
        assert out[0]["d"].shape == (832,)
        assert out[0]["I"].shape == (832,)
        # total intensity within the d<=7.5 mask is conserved
        d_grid = make_d_grid(250, 480)
        np.testing.assert_allclose(out[0]["I"].sum(), (d_grid <= 7.5).sum(), rtol=1e-5)

    def test_hr_lr_grids(self):
        assert len(d_centers_hr) == 1241
        assert len(d_centers_lr) == 832


def synth_spectrum(rng, n=832, n_peaks=8):
    """Smooth multi-Gaussian spectrum resembling rebinned I(d)."""
    x = np.linspace(0, 7.5, n)
    I = np.zeros(n)
    for _ in range(n_peaks):
        c = rng.uniform(0.3, 7.0)
        w = rng.uniform(0.02, 0.15)
        a = rng.uniform(0.2, 5.0)
        I += a * np.exp(-0.5 * ((x - c) / w) ** 2)
    I += rng.uniform(0, 0.01, n)
    return I.astype(np.float32)


class TestDevicePeaks:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_scipy(self, seed):
        rng = np.random.default_rng(seed)
        I = synth_spectrum(rng)
        want, _ = find_peaks(I, height=0.05, distance=10, prominence=0.1, width=5)
        got = find_peaks_device(I)
        got_idx = np.asarray(got["idx"])[np.asarray(got["valid"])]
        np.testing.assert_array_equal(np.sort(got_idx), np.sort(want))

    def test_widths_match_scipy(self):
        rng = np.random.default_rng(42)
        I = synth_spectrum(rng)
        want, props = find_peaks(I, height=0.05, distance=10, prominence=0.1, width=5)
        got = find_peaks_device(I)
        valid = np.asarray(got["valid"])
        got_idx = np.asarray(got["idx"])[valid]
        got_w = np.asarray(got["widths"])[valid]
        order = np.argsort(got_idx)
        np.testing.assert_array_equal(got_idx[order], want)
        np.testing.assert_allclose(got_w[order], props["widths"], rtol=1e-3, atol=1e-3)

    def test_plateau_semantics(self):
        # scipy reports the left-middle sample of a plateau
        I = np.array([0, 1, 5, 5, 5, 1, 0, 0, 3, 0, 0], dtype=np.float32)
        want, _ = find_peaks(I)
        got = find_peaks_device(I, height=0.0, distance=1, prominence=0.0, width=0)
        got_idx = np.asarray(got["idx"])[np.asarray(got["valid"])]
        np.testing.assert_array_equal(np.sort(got_idx), np.sort(want))


class TestMatching:
    def test_identical_patterns_zero_loss(self):
        rng = np.random.default_rng(1)
        spectra = [
            {"d": np.linspace(0.05, 7.49, 832), "I": synth_spectrum(rng) * 100}
            for _ in range(2)
        ]
        peaks = find_peaks_for_batch(spectra)
        out = peak_matching_loss(peaks, peaks)
        assert np.allclose(out["Integral Intensity"], 0)
        assert np.allclose(out["Peak Intensity"], 0)
        assert np.allclose(out["Shape"], 0)

    def test_calculator_end_to_end(self):
        rng = np.random.default_rng(2)
        pred = rng.uniform(0, 100, size=(2, 1, 250, 480)).astype(np.float32)
        calc = DiffractionMetricsCalculator(
            fixed_centers_pred=d_centers_lr, fixed_centers_true=d_centers_lr
        )
        out = calc(pred, pred)
        assert set(out) == {"Integral Intensity", "Peak Intensity", "Shape"}
        assert len(out["Shape"]) == 2
        assert np.allclose(out["Integral Intensity"], 0)


def test_rebin_inside_jit_no_tracer_leak():
    """Qwrapper index caches must never hold trace-time constants
    (regression: UnexpectedTracerError when rebin is first called under jit)."""
    import jax
    import jax.numpy as jnp

    qw = Qwrapper(fixed_centers=np.linspace(0.05, 7.49, 64))
    x = jnp.ones((2, 1, 25, 48))

    @jax.jit
    def f(x):
        return qw.rebin(x).sum()

    @jax.jit
    def g(x):
        return qw.rebin(x).sum() * 2

    a = float(f(x))
    b = float(g(x))
    np.testing.assert_allclose(b, 2 * a, rtol=1e-6)
