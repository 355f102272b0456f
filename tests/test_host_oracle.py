"""The quarantined host metric-spec transcription (physics/host_oracle.py)
must reproduce the reference's Diffraction_metrics.py *exactly* — it is the
oracle every TPU-native physics path is judged against. Here the reference
module itself is loaded as the ground truth, plus the independent per-pixel
`naive_rebin` oracle is cross-checked against the vectorized Qwrapper.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from swinwnet_tpu.physics import (
    Qwrapper,
    d_centers_lr,
    find_peaks_for_batch,
    naive_rebin,
    peak_matching_loss,
)

REF_METRICS = "/root/reference/Diffraction_metrics.py"

requires_reference = pytest.mark.skipif(
    not os.path.exists(REF_METRICS), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_diffraction_metrics", REF_METRICS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_diffraction_metrics"] = mod
    spec.loader.exec_module(mod)
    return mod


def synth_spectra(seed, n=832, B=4):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.05, 7.49, n)
    out = []
    for _ in range(B):
        I = rng.uniform(0, 0.02, n)
        for _ in range(10):
            c = rng.uniform(0.3, 7.0)
            w = rng.uniform(0.01, 0.2)
            a = rng.uniform(0.1, 50.0)
            I = I + a * np.exp(-0.5 * ((x - c) / w) ** 2)
        out.append({"d": x.copy(), "I": I.astype(np.float64)})
    return out


@requires_reference
class TestAgainstReferenceModule:
    @pytest.mark.parametrize("scale", [False, True])
    def test_peak_tables_match(self, ref, scale):
        spectra = synth_spectra(0)
        ours = find_peaks_for_batch(spectra, scale=scale)
        theirs = ref.find_peaks_for_batch(spectra, scale=scale)
        assert len(ours) == len(theirs)
        for o_tab, t_tab in zip(ours, theirs):
            assert len(o_tab) == len(t_tab)
            for o, t in zip(o_tab, t_tab):
                for key in ("d", "d_com", "integral_intensity", "max_intensity"):
                    np.testing.assert_allclose(o[key], t[key], rtol=0, atol=0, err_msg=key)
                np.testing.assert_array_equal(o["profile_d"], t["profile_d"])
                np.testing.assert_array_equal(o["profile_I"], t["profile_I"])

    @pytest.mark.parametrize("seed", range(3))
    def test_matching_loss_matches(self, ref, seed):
        pred = synth_spectra(seed)
        true = synth_spectra(seed + 100)
        # mix in a shared component so some peaks match within tolerance
        for p, t in zip(pred, true):
            t["I"] = 0.5 * t["I"] + 0.6 * p["I"]
        ours_p = find_peaks_for_batch(pred)
        ours_t = find_peaks_for_batch(true)
        ref_p = ref.find_peaks_for_batch(pred)
        ref_t = ref.find_peaks_for_batch(true)

        ours = peak_matching_loss(ours_p, ours_t)
        theirs = ref.peak_matching_loss(ref_p, ref_t)
        for key in ("Integral Intensity", "Peak Intensity", "Shape"):
            np.testing.assert_allclose(ours[key], theirs[key], rtol=1e-12, err_msg=key)
        assert any(v > 0 for v in ours["Integral Intensity"]), "no peaks matched; test is vacuous"

    def test_emd_identical_is_zero(self, ref):
        spectra = synth_spectra(7)
        ours = peak_matching_loss(find_peaks_for_batch(spectra), find_peaks_for_batch(spectra))
        assert np.allclose(ours["Shape"], 0)


def test_naive_rebin_matches_qwrapper():
    """The per-pixel scalar-math oracle must agree with the vectorized
    segment-sum rebinner (they share no code)."""
    rng = np.random.default_rng(3)
    H, W = 50, 96
    img = rng.uniform(0, 10, size=(H, W)).astype(np.float32)
    centers = np.linspace(0.0546658, 7.49180085, 128)
    qw = Qwrapper(fixed_centers=centers)
    fast = np.asarray(qw.rebin(img[None, None]))[0]
    slow = naive_rebin(img, centers)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-4)
    assert slow.sum() > 0


def test_naive_rebin_theta_zero_column():
    """Odd-W grids place a column exactly at theta=0 => d=inf; both rebinners
    must drop it via the d_max mask (regression: ZeroDivisionError)."""
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 9, (37, 53)).astype(np.float32)
    centers = np.linspace(0.06, 7.4, 97)
    qw = Qwrapper(fixed_centers=centers)
    fast = np.asarray(qw.rebin(img[None, None]))[0]
    slow = naive_rebin(img, centers)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_naive_rebin_full_geometry():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 100, size=(250, 480)).astype(np.float32)
    qw = Qwrapper(fixed_centers=d_centers_lr)
    fast = np.asarray(qw.rebin(img[None, None]))[0]
    slow = naive_rebin(img, d_centers_lr)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-2)
