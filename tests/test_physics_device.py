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


# ---------------------------------------------------------------------------
# Round-2 hardening: large realistic batch, W_MAX truncation, distance ties
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_device_matches_host_200_realistic_spectra():
    """>=200 realistic spectra via the real pipeline (synthetic Bragg patterns
    + the published N(100,20) noise protocol -> Qwrapper.rebin): the on-device
    metrics must track the host scipy pipeline to ~1e-5 absolute.

    Caveat quantified here: rebinned Poisson counts occasionally produce
    EXACT equal-height ties inside one `distance` window; scipy resolves
    those by numpy's unstable quicksort partition order (irreproducible —
    verified on sample 192: tie group [64, 365, 368] at I=287.0 gets argsort
    ranks 90/92 in non-positional order), while the device path is
    deterministic (later position wins). Such samples may deviate by a few
    percent, so the assertion is: >=98% of samples at ~1e-4 parity and every
    sample within 5% relative."""
    from swinwnet_tpu.data.generation import synthesize_pattern
    from swinwnet_tpu.physics import Qwrapper, d_centers_lr

    rng = np.random.default_rng(0)
    N = 200
    pats_true, pats_pred = [], []
    for i in range(N):
        k = int(rng.integers(4, 14))
        ds = rng.uniform(0.6, 7.0, k)
        am = rng.uniform(0.2, 3.0, k)
        t = synthesize_pattern(ds, am, seed=100 + i)
        ds2 = np.concatenate([ds, rng.uniform(0.6, 7.0, 2)])
        am2 = np.concatenate([am * rng.uniform(0.6, 1.4, k), rng.uniform(0.1, 0.8, 2)])
        p = synthesize_pattern(ds2, am2, seed=200 + i)
        p = p + rng.normal(100, 20, p.shape).astype(np.float32)  # eval noise protocol
        pats_true.append(t)
        pats_pred.append(p)

    qw = Qwrapper(fixed_centers=d_centers_lr)
    spec_t = np.asarray(qw.rebin(np.stack(pats_true)[:, None]))
    spec_p = np.asarray(qw.rebin(np.stack(pats_pred)[:, None]))

    want = host_metrics(spec_p, spec_t, d_centers_lr)
    got = {k: [] for k in want}
    for i in range(0, N, 8):  # fixed chunk => one compile
        d = diffraction_metrics_device(spec_p[i : i + 8], spec_t[i : i + 8], d_centers_lr)
        for k in got:
            got[k].append(np.asarray(d[k]))

    n_matched = sum(v > 0 for v in want["Integral Intensity"])
    assert n_matched > N // 2, "too few matched samples; test is vacuous"
    for key in want:
        g = np.concatenate(got[key])
        w = np.asarray(want[key])
        ad = np.abs(g - w)
        rel = ad / np.maximum(np.abs(w), 1e-3)
        frac_tight = float(np.mean(ad <= 1e-4 + 1e-4 * np.abs(w)))
        assert frac_tight >= 0.98, f"{key}: only {frac_tight:.1%} of samples at tight parity"
        assert np.all((ad <= 1e-3) | (rel <= 0.05)), (
            f"{key}: outlier beyond 5% rel — max|d|={ad.max():.3g} "
            f"at idx {int(np.argmax(ad))} (host={w[np.argmax(ad)]:.4g})"
        )


def test_w_max_truncation_quantified():
    """Peaks wider than w_max/1.5 samples are silently truncated on device;
    raising w_max restores host parity (documents the VERDICT-flagged cap)."""
    from swinwnet_tpu.physics import d_centers_lr

    n = len(d_centers_lr)
    x = np.arange(n, dtype=np.float32)
    # ultra-wide peak: fitted width ~212 samples -> host window int(1.5*w) ~318 > 256
    wide = 10.0 * np.exp(-0.5 * ((x - 400) / 90.0) ** 2)
    narrow = 6.0 * np.exp(-0.5 * ((x - 120) / 4.0) ** 2)
    base = (wide + narrow + 0.2).astype(np.float32)
    true = base[None]
    pred = (base * 1.25)[None]

    want = host_metrics(pred, true, d_centers_lr)

    got_default = diffraction_metrics_device(pred, true, d_centers_lr)
    got_wide = diffraction_metrics_device(pred, true, d_centers_lr, w_max=416)

    # with a big enough window the device matches the host exactly
    np.testing.assert_allclose(
        np.asarray(got_wide["Integral Intensity"]), want["Integral Intensity"],
        rtol=1e-4, atol=1e-6,
    )
    # the default 256 cap truncates the wide peak's window: deviation is real
    # but bounded (tails carry little mass)
    delta = abs(float(got_default["Integral Intensity"][0]) - want["Integral Intensity"][0])
    assert delta < 0.05, f"truncation error unexpectedly large: {delta}"


def test_distance_gate_ties_match_scipy():
    """Equal-height peaks within `distance`: scipy keeps the LATER position
    (it walks its ascending argsort from the end). Large fully-degenerate tie
    groups follow numpy's unstable quicksort and are out of parity scope."""
    from scipy.signal import find_peaks as scipy_find_peaks

    from swinwnet_tpu.physics.peaks import find_peaks_device

    two = np.zeros(50, np.float32)
    two[10] = 5.0
    two[15] = 5.0
    two[30] = 2.0
    three = np.zeros(60, np.float32)
    three[[10, 17, 24]] = 5.0
    twenty = np.zeros(500, np.float32)
    twenty[np.arange(10, 10 + 20 * 9, 9)] = 5.0

    for arr in (two, three, twenty):
        want, _ = scipy_find_peaks(arr, distance=10)
        got = find_peaks_device(arr, height=0.0, distance=10, prominence=0.0, width=0)
        got_idx = np.asarray(got["idx"])[np.asarray(got["valid"])]
        np.testing.assert_array_equal(np.sort(got_idx), np.sort(want))
