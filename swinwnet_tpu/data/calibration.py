"""Synthetic-renderer calibration against the six real reference patterns.

The published quality/classical baselines were measured on real McStas
patterns (240 test patterns spanning statistics 1e7..5e8 and pulse durations
10..300 us — support_files/Diffraction_render_script.py:8-16). The real
dataset is unavailable (LFS stubs, BLOCKERS.md), so the synthetic renderer
(`data.generation.synthesize_pattern`) stands in — and its realism decides
whether our metric numbers are comparable. This module extracts calibration
targets from the six real patterns that ARE local (data.real) and provides
the calibrated render recipe:

Measured real-pattern statistics (round 4; scripts in git history):

* baseline floor: every stored pattern sits on ~N(100, 20) counts (medians
  100.4-104.0 across the six, sigma ~20-23 including off-peak tails) — the
  patterns were stored noise-injected per the eval protocol, so calibrated
  renders add the same floor;
* peak pixels: q99 ~400-870 above floor, per-crystal maxima 900-3900 —
  heavy-tailed, hence log-uniform reflection intensities;
* direct beam: 2-4 columns wide at theta~0, maxima 294 (UO2) .. 16673 (Rb) —
  often the global pattern max, i.e. the normalization of UNMASKED patterns
  is beam-dominated exactly as in the reference data;
* rebinned d-space peak tables (published find_peaks gates): 4-14 detected
  peaks per pattern on the LR 832-bin grid.

`real_crystal_library()` additionally recovers each held-out crystal's d-list
and relative intensities from its real pattern, so the synthetic eval set
renders the *actual* Si/Al2O3/... reflections instead of random d's.

Pulse-duration mapping: on a TOF beamline the moderator pulse length
contributes Delta-lambda = 3956 [m A/s] * dt / L; with the reference
instrument's ~6.5 m source-detector flight path (dif60 spec), the published
10..300 us sweep maps to a constant wavelength-broadening term of
~0.006..0.18 A — `pulse_width_for_duration`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..core.config import GEOMETRY

# measured floor of the stored real patterns (see module docstring)
REAL_BASELINE_MU = 100.0
REAL_BASELINE_SIGMA = 20.0

# TOF flight path of the dif60 instrument (m): moderator -> banana detector
FLIGHT_PATH_M = 6.5
# lambda [A] = 3956 * t [s] / L [m]  (h / m_neutron = 3956 m*A/s)
H_OVER_M = 3956.0


def pulse_width_for_duration(pulse_duration_us: float, flight_path_m: float = FLIGHT_PATH_M) -> float:
    """Constant wavelength broadening (A) of a moderator pulse of the given
    length — the `pulse_width` knob of `synthesize_pattern`."""
    return H_OVER_M * (pulse_duration_us * 1e-6) / flight_path_m


def stats_scale(stats: float, max_stats: float = 5e8) -> float:
    """Counting-statistics scale factor relative to the best published run
    (the real masks/patterns are all at stats=5e8)."""
    return float(stats) / max_stats


def extract_crystal_spec(
    image: np.ndarray,
    mask: Optional[np.ndarray] = None,
    d_centers: Optional[np.ndarray] = None,
    d_max: float = 7.4,
) -> Dict[str, np.ndarray]:
    """Recover a renderable (d_list, intensities) spec from a real pattern.

    Pipeline: (mask ->) d-space rebin on the LR 832-bin grid (physics.Qwrapper)
    -> published find_peaks gates (physics.host_oracle.GATES) -> per-peak
    center-of-mass d and integral intensity. Intensities are returned relative
    (max = 1); the absolute scale is carried by `amp_max` = the strongest
    masked pixel above the baseline floor.
    """
    from ..physics.host_oracle import GATES, find_peaks_for_batch
    from ..physics.qwrapper import Qwrapper, d_centers_lr

    if d_centers is None:
        d_centers = d_centers_lr
    img = np.asarray(image, dtype=np.float32)
    floor = float(np.median(img))
    work = img - floor
    if mask is not None:
        work = work * np.asarray(mask, dtype=np.float32)
    qw = Qwrapper(fixed_centers=np.asarray(d_centers))
    spec = qw.tensor_to_d(work[None, None])
    peaks = find_peaks_for_batch(spec, **GATES)[0]
    d = np.array([p["d_com"] for p in peaks])
    inten = np.array([p["integral_intensity"] for p in peaks])
    keep = d <= d_max
    d, inten = d[keep], inten[keep]
    if inten.size and inten.max() > 0:
        inten = inten / inten.max()
    amp_max = float(np.percentile(work[work > 0], 99.9)) if np.any(work > 0) else 0.0
    return {"d": d, "intensity": inten, "amp_max": amp_max, "floor": floor}


def detect_table(image: np.ndarray, mask: Optional[np.ndarray] = None, grid: str = "lr"):
    """Published-gate peak table of a (masked, floor-subtracted) pattern on
    the LR 832-bin (or HR 1241-bin) d-grid: list of {d_com, integral_intensity}."""
    from ..physics.host_oracle import GATES, find_peaks_for_batch
    from ..physics.qwrapper import Qwrapper, d_centers_hr, d_centers_lr

    img = np.asarray(image, dtype=np.float32)
    work = img - float(np.median(img))
    if mask is not None:
        work = work * np.asarray(mask, dtype=np.float32)
    centers = d_centers_lr if grid == "lr" else d_centers_hr
    qw = Qwrapper(fixed_centers=np.asarray(centers))
    spec = qw.tensor_to_d(work[None, None])
    return find_peaks_for_batch(spec, **GATES)[0]


def detect_union_table(image: np.ndarray, mask: Optional[np.ndarray] = None, tol: float = 0.05):
    """Union of the LR- and HR-grid detections of one pattern.

    The degradation metrics rebin the *prediction* on the HR 1241-bin grid,
    whose finer bins satisfy the width>=5-bin gate for narrow low-d arcs
    that the LR 832-bin grid misses — on the real Si pattern the HR grid
    detects 9 peaks where the LR grid finds 3. A render calibrated only to
    the LR table therefore under-populates exactly the arcs that drive the
    published avgpool/bilinear error sums. HR-only entries keep their
    HR-grid integrals (comparable scale: same pattern, same mass)."""
    lr = detect_table(image, mask, "lr")
    hr = detect_table(image, mask, "hr")
    out = list(lr)
    lr_d = np.array([p["d_com"] for p in lr]) if lr else np.empty(0)
    for p in hr:
        if lr_d.size == 0 or np.abs(lr_d - p["d_com"]).min() > tol:
            out.append(p)
    return sorted(out, key=lambda p: p["d_com"])


def mask_d_bands(
    mask: np.ndarray,
    theta_range: Tuple[float, float] = GEOMETRY.theta_range,
    lambda_range: Tuple[float, float] = GEOMETRY.lambda_range,
    min_frac: float = 0.05,
) -> np.ndarray:
    """Reflection loci implied by a labeled mask: d-histogram maxima.

    The human-labeled masks of the real six cover every physical reflection,
    including arcs too faint to pass the published find_peaks gates on the
    *signal* — and because the metric pipeline rebins raw masked counts
    (stored-pattern floor INCLUDED, no subtraction), those faint mask bands
    carry floor mass that forms real peaks in the published metric tables.
    A calibrated render must therefore place (faint) arcs wherever the mask
    has d-support, not just at the detectable reflections."""
    from scipy.ndimage import uniform_filter1d
    from scipy.signal import find_peaks

    H, W = mask.shape
    theta = np.deg2rad(np.abs(np.linspace(theta_range[0], theta_range[1], W)))
    lam = np.linspace(lambda_range[0], lambda_range[1], H)
    sin_half = np.sin(theta * 0.5)
    with np.errstate(divide="ignore"):
        d_map = lam[:, None] / np.maximum(2.0 * sin_half[None, :], 1e-9)
    sel = (np.asarray(mask) > 0) & np.isfinite(d_map) & (d_map < 7.4)
    if not sel.any():
        return np.empty(0)
    hist, edges = np.histogram(d_map[sel], bins=740, range=(0.0, 7.4))
    hist = uniform_filter1d(hist.astype(np.float64), 3)
    pk, _ = find_peaks(hist, height=min_frac * hist.max(), distance=3, prominence=min_frac * hist.max())
    return (edges[pk] + edges[pk + 1]) * 0.5


def fit_width_model(
    real_image: np.ndarray,
    real_mask: Optional[np.ndarray] = None,
    theta_range: Tuple[float, float] = GEOMETRY.theta_range,
    lambda_range: Tuple[float, float] = GEOMETRY.lambda_range,
) -> Tuple[float, float]:
    """Fit (pulse sigma_lambda [A], Delta-d/d resolution) to one real
    pattern's detected HR-grid peak widths.

    TOF width model per reflection: sigma_d(d) = d * sqrt((sigma_lambda /
    lambda_eff)^2 + r^2), where lambda_eff is the mean Bragg wavelength over
    the detectable arc. The real six show sigma_d/d ~ 5% at d=0.55 falling
    to ~2% at d=3 — exactly the constant-sigma_lambda signature (low-d arcs
    live at small lambda where sigma_lambda/lambda is large); a pure
    relative-resolution model cannot produce that slope. Grid-search fit,
    coarse is fine (widths are noisy +-20%)."""
    from scipy.signal import find_peaks

    from ..physics.qwrapper import Qwrapper, d_centers_hr

    img = np.asarray(real_image, dtype=np.float32)
    work = img - float(np.median(img))
    if real_mask is not None:
        work = work * np.asarray(real_mask, dtype=np.float32)
    qw = Qwrapper(fixed_centers=np.asarray(d_centers_hr))
    I = qw.tensor_to_d(work[None, None])[0]["I"]
    d_grid = np.asarray(d_centers_hr)
    db = d_grid[1] - d_grid[0]
    pk, props = find_peaks(I, height=0.05, distance=10, prominence=0.1, width=5)
    if len(pk) < 2:
        return 0.05, REAL_RESOLUTION
    d_obs = d_grid[pk]
    sigma_obs = props["widths"] * db / 2.355

    W = GEOMETRY.width
    theta = np.deg2rad(np.abs(np.linspace(theta_range[0], theta_range[1], W)))
    sin_half = np.sin(theta * 0.5)

    def lam_eff(d):
        lam_b = 2.0 * d * sin_half
        sel = (lam_b > lambda_range[0]) & (lam_b < lambda_range[1])
        return float(lam_b[sel].mean()) if sel.any() else float(np.mean(lambda_range))

    lams = np.array([lam_eff(d) for d in d_obs])
    best, best_err = (0.05, REAL_RESOLUTION), np.inf
    for sl in np.linspace(0.0, 0.14, 29):
        for r in np.linspace(0.002, 0.03, 29):
            sig = d_obs * np.sqrt((sl / lams) ** 2 + r**2)
            err = float(np.mean((np.log(sig) - np.log(sigma_obs)) ** 2))
            if err < best_err:
                best, best_err = (float(sl), float(r)), err
    return best


def refine_crystal_spec(
    spec: Dict[str, np.ndarray],
    real_image: np.ndarray,
    real_mask: Optional[np.ndarray] = None,
    H: int = GEOMETRY.height,
    W: int = GEOMETRY.width,
    iters: int = 5,
    tol: float = 0.05,
    damp: float = 0.7,
    seed: int = 17,
) -> Dict[str, np.ndarray]:
    """Fixed-point refinement: adjust per-reflection amplitudes until the
    calibrated render's DETECTED peak table (published scipy gates, union of
    the LR 832- and HR 1241-bin grids) reproduces the real pattern's table.

    Why a fixed point: the extraction maps detected *integrals* straight to
    render *amplitudes*, but rendered integral = amplitude x arc length x
    d-width (∝ d), and detection is gated on width >= 5 bins / distance >=
    10 bins of the REBINNED profile, which depends on neighboring arcs and
    the noise draw — so one analytic correction cannot land all peaks on
    the real table. Iterating render -> detect -> match (tol 0.05 A) ->
    damped log-space ratio update converges in ~3-5 rounds; real peaks the
    render fails to detect get a 2x boost (capped at 8x) until they appear,
    and ones it can never express demote to faint arcs.

    The refined spec carries d/intensity/amp_max plus the per-crystal TOF
    width model (`resolution`, `pulse_sigma_lambda`, `pulse_duration_us`)
    from `fit_width_model`.
    """
    from .generation import synthesize_pattern

    target = detect_union_table(real_image, real_mask, tol)
    if not target:
        return spec
    t_d = np.array([p["d_com"] for p in target])
    t_int = np.array([p["integral_intensity"] for p in target])

    # refined d-list = the real DETECTED arcs (split maxima included);
    # intensities seeded from the extraction, matched by nearest d
    d0 = np.asarray(spec["d"], dtype=np.float64)
    i0 = np.asarray(spec["intensity"], dtype=np.float64)
    if d0.size:
        amps = np.array([i0[int(np.argmin(np.abs(d0 - td)))] for td in t_d])
    else:
        amps = np.ones_like(t_d)
    amps = np.maximum(amps, 1e-3)
    seed_amps = amps.copy()
    ever_matched = np.zeros(len(amps), dtype=bool)
    # faint arcs: mask-implied loci with no detectable counterpart — rendered
    # at 3% amplitude so the derived gt mask (and through it the metric
    # pipeline's un-subtracted floor mass) covers them like the labeled masks
    faint_d = np.empty(0)
    if real_mask is not None:
        bands = mask_d_bands(np.asarray(real_mask))
        if bands.size:
            faint_d = np.array(
                [b for b in bands if np.abs(t_d - b).min() > 2 * tol]
            )
    FAINT_AMP = 0.03

    def full_lists(a):
        rel = a / a.max()
        return (np.concatenate([t_d, faint_d]),
                np.concatenate([rel, np.full(len(faint_d), FAINT_AMP)]))

    amp_max = float(spec.get("amp_max", 1500.0))
    # per-crystal TOF width model: constant sigma_lambda (pulse) + relative
    # Delta-d/d term, fitted to the real HR-grid widths; the fitted pulse
    # reproduces the six's (unrecorded) sweep coordinate during refinement,
    # while eval renders draw their own pulse from the published sweep
    sigma_lambda, resolution = fit_width_model(real_image, real_mask)
    fit_pulse_us = sigma_lambda * FLIGHT_PATH_M / H_OVER_M * 1e6

    history = []
    for it in range(iters):
        rd, ri = full_lists(amps)
        img = render_calibrated(
            rd, ri, stats=5e8, pulse_duration_us=fit_pulse_us,
            amp_max=amp_max, H=H, W=W, seed=seed + it, resolution=resolution,
            theta_mod=0.0, speckle_k=0.8, beam_amp=0.0,
        )
        clean = synthesize_pattern(
            rd, ri, H=H, W=W, seed=None, background=0.0,
            pulse_width=sigma_lambda, resolution=resolution,
        )
        mask = (clean > float(clean.max()) * 5e-3).astype(np.float32)
        got = detect_union_table(img, mask, tol)
        if not got:
            amps *= 2.0
            continue
        g_d = np.array([p["d_com"] for p in got])
        g_int = np.array([p["integral_intensity"] for p in got])
        ratios = np.ones_like(amps)
        matched = np.zeros(len(amps), dtype=bool)
        for k, td in enumerate(t_d):
            j = int(np.argmin(np.abs(g_d - td)))
            if abs(g_d[j] - td) <= tol:
                ratios[k] = t_int[k] / max(g_int[j], 1e-9)
                matched[k] = True
        if matched.any():
            # split the common scale into amp_max, leave relative structure
            # to the per-peak amplitudes
            common = float(np.exp(np.median(np.log(ratios[matched]))))
            amp_max = float(np.clip(amp_max * common**damp, 50.0, 2e4))
            ratios = ratios / common
        ever_matched |= matched
        # never-matched targets get boosted toward detectability, but capped
        # at 8x their seed value: a target inside another arc's distance=10
        # exclusion zone is unreachable for this smooth render, and letting
        # it double forever inverts the crystal's whole intensity structure
        # (it ends up dominating the clean render and collapsing the
        # derived gt mask)
        boost = np.where(amps < seed_amps * 8.0, 2.0, 1.0)
        amps = amps * np.where(matched, ratios**damp, boost)
        amps = np.maximum(amps, 1e-4)
        history.append(np.log(amps / amps.max()))

    # borderline-detectable peaks flicker in and out across noise draws
    # (double on a miss, ratio-pull on a hit) — the log-mean over the last
    # iterations is the stable center of that oscillation
    tail = np.stack(history[-3:]) if len(history) >= 3 else np.stack(history)
    amps = np.exp(tail.mean(axis=0))
    # targets the render never managed to express as detections are demoted
    # to faint arcs (mask coverage without detectable counts) — keeping them
    # at boosted amplitude only distorts the real structure
    if ever_matched.any() and not ever_matched.all():
        faint_d = np.concatenate([faint_d, t_d[~ever_matched]])
        t_d, amps = t_d[ever_matched], amps[ever_matched]

    rd, ri = full_lists(amps)
    out = dict(spec)
    out.update({
        "d": rd, "intensity": ri, "amp_max": amp_max,
        "resolution": resolution, "pulse_sigma_lambda": sigma_lambda,
        "pulse_duration_us": fit_pulse_us,
    })
    return out


def real_crystal_library(
    root: Optional[str] = None, refined: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """{crystal: spec} for the six real held-out crystals (data.real).

    With `refined` (default), each spec goes through `refine_crystal_spec`
    so a calibrated render reproduces the real pattern's detected d-space
    peak table (count / relative heights / widths) under the published
    gates — the property the classical degradation yardstick actually
    measures."""
    from .real import REAL_PATTERN_CRYSTALS, REFERENCE_ROOT, load_real_eval_set

    images, masks, names = load_real_eval_set(root or REFERENCE_ROOT)
    lib = {}
    for n, img, m in zip(names, images, masks):
        spec = extract_crystal_spec(img, m)
        if refined:
            spec = refine_crystal_spec(spec, img, m, H=img.shape[0], W=img.shape[1])
        lib[n] = spec
    return lib


# instrument Delta-d/d: fitted on the six real patterns' detected peak
# tables (round 4) — scipy peak_widths at the published gates give
# sigma_d/d = 1.0-2.1% with median 1.45% ACROSS ALL d (constant relative
# width), vs the 0.8% used through round 3 (which made peaks ~1.8x too
# narrow/tall, dropped low-d peaks below the width>=5-bin gate and buried
# weak arcs under the height>=5%-of-max gate)
REAL_RESOLUTION = 0.0145

# moderator storage-time decay constant, in Angstrom of wavelength
# (lambda = 3956 t / L makes the time constant linear in lambda; 0.02 A at
# L=6.5 m is ~33 us — a typical thermal-moderator tail). Measured round 4:
# at FIXED per-crystal operating points a 0.02 A tail moves avgpool/
# bilinear Integral Intensity and Shape toward the real six's values, but
# once the refinement fixed point calibrates WITH the tail the 240-sample
# aggregate comes out slightly WORSE (avgpool II 1.68 -> 1.41 vs published
# 2.63; runs/CLASSICAL_r04_syn_v3 vs _v4) — the fixed point re-normalizes
# the asymmetry away. Defaults therefore stay tail-off; the knob
# (generation.synthesize_pattern(tof_tail=...)) is kept for study.
TOF_TAIL_LAMBDA = 0.0


def render_calibrated(
    d_list: Sequence[float],
    intensities: Sequence[float],
    stats: float = 5e8,
    pulse_duration_us: float = 100.0,
    amp_max: float = 1500.0,
    beam_amp: Optional[float] = None,
    H: int = GEOMETRY.height,
    W: int = GEOMETRY.width,
    seed: Optional[int] = 0,
    baseline: bool = True,
    resolution: float = REAL_RESOLUTION,
    speckle_k: Optional[float] = None,
    **kwargs,
) -> np.ndarray:
    """Render one calibrated synthetic pattern.

    Maps the published sweep coordinates (stats, pulse duration) onto the
    synthetic renderer and adds the measured stored-pattern floor:

      clean Bragg render (real d's / intensities, pulse-dependent width,
      Delta-d/d = 0.8% — matches the measured real rebinned peak widths of
      5-17 LR-grid bins)
      * amp_max counting scale * stats/5e8
      -> Gamma weighted-ray speckle (measured real roughness 0.28-1.13;
         k drawn ~ stats-scaled U(1.5, 10) unless given)
      -> Poisson -> + N(100, 20) floor

    The returned pattern therefore has the same intensity statistics AND
    pixel texture as the stored real patterns; the eval protocol's
    additional N(100, 20) injection (data.noise.add_eval_noise) applies on
    top, exactly as it does to the real six.
    """
    from .generation import synthesize_pattern

    rng = np.random.default_rng(seed)
    scale = stats_scale(stats)
    inten = np.asarray(intensities, dtype=np.float64)
    if speckle_k is None:
        # per-crystal effective rays/pixel measured on the real six via the
        # in-mask 2x2 blockmax/blocksum statistic (0.47-0.68 — half the
        # block's mass sits in ONE pixel): matching that sparsity needs
        # k ~ 0.35-1.2 (round-4 re-measurement; the earlier 0.7-8 range
        # reproduced local roughness but not the block-level sparsity that
        # drives the published maxpool-degradation metrics). Fewer source
        # neutrons -> fewer effective rays -> rougher.
        speckle_k = max(0.2, float(10.0 ** rng.uniform(np.log10(0.35), np.log10(1.2))) * scale)
    kwargs.setdefault("theta_mod", float(rng.uniform(0.3, 0.7)))
    img = synthesize_pattern(
        d_list,
        inten,
        H=H,
        W=W,
        pulse_width=pulse_width_for_duration(pulse_duration_us),
        direct_beam=(rng.uniform(2.0, 12.0) if beam_amp is None else beam_amp),
        background=2.0 * scale,
        counts_scale=amp_max * scale,
        resolution=resolution,
        speckle_k=speckle_k,
        seed=None if seed is None else int(rng.integers(0, 2**31)),
        **kwargs,
    )
    if baseline:
        img = img + rng.normal(REAL_BASELINE_MU, REAL_BASELINE_SIGMA, img.shape).astype(
            np.float32
        )
    return img.astype(np.float32)
