"""Fully on-device d-space physical metrics for compiled reward graphs.

The reference RL loop crosses the device/host boundary every batch: GPU
rebin -> .cpu().numpy() -> scipy find_peaks -> python matching
(RL_finetuning_pipline.py:202-230, Diffraction_metrics.py). Here the whole
chain — rebin, peak detection, window extraction, greedy matching,
log-intensity errors and W1 shape distance — is vectorized over fixed-size
peak tables (MAX_PEAKS) and lives inside the jitted RL step.

Semantics mirror Diffraction_metrics.py:76-271 (same gating parameters,
window = floor(1.5 x fitted width), greedy nearest-d matching with 0.05 A
tolerance, squared log(I+1) errors, EMD over profiles resampled onto
x = (d - d_peak)/d_peak in linspace(-0.03, 0.03, 64)); parity is tested
against the scipy pipeline in tests/test_physics_device.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from .peaks import MAX_PEAKS, find_peaks_device

# Static cap on the per-peak half-window (samples). The host spec has no cap
# (window = int(1.5 * fitted_width) can span the whole spectrum); on device
# the window buffer must be fixed-size, so peaks wider than w_max/1.5 samples
# are silently truncated. 256 covers every peak the published gating
# (width>=5, prominence>=0.1) produces on the 832/1241-bin evaluation grids;
# raise via the `w_max` argument for pathological data
# (tests/test_physics_device.py::test_w_max_truncation quantifies the effect).
W_MAX = 256
X_REF_N = 64


def _peak_table(I, d, height, distance, prominence, width, w_max=W_MAX) -> Dict[str, jnp.ndarray]:
    """Fixed-size peak table for one spectrum: positions, windowed integrals,
    centers of mass, and unit-mass profiles resampled onto the relative grid."""
    n = I.shape[0]
    pk = find_peaks_device(I, height=height, distance=distance, prominence=prominence, width=width)
    valid = pk["valid"]
    idx = pk["idx"]
    window = jnp.floor(pk["widths"] * 1.5).astype(jnp.int32)  # int() truncation
    window = jnp.minimum(window, w_max)

    offs = jnp.arange(-w_max, w_max)  # [2*w_max]
    pos = idx[:, None] + offs[None, :]  # [P, 2W]
    # reference slice [max(i-w,0) : min(i+w, n)) (Diffraction_metrics.py:90-93)
    in_win = (offs[None, :] >= -window[:, None]) & (offs[None, :] < window[:, None])
    in_win &= (pos >= 0) & (pos < n)
    pos_c = jnp.clip(pos, 0, n - 1)
    I_win = jnp.where(in_win, I[pos_c], 0.0)
    d_win = jnp.where(in_win, d[pos_c], 0.0)

    integral = I_win.sum(axis=1)
    com = (d_win * I_win).sum(axis=1) / jnp.where(integral != 0, integral, 1.0)
    d_peak = d[idx]
    max_int = I[idx]

    # profile resampling (emd.py semantics): x = (d - d_peak)/d_peak,
    # I_norm = I/sum(I), np.interp with zero fill outside
    x_ref = jnp.linspace(-0.03, 0.03, X_REF_N)
    x = jnp.where(in_win, (d_win - d_peak[:, None]) / jnp.maximum(d_peak[:, None], 1e-12), 1e9)
    mass = integral
    I_norm = jnp.where(in_win, I_win, 0.0) / jnp.where(mass != 0, mass, 1.0)[:, None]

    # np.interp semantics incl. zero fill outside the *valid* window (masked
    # samples sit at x=1e9; without the range clamp interp would ramp toward
    # them instead of returning the host's right=0 fill)
    x_lo = jnp.where(in_win, x, jnp.inf).min(axis=1)
    x_hi = jnp.where(in_win, x, -jnp.inf).max(axis=1)

    def interp_one(xi, yi, lo, hi):
        order = jnp.argsort(xi)
        y = jnp.interp(x_ref, xi[order], yi[order], left=0.0, right=0.0)
        return jnp.where((x_ref < lo) | (x_ref > hi), 0.0, y)

    prof = jax.vmap(interp_one)(x, I_norm, x_lo, x_hi)  # [P, 64]
    prof = jnp.maximum(prof, 0.0)
    prof_mass = prof.sum(axis=1)
    prof = prof / (prof_mass[:, None] + 1e-12)
    has_profile = mass > 0  # normalize_profile returns None when sum <= 0

    return {
        "valid": valid,
        "d": jnp.where(valid, d_peak, 0.0),
        "d_com": jnp.where(valid, com, 0.0),
        "integral": jnp.where(valid, integral, 0.0),
        "max_int": jnp.where(valid, max_int, 0.0),
        "profile": prof,
        "has_profile": has_profile & valid,
    }


def _match_and_score(pred, true, tol):
    """Greedy nearest-d matching + per-sample totals
    (Diffraction_metrics.py:209-245)."""
    # nearest true peak by |true.d - pred.d_com| (note: true *d*, then the
    # tolerance test uses true *d_com* — reference lines 224-227)
    dist = jnp.abs(true["d"][None, :] - pred["d_com"][:, None])  # [P, T]
    dist = jnp.where(true["valid"][None, :], dist, jnp.inf)
    j = jnp.argmin(dist, axis=1)  # [P]

    any_true = true["valid"].any()
    matched = pred["valid"] & any_true
    matched &= jnp.abs(pred["d_com"] - true["d_com"][j]) <= tol

    log1 = jnp.log(jnp.maximum(pred["integral"], 0) + 1)
    log2 = jnp.log(jnp.maximum(true["integral"][j], 0) + 1)
    Iint = jnp.where(matched, (log1 - log2) ** 2, 0.0).sum()

    m1 = jnp.log(jnp.maximum(pred["max_int"], 0) + 1)
    m2 = jnp.log(jnp.maximum(true["max_int"][j], 0) + 1)
    Imax = jnp.where(matched, (m1 - m2) ** 2, 0.0).sum()

    dx = 0.06 / (X_REF_N - 1)
    cdf_p = jnp.cumsum(pred["profile"], axis=1)
    cdf_q = jnp.cumsum(true["profile"][j], axis=1)
    emd = jnp.abs(cdf_p - cdf_q).sum(axis=1) * dx
    shape_ok = matched & pred["has_profile"] & true["has_profile"][j]
    shape = jnp.where(shape_ok, emd, 0.0).sum()

    return Iint, Imax, shape


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "distance", "prominence", "width", "tol",
        "scale_pred", "scale_true", "w_max",
    ),
)
def diffraction_metrics_device(
    pred_I,
    true_I,
    centers,
    height=0.05,
    distance=10,
    prominence=0.1,
    width=5,
    tol=0.05,
    scale_pred=False,
    scale_true=False,
    w_max=W_MAX,
):
    """[B, n] rebinned spectra pairs -> per-sample (Iint, Imax, Shape) arrays.

    `scale_*` divides the spectrum by 4 (SR pixel-count compensation,
    Diffraction_metrics.py:110). Same-d-grid variant (pred and true share
    `centers`), which is the RL reward configuration
    (RL_finetuning_pipline.py:19, 211-217)."""
    pred_I = jnp.asarray(pred_I, jnp.float32)
    true_I = jnp.asarray(true_I, jnp.float32)
    centers = jnp.asarray(centers, jnp.float32)
    if scale_pred:
        pred_I = pred_I / 4
    if scale_true:
        true_I = true_I / 4

    def per_sample(p, t):
        pt = _peak_table(p, centers, height, distance, prominence, width, w_max)
        tt = _peak_table(t, centers, height, distance, prominence, width, w_max)
        return _match_and_score(pt, tt, tol)

    Iint, Imax, shape = jax.vmap(per_sample)(pred_I, true_I)
    return {"Integral Intensity": Iint, "Peak Intensity": Imax, "Shape": shape}
