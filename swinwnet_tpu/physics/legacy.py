"""Legacy/support physics APIs (reference: support_files/Peak_loss.py,
support_files/DiffQ.py).

`DiffractionPipeline` is the older *scalar* peak-matching loss: batch-summed
squared log-intensity error over matched peaks (matching on the peak's d
position, not its center of mass; no shape/max-intensity terms —
Peak_loss.py:128-190). It produced the published
`results/SwinWnet_physycal_loss_RL.json` / `AGVpool_peak_losses.json` scalars.

`naive_rebin` is the DiffQ-style per-pixel rebinner
(support_files/DiffQ.py:13-83) kept as an independent oracle; it delegates to
the vectorized `Qwrapper` since both are exact binning.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.config import GEOMETRY
from .peaks import find_peaks_for_batch
from .qwrapper import Qwrapper


def scalar_peak_matching_loss(batch_pred, batch_true, tol: float = 0.05) -> float:
    """Batch-summed (log(I1+1) - log(I2+1))^2 over d-matched peaks
    (Peak_loss.py:128-154)."""
    total = 0.0
    for pred_peaks, true_peaks in zip(batch_pred, batch_true):
        if not pred_peaks or not true_peaks:
            continue
        for p1 in pred_peaks:
            d1, I1 = p1["d"], p1["integral_intensity"]
            p2 = min(true_peaks, key=lambda p: abs(p["d"] - d1))
            if abs(d1 - p2["d"]) <= tol:
                total += (
                    math.log(max(I1, 0) + 1) - math.log(max(p2["integral_intensity"], 0) + 1)
                ) ** 2
    return float(total)


class DiffractionPipeline:
    """Reference-compatible scalar-loss facade (Peak_loss.py:161-190)."""

    def __init__(
        self,
        fixed_centers_pred,
        fixed_centers_true,
        theta_range=GEOMETRY.theta_range,
        L_range=GEOMETRY.lambda_range,
    ):
        self.qw_pred = Qwrapper(theta_range, L_range, fixed_centers_pred)
        self.qw_true = Qwrapper(theta_range, L_range, fixed_centers_true)

    def __call__(
        self,
        batch_pred_2d,
        batch_true_2d,
        peak_params_pred=None,
        peak_params_true=None,
        tol: float = 0.05,
    ) -> float:
        pred_DI = self.qw_pred.tensor_to_d(np.asarray(batch_pred_2d))
        true_DI = self.qw_true.tensor_to_d(np.asarray(batch_true_2d))
        pred_peaks = find_peaks_for_batch(pred_DI, **(peak_params_pred or {}))
        true_peaks = find_peaks_for_batch(true_DI, **(peak_params_true or {}))
        return scalar_peak_matching_loss(pred_peaks, true_peaks, tol)


def naive_rebin(image: np.ndarray, centers, theta_range=GEOMETRY.theta_range,
                L_range=GEOMETRY.lambda_range) -> np.ndarray:
    """DiffQ-style single-image rebin -> I(d) (support_files/DiffQ.py:13-83);
    exact binning, so it shares the vectorized implementation."""
    qw = Qwrapper(theta_range, L_range, fixed_centers=centers)
    return np.asarray(qw.rebin(np.asarray(image)[None, None]))[0]
