"""High-level physical metrics facade (reference: Diffraction_metrics.py:277-306).

The d-space rebinning runs fully on-device as a compiled segment-sum
(`Qwrapper.rebin`); the sequential scipy peak finding + greedy matching runs
on the host over the rebinned spectra. The whole-batch [B, n_bins] transfer is
tiny (a few hundred KB), so the device -> host boundary sits exactly where the
arithmetic intensity drops off.
"""

from __future__ import annotations

import numpy as np

from ..core.config import GEOMETRY
from .host_oracle import peak_matching_loss
from .peaks import find_peaks_for_batch
from .qwrapper import Qwrapper


class DiffractionMetricsCalculator:
    """Compare predicted and true 2D patterns in d-space.

    Returns ``{"Integral Intensity", "Peak Intensity", "Shape"}`` per-sample
    lists, identical in schema to the reference calculator so results JSONs
    remain interchangeable.
    """

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
        tol=0.05,
    ):
        peak_params_pred = peak_params_pred or {}
        peak_params_true = peak_params_true or {}

        pred_DI = self.qw_pred.tensor_to_d(np.asarray(batch_pred_2d))
        true_DI = self.qw_true.tensor_to_d(np.asarray(batch_true_2d))

        pred_peaks = find_peaks_for_batch(pred_DI, **peak_params_pred)
        true_peaks = find_peaks_for_batch(true_DI, **peak_params_true)

        return peak_matching_loss(pred_peaks, true_peaks, tol)
