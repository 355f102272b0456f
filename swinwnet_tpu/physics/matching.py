"""Greedy peak matching + per-sample metric aggregation
(reference: Diffraction_metrics.py:209-271).

Each predicted peak is matched to the nearest true peak by |d_com - d| with a
0.05 A tolerance; matched pairs contribute squared log-intensity errors and an
EMD shape term; totals are summed per sample.
"""

from __future__ import annotations

import math

import numpy as np

from .emd import emd_shape_loss


def compare_peak_sets(pred_peaks, true_peaks, tol=0.05):
    total_Iint = 0.0
    total_Imax = 0.0
    total_shape = 0.0

    if len(pred_peaks) == 0 or len(true_peaks) == 0:
        return total_Iint, total_Imax, total_shape

    x_ref = np.linspace(-0.03, 0.03, 64)

    for p1 in pred_peaks:
        d1 = p1["d_com"]
        p2 = min(true_peaks, key=lambda p: abs(p["d"] - d1))
        d2 = p2["d_com"]
        if abs(d1 - d2) > tol:
            continue

        Iint1 = max(p1["integral_intensity"], 0)
        Iint2 = max(p2["integral_intensity"], 0)
        total_Iint += (math.log(Iint1 + 1) - math.log(Iint2 + 1)) ** 2

        Imax1 = max(p1["max_intensity"], 0)
        Imax2 = max(p2["max_intensity"], 0)
        total_Imax += (math.log(Imax1 + 1) - math.log(Imax2 + 1)) ** 2

        total_shape += emd_shape_loss(p1, p2, x_ref)

    return total_Iint, total_Imax, total_shape


def peak_matching_loss(batch_pred, batch_true, tol=0.05):
    batch_Iint, batch_Imax, batch_shape = [], [], []
    for pred_peaks, true_peaks in zip(batch_pred, batch_true):
        Iint, Imax, shape = compare_peak_sets(pred_peaks, true_peaks, tol)
        batch_Iint.append(Iint)
        batch_Imax.append(Imax)
        batch_shape.append(shape)
    return {
        "Integral Intensity": batch_Iint,
        "Peak Intensity": batch_Imax,
        "Shape": batch_shape,
    }
