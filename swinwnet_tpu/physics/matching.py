"""Greedy peak matching + per-sample metric aggregation — re-export shim.

The host-side spec transcription (reference: Diffraction_metrics.py:209-271)
lives in :mod:`.host_oracle`; the TPU-native fixed-shape matching used inside
compiled graphs lives in :mod:`.device_metrics`.
"""

from __future__ import annotations

from .host_oracle import compare_peak_sets, peak_matching_loss  # noqa: F401

__all__ = ["compare_peak_sets", "peak_matching_loss"]
