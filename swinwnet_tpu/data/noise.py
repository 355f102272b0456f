"""Noise-injection evaluation protocol.

The published metrics average 5 passes with additive N(mu=100, sigma=20)
noise applied to each test pattern before inference
(experiments/Physycal_metrics_test.ipynb cell 14; SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np


def add_eval_noise(images: np.ndarray, mu: float = 100.0, sigma: float = 20.0, seed: int = 0):
    rng = np.random.default_rng(seed)
    return images + rng.normal(mu, sigma, size=images.shape).astype(images.dtype)
