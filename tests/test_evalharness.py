"""Evaluation harness: schema + end-to-end smoke on a tiny model, plus the
legacy scalar peak loss and the apps layer."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.apps import compute_d_map, intervals_to_mask
from swinwnet_tpu.data import ArrayLoader
from swinwnet_tpu.data.generation import synthesize_dataset, synthesize_pattern
from swinwnet_tpu.evalharness import MetricsCalculator, write_results_json
from swinwnet_tpu.models import SwinWNet
from swinwnet_tpu.physics import DiffractionPipeline, Qwrapper, d_centers_lr

TINY = dict(
    in_chans=1,
    error_matrix=True,
    embed_dim=12,
    depths=(1, 1, 1, 1),
    num_heads=(3, 6, 12, 24),
    window_size=5,
)


def test_synthetic_generator_physics():
    """Synthetic Bragg loci must land at their d positions under the rebinner."""
    d_true = [1.5, 3.0, 5.0]
    img = synthesize_pattern(d_true, [1.0, 1.0, 1.0], seed=None, background=0.0)
    qw = Qwrapper(fixed_centers=d_centers_lr)
    I = np.asarray(qw.rebin(img[None, None]))[0]
    # the 3 strongest local regions should be near d_true
    from scipy.signal import find_peaks

    peaks, _ = find_peaks(I / I.max(), height=0.1, distance=20)
    found_d = d_centers_lr[peaks]
    for d in d_true:
        assert np.min(np.abs(found_d - d)) < 0.05, (d, found_d)


def test_labeler_roundtrip():
    d_map = compute_d_map(H=50, W=60)
    mask = intervals_to_mask([(1.4, 1.6)], d_map)
    assert mask.shape == (50, 60)
    assert mask.sum() > 0
    inside = np.nan_to_num(d_map, nan=-1)
    assert np.all((inside[mask.astype(bool)] >= 1.4) & (inside[mask.astype(bool)] <= 1.6))


def test_scalar_peak_loss_zero_for_identical():
    img = synthesize_pattern([2.0, 4.0], [1.0, 2.0], H=250, W=480, seed=None)
    pipe = DiffractionPipeline(d_centers_lr, d_centers_lr)
    loss = pipe(img[None, None], img[None, None])
    assert loss == 0.0


@pytest.mark.slow
def test_metrics_calculator_end_to_end():
    H, W = 40, 40
    images, masks = synthesize_dataset(2, H=H, W=W, seed=1)
    loader = ArrayLoader(images, masks, batch_size=2)

    model = SwinWNet(**TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W)))
    calc = MetricsCalculator(model, variables, loader, verbose=False)

    seg = calc.CalculateSegmentationMetrics()
    assert set(seg) == {"Low Res", "High Res"}
    assert len(seg["Low Res"]["0.50 thrashold"]) == 2
    assert set(seg["Low Res"]["0.50 thrashold"][0]) == {
        "PixelAccuracy",
        "IoU",
        "Dice",
        "Precision",
        "Recall",
    }

    sr = calc.CalculateUpscalerMetrics()
    assert len(sr["Summary Metrics"]["PSNR"]) == 2
    assert np.isfinite(sr["Summary Metrics"]["PSNR"]).all()

    phys = calc.CalculatePhysycalMetrics()
    assert set(phys) == {"integral", "peak", "shape"}
    assert len(phys["integral"]) == 2

    # results-JSON writer roundtrip in the published schema
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "metrics.json")
        write_results_json(
            path,
            {
                "metrics_50": seg["Low Res"]["0.50 thrashold"],
                "PSNRs": sr["Summary Metrics"]["PSNR"],
                "Integral Intensity losses": phys["integral"],
            },
        )
        loaded = json.load(open(path))
        assert len(loaded["metrics_50"]) == 2
        assert isinstance(loaded["PSNRs"][0], float)
