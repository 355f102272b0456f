"""Classical SR baselines through the published physical-metric pipeline.

Mirrors `/root/reference/experiments/Physycal_metrics_test.ipynb` cells 14-27:
the published protocol evaluates two weights-free upscalers with the exact
metric stack used for the model —

* **bilinear** (cell 22, saved as `results/BilinearInterpolation_..._extended
  .json`): mask -> MaxPool2d(2) -> normalize -> bilinear x2 -> denormalize
  with the HR normalization params -> d-space metrics (pred on the HR
  1241-bin grid with scale=True, true = pooled LR on the 832-bin grid);
* **avgpool** (cell 25, saved as `results/AVGPoolin_..._extended.json`):
  pred = the masked HR pattern itself vs its MaxPool2d(2) LR (the pooling
  identity baseline; the published file name says AvgPool but the notebook
  cell pools with MaxPool2d — mirrored as-is).

Both also get the older *scalar* peak-matching loss (support_files/
Peak_loss.py:161-190 -> `results/AGVpool_peak_losses.json`) via
`physics.legacy.DiffractionPipeline`.

Protocol details that are load-bearing for comparability (round-4 findings):

* `--norm notebook` (default): the notebook's normalize divides the log
  branch by log1p(1) while its denormalize does NOT invert that
  (ops.norms.normalize_piecewise_notebook) — the resulting nonlinear
  inflation of pred values nearly cancels the `scale=True` /4 and the
  HR/LR-grid pixel-count ratio. Measured on real data, it moves the bilinear
  Peak Intensity error from 2.26 (exact-inverse pair) to 0.17 vs the
  published 0.199. `--norm exact` keeps the trainers' self-consistent pair.
* `--data real` (default when /root/reference is present): the six real
  McStas patterns + their human-labeled masks (data.real). n = 6 x
  noise-passes instead of the published 240 x 5, and all six are
  max-statistics (5e8) patterns — the strongest-peak subset — so summed
  per-sample integral errors sit in the published distribution's upper
  tail; the summary records each metric's percentile placement inside the
  published per-sample distribution alongside the strict mean band.
* `--data synthetic` renders the synthetic eval crystals instead (the
  generator-calibration yardstick).
* Published runs masked with the *trained model's* soft sigmoid masks (cells
  22/25 call model.segment_1); weights are unavailable here (BLOCKERS.md), so
  `--mask gt` uses labeled/ground-truth binary masks and `--mask ckpt` an
  orbax checkpoint of our own training.

    python scripts/classical_baselines.py --out CLASSICAL_r04_real
    python scripts/classical_baselines.py --data synthetic --out CLASSICAL_r04_syn
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def maxpool2(x: np.ndarray) -> np.ndarray:
    """nn.MaxPool2d(kernel_size=2, stride=2) on [B, C, H, W]."""
    B, C, H, W = x.shape
    return x.reshape(B, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="CLASSICAL_r04")
    p.add_argument("--data", choices=("real", "synthetic"), default=None,
                   help="default: real if the reference datasets are present")
    p.add_argument("--norm", choices=("notebook", "exact"), default="notebook",
                   help="normalize/denormalize convention (see module docstring)")
    p.add_argument("--height", type=int, default=250)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--eval-renders-per-crystal", type=int, default=8)
    p.add_argument("--noise-passes", type=int, default=5)
    p.add_argument("--mask", choices=("gt", "ckpt"), default="gt")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir for --mask ckpt")
    p.add_argument("--baselines", default="/root/reference/results")
    p.add_argument("--device", choices=("auto", "cpu"), default="auto",
                   help="cpu = leave the TPU grant free (the hot path here is "
                        "host-side scipy anyway)")
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from swinwnet_tpu.data.noise import add_eval_noise
    from swinwnet_tpu.data.real import load_real_eval_set, reference_available
    from swinwnet_tpu.evalharness.regression import compare_with_baseline
    from swinwnet_tpu.ops.norms import (
        denormalize_piecewise,
        denormalize_piecewise_notebook,
        ensure_2ch,
        normalize_piecewise,
        normalize_piecewise_notebook,
    )
    from swinwnet_tpu.physics import DiffractionMetricsCalculator, d_centers_hr, d_centers_lr
    from swinwnet_tpu.physics.legacy import DiffractionPipeline

    if args.data is None:
        args.data = "real" if reference_available() else "synthetic"
    if args.norm == "notebook":
        norm_fn, denorm_fn = normalize_piecewise_notebook, denormalize_piecewise_notebook
    else:
        norm_fn, denorm_fn = normalize_piecewise, denormalize_piecewise

    t0 = time.time()
    if args.data == "real":
        eval_images, eval_masks, names = load_real_eval_set()
        data_note = f"real reference patterns ({', '.join(names)}) + labeled masks"
    else:
        from quality_run import HELD_OUT, make_crystal_library, render_crystals

        lib = make_crystal_library(0, seed=0)
        eval_images, eval_masks = render_crystals(
            lib, HELD_OUT, args.eval_renders_per_crystal, args.height, args.width, seed=2
        )
        data_note = "synthetic eval crystals (quality_run recipe)"
    print(f"eval set {eval_images.shape} [{args.data}] ({time.time()-t0:.0f}s)")

    seg_fn = None
    if args.mask == "ckpt":
        from swinwnet_tpu.models import SwinWNet
        from swinwnet_tpu.utils import load_checkpoint

        model = SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
            num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192,
        )
        variables = {"params": load_checkpoint(os.path.abspath(args.ckpt))["params"]}

        @jax.jit
        def seg_fn(x):
            seg, _ = model.apply(variables, x, method=SwinWNet.segment_1)
            return jax.nn.sigmoid(seg)

    calc = DiffractionMetricsCalculator(
        fixed_centers_pred=d_centers_hr, fixed_centers_true=d_centers_lr
    )
    pipe_scalar = DiffractionPipeline(
        fixed_centers_pred=d_centers_hr, fixed_centers_true=d_centers_lr
    )

    results = {
        "bilinear": {"Integral Intensity": [], "Peak Intensity": [], "Shape": [], "peak_loss": []},
        "avgpool": {"Integral Intensity": [], "Peak Intensity": [], "Shape": [], "peak_loss": []},
    }

    for k in range(args.noise_passes):
        hr = add_eval_noise(eval_images[:, None].astype(np.float32), seed=k)
        hr = np.asarray(ensure_2ch(jnp.asarray(hr)))
        if seg_fn is not None:
            mask = np.asarray(seg_fn(jnp.asarray(hr)))
        else:
            mask = eval_masks[:, None].astype(np.float32)
        hr = hr * mask
        lr = maxpool2(hr)

        norm_lr, _ = norm_fn(jnp.asarray(lr))
        _, params_hr = norm_fn(jnp.asarray(hr))
        sr = jax.image.resize(norm_lr, hr.shape, method="bilinear")
        denorm_pred = np.asarray(denorm_fn(sr, params_hr))

        # batch in chunks to keep host peak-finding memory flat
        B = hr.shape[0]
        for lo in range(0, B, 8):
            hi = min(lo + 8, B)
            for name, pred in (("bilinear", denorm_pred[lo:hi, 0:1]),
                               ("avgpool", hr[lo:hi, 0:1])):
                m = calc(
                    pred, lr[lo:hi, 0:1],
                    peak_params_pred={"scale": True},
                    peak_params_true={"scale": False}, tol=0.05,
                )
                for key in ("Integral Intensity", "Peak Intensity", "Shape"):
                    results[name][key].extend(float(x) for x in m[key])
                for i in range(hi - lo):
                    results[name]["peak_loss"].append(float(pipe_scalar(
                        pred[i:i + 1], lr[lo + i:lo + i + 1, 0:1],
                        peak_params_pred={"scale": True},
                        peak_params_true={"scale": False},
                    )))
        print(f"noise pass {k+1}/{args.noise_passes} done ({time.time()-t0:.0f}s)")

    # ----- write the notebook-schema JSONs + summary -----
    published = {
        "bilinear": "BilinearInterpolation_diffraction_physycal_metrics_extended.json",
        "avgpool": "AVGPoolin_diffraction_physycal_metrics_extended.json",
    }
    summary = {
        "run": args.out,
        "protocol": "Physycal_metrics_test.ipynb cells 14-27 (mask -> MaxPool2d -> "
                    "bilinear x2 / identity -> d-space metrics, "
                    f"{args.noise_passes} noise passes)",
        "data": data_note,
        "norm_convention": args.norm,
        "mask_source": args.mask,
        "n_samples": len(results["bilinear"]["Shape"]),
        "baselines": {},
        "note": (
            "published runs: 240 real test patterns (stats 1e7..5e8, pulse 10..300us) "
            "x5 noise passes with trained-model soft masks; this run substitutes the "
            "locally available data/masks (see 'data'/'mask_source'), so strict mean "
            "bands are complemented by each metric's percentile inside the published "
            "per-sample distribution"
        ),
    }
    for name, vals in results.items():
        with open(f"{args.out}_{name}_physical_metrics.json", "w") as f:
            json.dump({
                "Integral Intensity losses": vals["Integral Intensity"],
                "Peak Intensity losses": vals["Peak Intensity"],
                "Shape_losses": vals["Shape"],
            }, f, indent=4)
        with open(f"{args.out}_{name}_peak_losses.json", "w") as f:
            json.dump({"peak_losses": vals["peak_loss"]}, f, indent=4)

        entry = {
            m: [float(np.mean(vals[m])), float(np.std(vals[m], ddof=1))]
            for m in ("Integral Intensity", "Peak Intensity", "Shape", "peak_loss")
        }
        ref_path = os.path.join(args.baselines, published[name])
        if os.path.exists(ref_path):
            ref = json.load(open(ref_path))
            comp = {}
            for ours_key, ref_key in (("Integral Intensity", "Integral Intensity losses"),
                                      ("Peak Intensity", "Peak Intensity losses"),
                                      ("Shape", "Shape_losses")):
                if ref_key in ref:
                    base = np.asarray(ref[ref_key], dtype=np.float64)
                    c = compare_with_baseline(np.asarray(vals[ours_key]), base)
                    # where does our mean sit inside the published per-sample
                    # distribution? (the honest cross-dataset comparison)
                    c["percentile_in_published"] = round(
                        float((base <= c["mean_new"]).mean() * 100.0), 1
                    )
                    c["within_published_iqr"] = bool(
                        np.percentile(base, 25) <= c["mean_new"] <= np.percentile(base, 75)
                    )
                    c["within_published_p5_p95"] = bool(
                        np.percentile(base, 5) <= c["mean_new"] <= np.percentile(base, 95)
                    )
                    comp[ours_key] = c
            entry["vs_published"] = comp
        summary["baselines"][name] = entry

    with open(f"{args.out}.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["baselines"], indent=1, default=str)[:2500])
    print(f"wrote {args.out}.json (+4 metric files) in {(time.time()-t0)/60:.1f} min")


if __name__ == "__main__":
    main()
