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

These baselines are the yardstick the published model numbers are read
against (bilinear: integral 1.433 / peak 0.199 / shape 0.0189) AND a
weights-free end-to-end validation of the physics stack: nothing here needs
a trained model when masks come from ground truth (`--mask gt`, default).
`--mask ckpt --ckpt DIR` reproduces the notebook's model-derived masks from
an orbax checkpoint instead.

    python scripts/classical_baselines.py --out CLASSICAL_r03
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
    p.add_argument("--out", default="CLASSICAL_r03")
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

    from quality_run import HELD_OUT, make_crystal_library, render_crystals

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from swinwnet_tpu.data.noise import add_eval_noise
    from swinwnet_tpu.evalharness.regression import compare_with_baseline
    from swinwnet_tpu.ops.norms import ensure_2ch, normalize_piecewise, denormalize_piecewise
    from swinwnet_tpu.physics import DiffractionMetricsCalculator, d_centers_hr, d_centers_lr
    from swinwnet_tpu.physics.legacy import DiffractionPipeline

    t0 = time.time()
    lib = make_crystal_library(0, seed=0)
    eval_images, eval_masks = render_crystals(
        lib, HELD_OUT, args.eval_renders_per_crystal, args.height, args.width, seed=2
    )
    print(f"eval set {eval_images.shape} ({time.time()-t0:.0f}s)")

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

        norm_lr, _ = normalize_piecewise(jnp.asarray(lr))
        _, params_hr = normalize_piecewise(jnp.asarray(hr))
        sr = jax.image.resize(norm_lr, hr.shape, method="bilinear")
        denorm_pred = np.asarray(denormalize_piecewise(sr, params_hr))

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
        "bilinear": ("BilinearInterpolation_diffraction_physycal_metrics_extended.json",
                     {"integral": 1.433, "peak": 0.199, "shape": 0.0189}),
        "avgpool": ("AVGPoolin_diffraction_physycal_metrics_extended.json",
                    {"integral": 2.631, "peak": 4.337, "shape": 0.0293}),
    }
    summary = {
        "run": args.out,
        "protocol": "Physycal_metrics_test.ipynb cells 14-27 (mask -> MaxPool2d -> "
                    "bilinear x2 / identity -> d-space metrics, 5 noise passes)",
        "mask_source": args.mask,
        "n_samples": len(results["bilinear"]["Shape"]),
        "baselines": {},
        "note": "published numbers come from the real McStas dataset + released "
                "weights (unavailable: BLOCKERS.md); synthetic-data deltas are "
                "informational scale checks, not gates",
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
        ref_file, ref_means = published[name]
        ref_path = os.path.join(args.baselines, ref_file)
        if os.path.exists(ref_path):
            ref = json.load(open(ref_path))
            comp = {}
            for ours_key, ref_key in (("Integral Intensity", "Integral Intensity losses"),
                                      ("Peak Intensity", "Peak Intensity losses"),
                                      ("Shape", "Shape_losses")):
                if ref_key in ref:
                    comp[ours_key] = compare_with_baseline(
                        np.asarray(vals[ours_key]), np.asarray(ref[ref_key], dtype=np.float64)
                    )
            entry["vs_published"] = comp
        summary["baselines"][name] = entry

    with open(f"{args.out}.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["baselines"], indent=1, default=str)[:1500])
    print(f"wrote {args.out}.json (+4 metric files) in {(time.time()-t0)/60:.1f} min")


if __name__ == "__main__":
    main()
