"""Continue stage-2/3 training from a quality-run checkpoint and re-run the
published eval protocol.

Round-3 motivation: the QUALITY_r03 SR PSNR (28.9 dB) sits ~9 dB below the
protocol's measured noise ceiling on the same data — normalize(clean*mask)
scored against normalize(noisy*mask) with the protocol's own clamp/PSNR
gives 38.08 +- 0.63 dB (SSIM 0.986) over 96 eval samples, i.e. the best any
model could do since the noise draw is unpredictable — so the 28.9 was
training-budget-limited, not protocol-limited. This script buys more budget
for the SR-facing stages without repeating stage 1 (segmentation is already
at IoU 0.98). Outcome (committed artifacts QUALITY_r03_cont*): PSNR 30.86,
SSIM 0.645 after +20 SR / +30 joint epochs.

    python scripts/quality_continue.py --ckpt QUALITY_r03_ckpt \
        --out QUALITY_r03 --sr-epochs 20 --full-epochs 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_run import HELD_OUT, make_crystal_library, render_crystals  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="QUALITY_r03_ckpt")
    p.add_argument("--out", default="QUALITY_r03")
    p.add_argument("--height", type=int, default=250)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--train-crystals", type=int, default=64)
    p.add_argument("--renders-per-crystal", type=int, default=6)
    p.add_argument("--eval-renders-per-crystal", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--sr-epochs", type=int, default=20)
    p.add_argument("--full-epochs", type=int, default=30)
    p.add_argument("--warmup-epochs", type=int, default=3)
    p.add_argument("--noise-passes", type=int, default=5)
    p.add_argument("--sr-loss", default="SmoothL1Loss",
                   help="stage-2/3 reconstruction loss (SmoothL1SSIMLoss adds "
                        "a direct structural term)")
    p.add_argument("--compute-dtype", choices=("fp32", "bf16"), default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cdtype = jnp.bfloat16 if args.compute_dtype == "bf16" else None

    from swinwnet_tpu.data import ArrayLoader
    from swinwnet_tpu.data.noise import add_eval_noise, make_train_noise_augment
    from swinwnet_tpu.evalharness import MetricsCalculator, write_results_json
    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.train.trainers import FullModelTrainer, UpscalerTrainer
    from swinwnet_tpu.utils import enable_persistent_cache, save_checkpoint
    from swinwnet_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

    enable_persistent_cache()
    t_start = time.time()

    # identical data recipe/seeds as the quality run
    lib = make_crystal_library(args.train_crystals, seed=0)
    train_names = [n for n in lib if n not in HELD_OUT]
    train_images, train_masks = render_crystals(
        lib, train_names, args.renders_per_crystal, args.height, args.width, seed=1
    )
    eval_images, eval_masks = render_crystals(
        lib, HELD_OUT, args.eval_renders_per_crystal, args.height, args.width, seed=2
    )
    print(f"train {train_images.shape}, eval {eval_images.shape}")

    train_loader = ArrayLoader(
        train_images, train_masks, batch_size=args.batch, shuffle=True,
        augment=make_train_noise_augment(),
    )
    val_loader = ArrayLoader(
        eval_images, eval_masks, batch_size=args.batch,
        augment=make_train_noise_augment(mu_range=(100.0, 100.0)),
    )

    model = SwinWNet(
        in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192, remat=True,
    )
    target = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, args.height, args.width))
    )["params"]
    path = latest_checkpoint(args.ckpt)
    assert path, f"no checkpoint under {args.ckpt}"
    params = load_checkpoint(path, {"params": target})["params"]
    print(f"loaded {path}")

    t0 = time.time()
    if args.sr_epochs:
        print("=== Stage 2 (continue): upscaler ===")
        t2 = UpscalerTrainer(
            model, params, train_loader, val_loader, loss=args.sr_loss,
            num_epochs=args.sr_epochs, warmup_epochs=args.warmup_epochs,
            compute_dtype=cdtype,
        )
        t2.train()
        params = t2.state.params
        t2.release_training_state()
    if args.full_epochs:
        print("=== Stage 3 (continue): joint ===")
        t3 = FullModelTrainer(
            model, params, train_loader, val_loader, upscaler_loss=args.sr_loss,
            num_epochs=args.full_epochs, warmup_epochs=args.warmup_epochs,
            compute_dtype=cdtype,
        )
        t3.train()
        params = t3.state.params
        t3.release_training_state()
    print(f"continuation trained in {(time.time()-t0)/60:.1f} min")
    save_checkpoint(os.path.abspath(f"{args.out}_ckpt_cont"), {"params": params})

    variables = {"params": params}
    seg_all, ups_all, phys_all = None, None, None
    for k in range(args.noise_passes):
        noisy = add_eval_noise(eval_images[:, None].astype(np.float32), seed=k)[:, 0]
        loader = ArrayLoader(noisy, eval_masks, batch_size=args.batch)
        calc = MetricsCalculator(model, variables, loader, verbose=False)
        seg = calc.CalculateSegmentationMetrics()
        ups = calc.CalculateUpscalerMetrics()
        phys = calc.CalculatePhysycalMetrics()
        if seg_all is None:
            seg_all, ups_all, phys_all = seg, ups, phys
        else:
            for res in seg:
                for thr in seg[res]:
                    seg_all[res][thr].extend(seg[res][thr])
            for sec in ups:
                for m in ups[sec]:
                    ups_all[sec][m].extend(ups[sec][m])
            for m in phys:
                phys_all[m] = np.concatenate([phys_all[m], phys[m]])
        print(f"noise pass {k+1}/{args.noise_passes} done")

    def seg_summary(block):
        return {
            thr: {
                k: [float(np.mean([r[k] for r in rows])),
                    float(np.std([r[k] for r in rows], ddof=1))]
                for k in rows[0]
            }
            for thr, rows in block.items()
        }

    summary = {
        "run": f"{args.out} (continuation)",
        "continued_from": path,
        "extra_epochs": {"sr": args.sr_epochs, "full": args.full_epochs},
        "n_eval_samples": int(len(eval_images) * args.noise_passes),
        "segmentation": {res: seg_summary(seg_all[res]) for res in seg_all},
        "upscaling": {
            sec: {m: [float(np.mean(v)), float(np.std(v, ddof=1))] for m, v in d.items() if len(v)}
            for sec, d in ups_all.items()
        },
        "physical": {
            m: [float(np.mean(phys_all[m])), float(np.std(phys_all[m], ddof=1))]
            for m in phys_all
        },
    }
    with open(f"{args.out}_cont.json", "w") as f:
        json.dump(summary, f, indent=1)
    write_results_json(f"{args.out}_cont_segmentation_metrics.json", seg_all)
    write_results_json(f"{args.out}_cont_upscaling_metrics.json", ups_all)
    write_results_json(
        f"{args.out}_cont_physical_metrics.json",
        {
            "Integral Intensity": phys_all["integral"],
            "Peak Intensity": phys_all["peak"],
            "Shape": phys_all["shape"],
        },
    )
    print(f"wrote {args.out}_cont.json (total {(time.time()-t_start)/60:.1f} min)")
    print(json.dumps(summary["upscaling"], indent=1))


if __name__ == "__main__":
    main()
