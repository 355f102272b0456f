"""Stage-1 recipe-fix A/B: keep_best + theta-flip augmentation, measured.

QUALITY_r05's post-run diagnosis (README round-5 status, runs/quality_r05.log)
found two recipe defects: the pipeline evaluates the *final* — not best-val —
params, and stage-1 plateaus by ~epoch 10 on only 384 train samples. Both
fixes landed in round 5 (`--keep-best` / `--flip-augment` on quality_run.py,
unit-tested) but the full 333-minute 3-stage re-run did not fit the round's
remaining device budget. This script measures the fixes where they are
cheapest to isolate: stage 1 (segmentator pretrain — the reference's
Segmentator_pretrain.py:104-200 stage) on the exact QUALITY_r05 data recipe
(calibrated crystal library, 64x6 train renders, real-geometry held-out
crystals x8 eval, 250x480) with identical epochs / optimizer / schedule /
bf16 precision / seeds.

Arms (same data, same init, same loader seeds):
  baseline — the QUALITY_r05 stage-1 recipe verbatim (final-epoch params)
  fixes    — + keep_best (best-val snapshot) + theta-flip joint augmentation

Output: STAGE1_AB_r05.json with per-arm val trajectories, best/final val
loss, and LR segmentation metrics (IoU/Dice/PixelAccuracy/Precision/Recall
at thresholds 0.25/0.50/0.75) on the calibrated eval set under the published
noise protocol (additive N(100,20), Physycal_metrics_test.ipynb cell 14),
`--noise-passes` passes.

    python scripts/stage1_ab_r05.py --out STAGE1_AB_r05
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

from quality_run import HELD_OUT, make_crystal_library, render_crystals  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="STAGE1_AB_r05")
    p.add_argument("--height", type=int, default=250)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--train-crystals", type=int, default=64)
    p.add_argument("--renders-per-crystal", type=int, default=6)
    p.add_argument("--eval-renders-per-crystal", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seg-epochs", type=int, default=40)
    p.add_argument("--warmup-epochs", type=int, default=3)
    p.add_argument("--noise-passes", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="tiny arch + 50x60 smoke")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from swinwnet_tpu.data import ArrayLoader
    from swinwnet_tpu.data.noise import (
        add_eval_noise,
        make_theta_flip_augment,
        make_train_noise_augment,
    )
    from swinwnet_tpu.evalharness.harness import METRIC_NAMES, THRESHOLDS
    from swinwnet_tpu.evalharness.image_metrics import segmentation_metrics_batch
    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.train.trainers import SegmentatorTrainer
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    if args.tiny:
        args.height, args.width = 50, 60
        model = SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=12, depths=(1, 1, 1, 1),
            num_heads=(3, 6, 12, 24), window_size=5,
        )
    else:
        # the QUALITY_r05 architecture (published config #4)
        model = SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
            num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192, remat=True,
        )

    t_start = time.time()
    lib = make_crystal_library(args.train_crystals, seed=0)
    train_names = [n for n in lib if n not in HELD_OUT]
    print(f"rendering {len(train_names)} train crystals x{args.renders_per_crystal}...")
    train_images, train_masks = render_crystals(
        lib, train_names, args.renders_per_crystal, args.height, args.width, seed=1
    )
    eval_images, eval_masks = render_crystals(
        lib, HELD_OUT, args.eval_renders_per_crystal, args.height, args.width, seed=2
    )
    print(f"train {train_images.shape}, eval {eval_images.shape} "
          f"({time.time() - t_start:.0f}s)")

    init_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, args.height, args.width))
    )["params"]

    # LR segmentation eval: segment_1 forward only (the stage-1 product);
    # the full-pipeline HR path is untrained here and irrelevant to the A/B.
    @jax.jit
    def seg_forward(variables, images):
        from swinwnet_tpu.ops.norms import ensure_2ch

        seg, _skips = model.apply(variables, ensure_2ch(images), method=SwinWNet.segment_1)
        return jax.nn.sigmoid(seg)

    def eval_lr_segmentation(params):
        acc = {t: {m: [] for m in METRIC_NAMES} for t in THRESHOLDS}
        for k in range(args.noise_passes):
            noisy = add_eval_noise(eval_images[:, None].astype(np.float32), seed=k)[:, 0]
            loader = ArrayLoader(noisy, eval_masks, batch_size=args.batch)
            for images, masks in loader:
                seg = seg_forward({"params": params}, jnp.asarray(images))
                masks = jnp.asarray(masks)[:, None]
                for t in THRESHOLDS:
                    out = segmentation_metrics_batch(seg, masks, threshold=t)
                    for m in METRIC_NAMES:
                        acc[t][m].extend(np.asarray(out[m]).tolist())
        return {
            f"{t:.2f}": {m: [float(np.mean(v)), float(np.std(v, ddof=1))]
                         for m, v in acc[t].items()}
            for t in THRESHOLDS
        }

    def run_arm(name, keep_best, flip_augment):
        print(f"\n=== arm: {name} (keep_best={keep_best}, flip={flip_augment}) ===")
        train_loader = ArrayLoader(
            train_images, train_masks, batch_size=args.batch, shuffle=True,
            augment=make_train_noise_augment(),
            joint_augment=make_theta_flip_augment() if flip_augment else None,
        )
        val_loader = ArrayLoader(
            eval_images, eval_masks, batch_size=args.batch,
            augment=make_train_noise_augment(mu_range=(100.0, 100.0)),
        )
        trainer = SegmentatorTrainer(
            model, init_params, train_loader, val_loader,
            num_epochs=args.seg_epochs, warmup_epochs=args.warmup_epochs,
            compute_dtype=jnp.bfloat16, keep_best=keep_best,
        )
        t0 = time.time()
        hist = trainer.train()
        mins = (time.time() - t0) / 60
        val = hist["val_loss"]
        record = {
            "keep_best": keep_best,
            "flip_augment": flip_augment,
            "train_minutes": round(mins, 1),
            "final_val": float(val[-1]),
            "best_val": float(np.nanmin(val)),
            "best_epoch": int(np.nanargmin(val)) + 1,
            "val_trajectory": [round(float(v), 6) for v in val],
            "lr_segmentation": eval_lr_segmentation(trainer.state.params),
        }
        print(f"  best val {record['best_val']:.4f} @ep{record['best_epoch']}, "
              f"final {record['final_val']:.4f}, "
              f"IoU@0.50 {record['lr_segmentation']['0.50']['IoU'][0]:.4f} "
              f"({mins:.1f} min)")
        return record

    arms = {
        "baseline": run_arm("baseline", keep_best=False, flip_augment=False),
        "fixes": run_arm("fixes", keep_best=True, flip_augment=True),
    }

    summary = {
        "run": args.out,
        "what": "stage-1 A/B of the round-5 recipe fixes (keep_best + theta-flip)",
        "recipe": {
            "data": f"calibrated library, {len(train_names)}x{args.renders_per_crystal} "
                    f"train, {len(HELD_OUT)}x{args.eval_renders_per_crystal} eval, "
                    f"noise_passes={args.noise_passes}",
            "geometry": [args.height, args.width],
            "seg_epochs": args.seg_epochs,
            "compute_dtype": "bf16",
        },
        "arms": arms,
        "delta": {
            # each arm's evaluated params: baseline = final epoch, fixes =
            # best-val snapshot (what keep_best restores)
            "val_loss_evaluated": round(
                arms["fixes"]["best_val"] - arms["baseline"]["final_val"], 6),
            "iou@0.50_lr": round(
                arms["fixes"]["lr_segmentation"]["0.50"]["IoU"][0]
                - arms["baseline"]["lr_segmentation"]["0.50"]["IoU"][0], 6),
        },
        "note": (
            "the baseline arm evaluates final-epoch params (the QUALITY_r05 "
            "behavior); the fixes arm evaluates its best-val snapshot — that "
            "asymmetry IS the keep_best fix being measured"
        ),
    }
    with open(f"{args.out}.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nwrote {args.out}.json (total {(time.time() - t_start) / 60:.1f} min)")
    print(json.dumps(summary["delta"], indent=1))


if __name__ == "__main__":
    main()
