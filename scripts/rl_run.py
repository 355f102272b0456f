"""RL fine-tuning run: REINFORCE alpha-policy on top of a supervised
checkpoint -> reward curve + learned-alpha statistics + pre/post physical
metrics in the published results schema.

This exercises BASELINE config #5 end-to-end (the reference path:
RL_finetuning_pipline.py:168-307 ->
results/SwinWnet_simple_alpha_policy_diffraction+error_matrix_physycal_metrics.json,
results/SwinWnet_physycal_loss_RL.json). Unlike the reference — which crosses
to the CPU for scipy peak finding every batch — the reward here is the
vectorized on-device metric (physics/device_metrics.py), so the whole RL step
is one compiled TPU function.

Data and eval protocol mirror scripts/quality_run.py (same synthetic crystal
library seeds, same held-out set, same noise passes); the starting weights
come from the quality run's checkpoint:

    python scripts/rl_run.py --ckpt QUALITY_r04_ckpt --out QUALITY_r04_rl \
        --epochs 20 --train-crystals 32 --renders-per-crystal 4
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
    p.add_argument("--ckpt", default="QUALITY_r04_ckpt")
    p.add_argument("--out", default="QUALITY_r04_rl")
    p.add_argument("--height", type=int, default=250)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--train-crystals", type=int, default=32)
    p.add_argument("--renders-per-crystal", type=int, default=4)
    p.add_argument("--eval-renders-per-crystal", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--noise-passes", type=int, default=5)
    p.add_argument("--lambda-rec", type=float, default=10.0)
    p.add_argument("--policy-lr", type=float, default=1e-4)
    p.add_argument("--model-lr", type=float, default=1e-5)
    p.add_argument("--compute-dtype", choices=("fp32", "bf16"), default="bf16",
                   help="RL step compute precision (bf16 = reference-AMP analog)")
    p.add_argument("--ablation-gains", default="0.40,0.45,0.50,0.55,0.60",
                   help="constant-gain grid for the REINFORCE-vs-scalar ablation")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from swinwnet_tpu.data import ArrayLoader
    from swinwnet_tpu.data.noise import add_eval_noise
    from swinwnet_tpu.evalharness import MetricsCalculator, write_results_json
    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.models.alpha_policy import AlphaPolicy
    from swinwnet_tpu.train.rl import RLTrainer
    from swinwnet_tpu.utils import enable_persistent_cache, save_checkpoint
    from swinwnet_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

    enable_persistent_cache()
    t_start = time.time()

    # same library/seeds as quality_run so the held-out set matches
    lib = make_crystal_library(args.train_crystals, seed=0)
    train_names = [n for n in lib if n not in HELD_OUT]
    train_images, _ = render_crystals(
        lib, train_names, args.renders_per_crystal, args.height, args.width, seed=1
    )
    eval_images, eval_masks = render_crystals(
        lib, HELD_OUT, args.eval_renders_per_crystal, args.height, args.width, seed=2
    )
    print(f"train {train_images.shape}, eval {eval_images.shape}")

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

    policy = AlphaPolicy()
    policy_params = policy.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, args.height // 2, args.width // 2))
    )["params"]

    def physical_eval(variables, policy_obj=None, policy_pv=None, passes=None):
        """Physical metrics under the published protocol. norm_convention=
        "notebook": the published RL baseline file was produced by
        SwinWNet_RL_fine_tune_updated.ipynb, whose normalize carries the
        /log1p(1) division (cell 20) — same quirk as the classical files."""
        agg = None
        calc = MetricsCalculator(
            model, variables, None, verbose=False,
            policy=policy_obj, policy_variables=policy_pv,
            norm_convention="notebook",
        )
        for k in range(passes or args.noise_passes):
            noisy = add_eval_noise(eval_images[:, None].astype(np.float32), seed=k)[:, 0]
            calc.val_loader = ArrayLoader(noisy, eval_masks, batch_size=args.batch)
            m = calc.CalculatePhysycalMetrics()
            if agg is None:
                agg = m
            else:
                for key in agg:
                    agg[key] = np.concatenate([agg[key], m[key]])
        return agg

    class ConstPolicy:
        """Deterministic constant-gain 'policy': mu = logit(gain) for every
        sample — the null hypothesis the REINFORCE policy must beat
        (apply_action multiplies by sigmoid(mu), RL_policy.py:20-24)."""

        def __init__(self, gain: float):
            self.logit = float(np.log(gain / (1.0 - gain)))

        def apply(self, variables, x):
            mu = jnp.full((x.shape[0], 1), self.logit, jnp.float32)
            return mu, jnp.ones_like(mu)

    print("pre-RL physical metrics...")
    pre = physical_eval({"params": params})
    pre_summary = {k: [float(np.mean(v)), float(np.std(v, ddof=1))] for k, v in pre.items()}
    print(json.dumps(pre_summary))

    # ---- RL fine-tune (REINFORCE + supervised L1, two optimizers) ----
    # same additive-noise augmentation as the supervised quality run: the
    # real patterns the reference RL-tunes on carry instrument background
    # that bare synthetic renders lack (see quality_run.py)
    from swinwnet_tpu.data.noise import make_train_noise_augment

    train_loader = ArrayLoader(
        train_images, np.zeros_like(train_images, dtype=np.uint8),
        batch_size=args.batch, shuffle=True,
        augment=make_train_noise_augment(),
    )
    trainer = RLTrainer(
        model, params, policy, policy_params, train_loader,
        num_epochs=args.epochs, lambda_rec=args.lambda_rec,
        policy_lr=args.policy_lr, model_lr=args.model_lr,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bf16" else None,
    )
    t0 = time.time()
    history = trainer.fit()
    rl_minutes = (time.time() - t0) / 60
    print(f"RL fit done in {rl_minutes:.1f} min")

    post_params = trainer.state.model.params
    post_policy = trainer.state.policy.params
    save_checkpoint(
        os.path.abspath(f"{args.out}_ckpt"),
        {"params": post_params, "policy": post_policy},
    )

    print("post-RL physical metrics (deterministic mu action)...")
    post = physical_eval(
        {"params": post_params}, policy_obj=policy, policy_pv={"params": post_policy}
    )
    post_summary = {k: [float(np.mean(v)), float(np.std(v, ddof=1))] for k, v in post.items()}
    print(json.dumps(post_summary))

    # ---- ablation: REINFORCE policy vs a constant gain found by grid search
    # (VERDICT r03 item 6a). Two nulls: (pre-RL model + best constant gain)
    # isolates what a scalar alone buys; (post-RL model + best constant gain)
    # isolates whether the *learned policy* adds anything beyond a scalar on
    # top of the supervised-L1 co-training.
    gains = [float(g) for g in args.ablation_gains.split(",")]
    ablation = {"grid": {}, "noise_passes_grid": 2}
    for tag, prms in (("pre_model", params), ("post_model", post_params)):
        rows = {}
        for g in gains:
            m = physical_eval({"params": prms}, policy_obj=ConstPolicy(g), passes=2)
            rows[f"{g:.2f}"] = {
                k: round(float(np.mean(v)), 4) for k, v in m.items()
            }
            print(f"ablation {tag} gain={g:.2f}: {rows[f'{g:.2f}']}")
        ablation["grid"][tag] = rows
    print("ablation done")

    write_results_json(
        f"{args.out}_physical_metrics.json",
        {
            "Integral Intensity": post["integral"],
            "Peak Intensity": post["peak"],
            "Shape": post["shape"],
        },
    )

    # learned-alpha statistics on the eval set
    mu_fn = jax.jit(lambda pv, x: policy.apply(pv, x)[0])
    from swinwnet_tpu.ops.norms import ensure_2ch, normalize_piecewise
    from swinwnet_tpu.ops.resize import bilinear_downscale_half

    x2 = ensure_2ch(jnp.asarray(eval_images[:, None].astype(np.float32)))
    norm_lr, _ = normalize_piecewise(bilinear_downscale_half(x2))
    mus = np.asarray(mu_fn({"params": post_policy}, norm_lr)).ravel()
    gains = 1.0 / (1.0 + np.exp(-mus))

    summary = {
        "run": args.out,
        "config": "SwinWNet + RL alpha policy (+error matrix) — BASELINE config #5",
        "start_checkpoint": path,
        "epochs": args.epochs,
        "rl_minutes": round(rl_minutes, 1),
        "n_eval_samples": int(len(eval_images) * args.noise_passes),
        "reward_curve": [h["reward"] for h in history],
        "final_epoch_metrics": history[-1] if history else {},
        "alpha": {
            "mu_mean": float(mus.mean()), "mu_std": float(mus.std()),
            "gain_mean": float(gains.mean()), "gain_min": float(gains.min()),
            "gain_max": float(gains.max()),
        },
        "physical_pre": pre_summary,
        "physical_post": post_summary,
        "ablation_constant_gain": ablation,
        "shape_trade_note": (
            "the reward weights (lambda 2/1/0.5, RL_finetuning_pipline.py:220-230) "
            "license trading the lowest-weighted term: the published RL run shows "
            "the same pattern in the other direction — its integral WORSENED "
            "1.980 -> 2.237 while peak improved 5.865 -> 1.950 "
            "(results/SwinWnet_diffraction+error_matrix_... vs "
            "..._simple_alpha_policy_...). A shape or integral regression after "
            "RL is therefore a parity observation, not a defect (VERDICT r03 "
            "item 6b)."
        ),
        "published_rl_baseline": {
            "file": "results/SwinWnet_simple_alpha_policy_diffraction+error_matrix_physycal_metrics.json",
            "integral": [2.237, 1.988], "peak": [1.950, 2.468], "shape": [0.0259, 0.0146],
            "note": (
                "published numbers use the real McStas dataset + released weights "
                "(unavailable: BLOCKERS.md); the comparison that matters here is "
                "physical_pre vs physical_post — did REINFORCE move the metrics"
            ),
        },
    }
    with open(f"{args.out}.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}.json (total {(time.time()-t_start)/60:.1f} min)")


if __name__ == "__main__":
    main()
