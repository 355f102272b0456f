"""End-to-end workflow on synthetic data: generate -> 3-stage supervised
training -> RL fine-tune -> evaluation -> results JSON + plots.

A miniature of the reference's full lifecycle (dataset generation notebooks ->
Supervised_train_full_pipline -> RL_finetuning_pipline -> tests.py metrics ->
results/*.json) that runs in minutes on one chip. Use --tiny for a CI-sized
run.

    python examples/train_synthetic.py --tiny --epochs 2 --out runs/demo
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running straight from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="tiny model + 40x40 patterns")
    parser.add_argument("--samples", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--rl-epochs", type=int, default=1)
    parser.add_argument("--loader", choices=("array", "native"), default="array",
                        help="input pipeline: python ArrayLoader or the C++ "
                             "prefetching NativeBatcher")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument("--out", default="runs/synthetic")
    args = parser.parse_args()

    import jax

    if args.cpu:  # env alone is ignored when the TPU plugin pre-registers
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from swinwnet_tpu.data import ArrayLoader
    from swinwnet_tpu.data.generation import synthesize_dataset
    from swinwnet_tpu.evalharness import MetricsCalculator, write_results_json
    from swinwnet_tpu.evalharness.plots import plot_metric_distributions
    from swinwnet_tpu.models import AlphaPolicy, SwinWNet
    from swinwnet_tpu.train import RLTrainer, SwinWNetTrainingPipeline
    from swinwnet_tpu.utils import save_checkpoint

    os.makedirs(args.out, exist_ok=True)

    if args.tiny:
        H = W = 40
        model = SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=12, depths=(1, 1, 1, 1),
            num_heads=(3, 6, 12, 24), window_size=5,
        )
    else:
        H, W = 250, 480
        model = SwinWNet(in_chans=1, error_matrix=True)

    print("generating synthetic dataset...")
    images, masks = synthesize_dataset(args.samples, H=H, W=W, seed=0)
    split = max(args.samples * 3 // 4, 1)
    # train-time additive-background augmentation: covers the published eval
    # protocol's N(100, 20) injection (see scripts/quality_run.py — without it
    # a model trained on bare synthetic renders over-segments noisy inputs)
    from swinwnet_tpu.data.noise import make_train_noise_augment

    if args.loader == "native":
        from swinwnet_tpu.data.native_loader import NativeBatcher

        train_loader = NativeBatcher(
            images[:split], masks[:split], batch_size=args.batch, shuffle=True,
            add_noise=True, noise_mu_range=(0.0, 150.0),
        )
        val_loader = NativeBatcher(
            images[split:], masks[split:], batch_size=args.batch, shuffle=False
        )
    else:
        train_loader = ArrayLoader(
            images[:split], masks[:split], batch_size=args.batch, shuffle=True,
            augment=make_train_noise_augment(),
        )
        val_loader = ArrayLoader(images[split:], masks[split:], batch_size=args.batch)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, H, W)))["params"]

    print("3-stage supervised training...")
    pipeline = SwinWNetTrainingPipeline(
        model,
        params,
        train_loader,
        val_loader,
        seg_epochs=args.epochs,
        sr_epochs=args.epochs,
        full_epochs=args.epochs,
        warmup_epochs=1,
    )
    params, histories = pipeline.run()

    print("RL fine-tuning...")
    policy = AlphaPolicy()
    policy_params = policy.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, H // 2, W // 2)))["params"]
    rl = RLTrainer(
        model, params, policy, policy_params, train_loader, num_epochs=args.rl_epochs
    )
    rl.fit()
    params = rl.state.model.params

    print("evaluation...")
    calc = MetricsCalculator(model, {"params": params}, val_loader, verbose=True)
    seg = calc.CalculateSegmentationMetrics()
    sr = calc.CalculateUpscalerMetrics()
    phys = calc.CalculatePhysycalMetrics()

    write_results_json(
        os.path.join(args.out, "segmentation_metrics.json"),
        {
            "metrics_25": seg["Low Res"]["0.25 thrashold"],
            "metrics_50": seg["Low Res"]["0.50 thrashold"],
            "metrics_75": seg["Low Res"]["0.75 thrashold"],
        },
    )
    write_results_json(
        os.path.join(args.out, "upscaling_metrics.json"),
        {"PSNRs": sr["Summary Metrics"]["PSNR"], "SSIMs": sr["Summary Metrics"]["SSIM"]},
    )
    write_results_json(
        os.path.join(args.out, "physycal_metrics.json"),
        {
            "Integral Intensity losses": phys["integral"],
            "Peak Intensity losses": phys["peak"],
            "Shape_losses": phys["shape"],
        },
    )
    plot_metric_distributions(phys, save_path=os.path.join(args.out, "physical_metrics.png"))
    save_checkpoint(os.path.join(args.out, "checkpoints"), {"params": params}, step=0)
    print(f"artifacts written to {args.out}")


if __name__ == "__main__":
    main()
