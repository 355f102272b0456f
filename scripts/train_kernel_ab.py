"""A/B: stage-3 training step with fused Pallas kernels (custom-VJP,
round 3) vs the pure-XLA path — the data for the training-path kernel
decision (PERFORMANCE.md).

Both arms run the quality-run configuration (fp32, per-block remat,
batch 4, published architecture at 250x480). The fused arm's forward goes
through the whole-block kernels; its backward rematerializes through the
XLA reference (ops/pallas/swin_block.py:fused_block_autodiff).

Usage:  python scripts/train_kernel_ab.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main():
    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.train.freeze import masked_adamw
    from swinwnet_tpu.train.losses import combined_loss, smooth_l1_loss
    from swinwnet_tpu.train.trainers import TrainState, make_stage1_step, make_stage3_steps
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1e3, (BATCH, 1, 250, 480)), jnp.float32)
    masks = jnp.asarray((rng.uniform(size=(BATCH, 250, 480)) > 0.9), jnp.float32)

    def bench(use_pallas):
        model = SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
            num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192,
            remat=True, use_pallas=use_pallas,
        )
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 250, 480)))["params"]
        out = {}
        for name, stage, mk in (
            ("stage1", "stage1", lambda tx: make_stage1_step(model, tx, combined_loss)),
            ("stage3_odd", "stage3", lambda tx: make_stage3_steps(
                model, tx, combined_loss, smooth_l1_loss)[1]),
        ):
            # the step and the state MUST share one masked transform: the
            # masked opt-state pytree structure differs per stage
            tx = masked_adamw(params, stage, 1e-4)
            step = mk(tx)
            state = TrainState.create(params, tx)
            t0 = time.perf_counter()
            s, _ = step(state, images, masks)
            _ = float(np.asarray(s.step))
            compile_s = time.perf_counter() - t0
            ss = state
            t0 = time.perf_counter()
            for _ in range(ITERS):
                ss, _ = step(ss, images, masks)
            _ = float(np.asarray(ss.step))
            dt = (time.perf_counter() - t0) / ITERS
            out[name] = (dt, compile_s)
            print(
                f"use_pallas={use_pallas!s:5s} {name:11s}: {dt*1e3:8.1f} ms/step "
                f"({BATCH/dt:6.2f} img/s)  [first-call {compile_s:.0f}s]",
                flush=True,
            )
        return out

    a = bench(False)
    b = bench(True)
    for name in a:
        print(f"{name}: fused/xla speedup = {a[name][0]/b[name][0]:.2f}x")


if __name__ == "__main__":
    main()
