"""Throughput benchmark: full 8-stage SwinWNet inference, images/sec/chip.

Runs the flagship multimodal pipeline (BASELINE config #4: [B,2,250,480]
diffraction + error matrix -> masked 2x-SR pattern) end-to-end on the
attached TPU chip and prints ONE JSON line.

The reference publishes no wall-clock numbers (SURVEY.md §6), so the baseline
is this framework's first recorded measurement (BASELINE_IPS below);
vs_baseline tracks speedups across rounds.
"""

import json
import time

import numpy as np

# images/sec/chip of the first recorded round-1 fp32 run on a v5e chip.
# Update only the comment when improving; keep the constant as the anchor.
BASELINE_IPS = 75.0

BATCH = 8
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.pipelines.inference import make_inference_fn

    model = SwinWNet(
        in_chans=1,
        error_matrix=True,
        embed_dim=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=5,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1e3, (BATCH, 2, 250, 480)), jnp.float32
    )
    variables = model.init(rng, x[:1])
    fn = make_inference_fn(model)

    # compile + warmup
    out = fn(variables, x)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(fn(variables, x))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "swinwnet_full_inference_throughput",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / BASELINE_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
