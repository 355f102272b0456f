"""Throughput benchmark: full 8-stage SwinWNet inference, images/sec/chip.

Runs the flagship multimodal pipeline (BASELINE config #4: [B,2,250,480]
diffraction + error matrix -> masked 2x-SR pattern) end-to-end on the
attached TPU chip and prints ONE JSON line.

Serving mode: bfloat16 compute + chunked window attention (binarized masks
agree with fp32 on >99% of pixels — tests/test_modes.py; chunking is
numerically identical and bounds the live attention tensor so large batches
fit HBM). Set SWINWNET_BENCH_DTYPE=float32 for the parity-precision
configuration.

Timing methodology: iterations are serialized through a data dependency
(each step's input mixes in the previous output) and the loop ends with a
host fetch — `block_until_ready` alone under-reports on tunneled/experimental
PJRT backends.

The reference publishes no wall-clock numbers (SURVEY.md §6), so the baseline
is this framework's first recorded measurement (BASELINE_IPS below);
vs_baseline tracks speedups across rounds.
"""

import json
import os
import time

import numpy as np

# images/sec/chip of the first recorded round-1 fp32 run on a v5e chip
# (the anchor for vs_baseline across rounds — do not edit retroactively).
BASELINE_IPS = 11.2

BATCH = 64
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from swinwnet_tpu.models import SwinWNet
    from swinwnet_tpu.pipelines.inference import inference_stages
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    dtype = jnp.float32 if os.environ.get("SWINWNET_BENCH_DTYPE") == "float32" else jnp.bfloat16
    # use_pallas routes C>=48 windowed blocks through the fused wide-lane
    # Swin-block kernel (ops/pallas/swin_block.py); SWINWNET_BENCH_PALLAS=0
    # benches the pure-XLA bcast path instead.
    use_pallas = os.environ.get("SWINWNET_BENCH_PALLAS", "1") != "0"
    model = SwinWNet(
        in_chans=1,
        error_matrix=True,
        embed_dim=48,
        depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24),
        window_size=5,
        attn_chunk=8192,
        use_pallas=use_pallas,
        dtype=dtype,
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1e3, (BATCH, 2, 250, 480)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def step(variables, x):
        out = inference_stages(model, variables, x)["images_masked_hr"]
        # serialize successive iterations through a data dependency
        return x + 1e-12 * out[:, :, :250, :480].sum().astype(jnp.float32)

    # compile + warmup; pull XLA's own FLOP count for an MFU figure
    flops_per_img = None
    try:
        cost = step.lower(variables, x).compile().cost_analysis()
        if cost and cost.get("flops"):
            flops_per_img = float(cost["flops"]) / BATCH
    except Exception:  # cost analysis is best-effort on experimental backends
        pass
    y = step(variables, x)
    _ = float(y.sum())
    y = step(variables, x)
    _ = float(y.sum())

    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = step(variables, y)
    _ = float(y.sum())  # host fetch forces completion of the whole chain
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    rec = {
        "metric": "swinwnet_full_inference_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IPS, 3),
        "batch": BATCH,
        "dtype": "float32" if dtype == jnp.float32 else "bfloat16",
        "use_pallas": use_pallas,
    }
    if flops_per_img:
        rec["gflops_per_image"] = round(flops_per_img / 1e9, 1)
        # v5e bf16 peak ~197 TFLOP/s; fp32 (HIGHEST) ~1/4 of that
        peak = 197e12 if dtype != jnp.float32 else 49e12
        rec["mfu_pct"] = round(100.0 * flops_per_img * ips / peak, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
