"""Sweep fused-kernel block/chunk parameters at the pipeline's hot shapes.

Times one fused Swin block per (level shape, block_windows, score_chunk)
configuration on the attached TPU with the bench.py chained-iteration
methodology, and prints a table per level. Drives the round-3 retune
levers (PERFORMANCE.md): SR1 BW/score_chunk, and the new C=192/384
row-major routing's BW.

Usage:  python scripts/tune_fused_blocks.py [B] [level ...]
        levels: L0 L1 L2 L3 SR1 SR2 (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from swinwnet_tpu.ops.pallas.swin_block import (
    fused_swin_block,
    fused_swin_block_cst,
)
from swinwnet_tpu.ops.window import window_partition, window_partition_cmajor

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ONLY = set(sys.argv[2:])
N = 25
ITERS = 10

# level name -> (H, W, C, nH, batch, layout, BW candidates, sc candidates)
LEVELS = {
    "L0": (125, 240, 48, 3, B, "cmajor", (128, 256), (8, 16)),
    "L1": (63, 120, 96, 6, B, "cmajor", (128, 256), (4, 8)),
    "L2": (32, 60, 192, 12, B, "rowmajor", (8, 16, 32), (0,)),
    "L3": (16, 30, 384, 24, B, "rowmajor", (4, 8, 16), (0,)),
    "SR1": (250, 480, 24, 3, B, "cmajor", (128, 256, 512), (2, 4, 8)),
    "SR2": (500, 960, 12, 3, min(B, 16), "cmajor", (128, 256, 512), (2, 4)),
    # rowmajor re-race at the cmajor levels (round 4; the round-4 in-kernel
    # packed-MXU variant these rows raced was deleted in round 5 — measured
    # loss standalone, illegal block shape in situ).
    "L0rm": (125, 240, 48, 3, B, "rowmajor", (16, 32, 64), (0,)),
    "L1rm": (63, 120, 96, 6, B, "rowmajor", (8, 16, 32), (0,)),
    "SR1rm": (250, 480, 24, 3, B, "rowmajor", (32, 64, 128), (0,)),
    "SR2rm": (500, 960, 12, 3, min(B, 16), "rowmajor", (64, 128), (0,)),
}


def timeit(fn, x):
    # completion barrier = on-device scalar reduce + 4-byte fetch; fetching
    # the raw output would bill a multi-100MB tunnel transfer to the loop
    # (the round-3 bench.py pitfall, PERFORMANCE.md). Iterations chain
    # through the output (ADVICE r03: independent re-runs let host dispatch
    # overlap and under-time fast configs relative to bench.py).
    out = fn(x)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(out)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / ITERS


def main():
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"B={B} device={jax.devices()[0].device_kind}")
    for name, (H, W, C, nH, bb, layout, bws, scs) in LEVELS.items():
        if ONLY and name not in ONLY:
            continue
        x = jnp.asarray(rng.standard_normal((bb, H, W, C)) * 0.1, jnp.bfloat16)
        args = {
            "ln1_s": jnp.ones((C,), jnp.float32),
            "ln1_b": jnp.zeros((C,), jnp.float32),
            "wqkv": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.bfloat16),
            "bqkv": jnp.zeros((3 * C,), jnp.float32),
            "rel_bias": jnp.asarray(rng.standard_normal((nH, N, N)) * 0.05, jnp.float32),
            "wproj": jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16),
            "bproj": jnp.zeros((C,), jnp.float32),
            "ln2_s": jnp.ones((C,), jnp.float32),
            "ln2_b": jnp.zeros((C,), jnp.float32),
            "w1": jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.05, jnp.bfloat16),
            "b1": jnp.zeros((4 * C,), jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((4 * C, C)) * 0.05, jnp.bfloat16),
            "b2": jnp.zeros((C,), jnp.float32),
        }
        print(f"\n== {name} [{bb},{H},{W},{C}] nH={nH} {layout} ==")
        if layout == "cmajor":
            xw, _ = window_partition_cmajor(x, 5)
            targs = dict(args)
            for k in ("wqkv", "w1", "w2"):
                targs[k] = jnp.swapaxes(args[k], 0, 1)
            for bw in bws:
                for sc in scs:
                    try:
                        fn = jax.jit(
                            lambda xx, bw=bw, sc=sc: fused_swin_block_cst(
                                xx, *targs.values(), num_heads=nH,
                                block_windows=bw, score_chunk=sc,
                            )
                        )
                        dt = timeit(fn, xw)
                        print(f"  BW={bw:4d} sc={sc:2d}: {dt*1e3:8.2f} ms ({bb/dt:8.1f} img/s)")
                    except Exception as e:
                        print(f"  BW={bw:4d} sc={sc:2d}: FAIL {type(e).__name__}: {str(e)[:120]}")
        else:
            xw, _ = window_partition(x, 5)
            x2 = xw.reshape(-1, C)
            mask = None
            if H % 5 or W % 5:
                from swinwnet_tpu.models.layers import _window_pad_mask_np

                m = _window_pad_mask_np(H, W, 5)
                mask = jnp.asarray(np.tile(m, (bb, 1, 1)).reshape(-1, 1))
            for bw in bws:
                try:
                    fn = jax.jit(
                        lambda xx, bw=bw: fused_swin_block(
                            xx, *args.values(), num_heads=nH, window_tokens=N,
                            pad_mask=mask, block_windows=bw,
                        )
                    )
                    dt = timeit(fn, x2)
                    print(f"  BW={bw:4d}: {dt*1e3:8.2f} ms ({bb/dt:8.1f} img/s)")
                except Exception as e:
                    print(f"  BW={bw:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
