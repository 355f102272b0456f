"""A/B: Pallas relayout kernels vs XLA transposes for the cmajor window
partition/reverse (round-4 item: the ~128 ms `copy` bucket in the round-3
device trace).

    python scripts/relayout_ab.py           # TPU race at real shapes
    python scripts/relayout_ab.py --check   # CPU interpret-mode parity only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from swinwnet_tpu.ops.pallas.relayout import (
        window_partition_cmajor_pallas,
        window_reverse_cmajor_pallas,
    )
    from swinwnet_tpu.ops.window import window_partition_cmajor, window_reverse_cmajor
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    ws = 5
    rng = np.random.default_rng(0)

    # parity at a padded and at every pipeline-relevant channel width; on
    # hardware, only geometries admitting a Mosaic-legal row grouping run
    # (interpret mode relaxes to R=1), so include hardware-friendly shapes
    from swinwnet_tpu.ops.pallas.relayout import relayout_supported

    for B, H, W, C in (
        (2, 10, 15, 12),
        (2, 25, 30, 48),
        (1, 20, 20, 96),
        (16, 20, 40, 12),
        (16, 40, 80, 96),
    ):
        if not args.check and not relayout_supported(B, H, W, ws):
            print(f"skip [{B},{H},{W},{C}] (no legal row grouping on hardware)")
            continue
        # hardware parity runs in bf16 (the serving dtype; the kernel is
        # pure data movement so equality is exact either way) — f32 blocks
        # at C=96 exceed the 16M scoped-VMEM limit via lane padding
        dt = jnp.float32 if args.check else jnp.bfloat16
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), dt)
        want, (Hp, Wp) = window_partition_cmajor(x, ws)
        got = window_partition_cmajor_pallas(x, ws, interpret=args.check)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)
        back = window_reverse_cmajor_pallas(got, ws, Hp, Wp, interpret=args.check)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=0, atol=0)
        print(f"parity OK at [{B},{H},{W},{C}]")
    if args.check:
        return

    # race at the real serving shapes (B=64 bf16; SR2 uses its real B=64)
    SITES = (
        ("L0 ", 64, 125, 240, 48),
        ("SR1", 64, 250, 480, 24),
        ("SR2", 64, 500, 960, 12),
        ("L1 ", 64, 65, 120, 96),
    )
    print(f"\n{args.iters} chained iters, bf16; times are partition+reverse round trips")
    for name, B, H, W, C in SITES:
        Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
        x = jnp.asarray(rng.normal(size=(B, Hp, Wp, C)), jnp.bfloat16)

        @jax.jit
        def xla_rt(x):
            w, _ = window_partition_cmajor(x, ws)
            return window_reverse_cmajor(w, ws, Hp, Wp) + jnp.asarray(1e-6, x.dtype)

        @jax.jit
        def pallas_rt(x):
            w = window_partition_cmajor_pallas(x, ws)
            return window_reverse_cmajor_pallas(w, ws, Hp, Wp) + jnp.asarray(1e-6, x.dtype)

        row = []
        for fn in (xla_rt, pallas_rt):
            y = fn(x)
            _ = float(y.astype(jnp.float32).sum())
            t0 = time.perf_counter()
            yy = fn(x)
            for _ in range(args.iters - 1):
                yy = fn(yy)
            _ = float(yy.astype(jnp.float32).sum())
            row.append((time.perf_counter() - t0) / args.iters * 1e3)
        gb = x.size * 2 * 4 / 1e9  # 2 bytes, 4 HBM crossings per round trip
        print(
            f"{name} [{B},{Hp},{Wp},{C}]: xla {row[0]:7.2f} ms  pallas {row[1]:7.2f} ms  "
            f"({row[0]/row[1]:.2f}x; pallas at {gb/ (row[1]/1e3):.0f} GB/s effective)"
        )


if __name__ == "__main__":
    main()
