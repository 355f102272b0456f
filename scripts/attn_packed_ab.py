"""A/B: window-packed MXU attention vs the shipped VPU bcast formulation.

VERDICT round-3 item 5: the one untried formulation — pack 5 windows
(125 tokens) per ~128-row MXU tile with a block-diagonal rel-pos bias/mask,
paying 5x redundant score FLOPs for ~full MXU occupancy (a lone 25x25 score
matmul fills 4% of a tile). Raced at the REAL pipeline shapes of the deep
XLA levels (C=192/384 — ~400 ms/step in the round-3 device trace) and the
fused-kernel levels (C<=96, for context vs the Pallas route).

    python scripts/attn_packed_ab.py            # TPU race
    python scripts/attn_packed_ab.py --check    # CPU equivalence only
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
    p.add_argument("--check", action="store_true", help="CPU equivalence only")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from swinwnet_tpu.models.layers import WindowAttention
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    # (level, C, nH, windows_per_image) at the published geometry, B=64;
    # window counts from the round-3 trace decomposition
    SITES = [
        ("L0 enc", 48, 3, 1200),
        ("L1 enc", 96, 6, 325),
        ("L2 enc", 192, 12, 84),
        ("L3 enc", 384, 24, 24),
    ]
    N = 25

    rng = np.random.default_rng(0)

    # ---- fp32 equivalence: packed == bcast (block-diagonal mask is exact)
    for name, C, nH, _w in SITES[:2]:
        x = jnp.asarray(rng.normal(size=(40, N, C)), jnp.float32)
        outs = {}
        for form in ("bcast", "packed"):
            mod = WindowAttention(dim=C, window_size=5, num_heads=nH, formulation=form)
            variables = mod.init(jax.random.PRNGKey(0), x)
            outs[form] = np.asarray(mod.apply(variables, x))
        np.testing.assert_allclose(outs["packed"], outs["bcast"], rtol=2e-4, atol=2e-5)
        print(f"equivalence OK at {name} (C={C})")
    if args.check:
        return

    # ---- TPU race at real shapes, bf16 (serving precision)
    dt = jnp.bfloat16
    print(f"\nB={args.batch} bf16, {args.iters} chained iters per config")
    print(f"{'site':8s} {'windows':>8s} " + " ".join(f"{f:>10s}" for f in ("bcast", "matmul", "packed")))
    for name, C, nH, wpi in SITES:
        Bw = args.batch * wpi
        x = jnp.asarray(rng.normal(size=(Bw, N, C)), jnp.float32)
        row = []
        for form in ("bcast", "matmul", "packed"):
            mod = WindowAttention(
                dim=C, window_size=5, num_heads=nH, formulation=form,
                attn_chunk=8192 if form == "bcast" else 0, dtype=dt,
            )
            variables = mod.init(jax.random.PRNGKey(0), x[:40])

            @jax.jit
            def step(v, xx, mod=mod):
                out = mod.apply(v, xx)
                return xx + 1e-12 * out.astype(jnp.float32).sum()

            y = step(variables, x)
            _ = float(y.sum())
            t0 = time.perf_counter()
            yy = step(variables, x)
            for _ in range(args.iters - 1):
                yy = step(variables, yy)
            _ = float(yy.sum())
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            row.append(ms)
        best = min(row)
        marks = ["<-- best" if r == best else "" for r in row]
        print(f"{name:8s} {Bw:8d} " + " ".join(f"{r:8.2f}ms" for r in row)
              + f"   packed/bcast = {row[2]/row[0]:.2f}x")


if __name__ == "__main__":
    main()
