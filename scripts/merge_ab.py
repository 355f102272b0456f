"""A/B: fused PatchMerging/PatchExpanding Pallas kernels vs the inline XLA
module math (round-4 item: the ~60 ms merge/expand bucket of the round-3
device trace, plus the C-in-lanes padding tax on every BHWC round trip).

Races every site the published pipeline hits, B=64 bf16, with the bench.py
chained-iteration methodology (iterations chain through a scalar carried
back into the input so dispatch cannot overlap the timed region).

    python scripts/merge_ab.py           # TPU race at real shapes
    python scripts/merge_ab.py --check   # CPU interpret parity only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


MERGE_SITES = [(125, 240, 48), (63, 120, 96), (32, 60, 192)]
LN_SITES = [(125, 240, 48)]
EXPAND_SITES = [(16, 30, 384), (32, 60, 192), (63, 120, 96), (125, 240, 48), (250, 480, 24)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from swinwnet_tpu.models.layers import LayerNorm, PatchExpanding, PatchMerging
    from swinwnet_tpu.ops.pallas.merge_expand import (
        expand_supported,
        layernorm_pallas,
        ln_supported,
        merge_supported,
        patch_expand_pallas,
        patch_merge_pallas,
    )
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    interp = args.check
    B = 2 if args.check else args.batch
    iters = 2 if args.check else args.iters
    dt = jnp.float32 if args.check else jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"B={B} dtype={dt.__name__} device={jax.devices()[0].device_kind}")

    def timeit(fn, x):
        out = fn(x, jnp.float32(0.0))
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            out = fn(x, carry)
            carry = 0.0 * out[0, 0, 0, 0].astype(jnp.float32)
        _ = float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters

    # ln first (most likely to compile: no lane reshapes), merge last; a
    # Mosaic compile failure at one site must not kill the whole A/B
    for kind, sites in (
        ("ln", LN_SITES), ("expand", EXPAND_SITES), ("merge", MERGE_SITES)
    ):
        for H, W, C in sites:
            bb = B if H < 200 else max(1, B // 4)
            x = jnp.asarray(rng.normal(size=(bb, H, W, C)) * 0.1, dt)
            if kind == "merge":
                mod = PatchMerging(dim=C, dtype=dt)
                ok = merge_supported(H, W, C, jnp.dtype(dt).itemsize)
            elif kind == "expand":
                mod = PatchExpanding(dim=C, dtype=dt)
                ok = expand_supported(H, W, C, jnp.dtype(dt).itemsize)
            else:
                mod = LayerNorm(dtype=dt)
                ok = ln_supported(H, W, C, jnp.dtype(dt).itemsize)
            params = mod.init(jax.random.PRNGKey(0), x)
            pp = params["params"]

            @jax.jit
            def via_module(x, c):
                return mod.apply(params, x + c.astype(x.dtype))

            if kind == "ln":

                @jax.jit
                def via_kernel(x, c):
                    return layernorm_pallas(
                        x + c.astype(x.dtype), pp["scale"], pp["bias"], interp
                    )

            elif kind == "merge":

                @jax.jit
                def via_kernel(x, c):
                    return patch_merge_pallas(
                        x + c.astype(x.dtype),
                        pp["norm"]["scale"], pp["norm"]["bias"],
                        pp["reduction"]["kernel"], interp,
                    )

            else:

                @jax.jit
                def via_kernel(x, c):
                    return patch_expand_pallas(
                        x + c.astype(x.dtype),
                        pp["expand"]["kernel"],
                        pp["norm"]["scale"], pp["norm"]["bias"], interp,
                    )

            if args.check:
                a = np.asarray(via_module(x, jnp.float32(0)), np.float32)
                b = np.asarray(via_kernel(x, jnp.float32(0)), np.float32)
                err = float(np.max(np.abs(a - b)))
                print(f"  {kind} [{bb},{H},{W},{C}] parity max|d|={err:.2e}")
                assert err < 1e-4, (kind, H, W, C)
                continue
            if not ok:
                print(f"  {kind} [{bb},{H},{W},{C}] kernel unsupported; skipped")
                continue
            try:
                t_mod = timeit(via_module, x)
                t_ker = timeit(via_kernel, x)
            except Exception as e:  # Mosaic compile failures are per-site data
                msg = str(e).splitlines()[0][:120]
                print(f"  {kind} [{bb},{H},{W},{C}] FAILED: {msg}")
                continue
            print(
                f"  {kind} [{bb},{H},{W},{C}]: xla {t_mod*1e3:7.2f} ms  "
                f"kernel {t_ker*1e3:7.2f} ms  ({t_mod/t_ker:5.2f}x)"
            )


if __name__ == "__main__":
    main()
