"""Microbench: window-MSA formulations at the pipeline's real shapes.

The profile (PERFORMANCE.md round 2) shows per-window cost ~0.5-0.7us through
the XLA batched-matmul path — window count, not FLOPs, sets the pipeline's
wall clock. This script races candidate formulations:

  xla        einsum batched matmul over [Wt, nH, 25, 25] (round-1 unchunked)
  chunked    same under lax.map chunks of 8192 (round-1 shipped path)
  packG      G windows packed block-diagonally into one [G*25, G*25] score
             matrix with a static additive mask: 5x the score FLOPs but
             MXU-shaped (125 rows/cols ~ one lane tile)
  vpu        scores as broadcast-multiply-reduce (no batched matmul at all)
  pallas     fused kernel (fp32 only, current gate)

Usage: python scripts/attn_formulations.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

N = 25
ITERS = 5


def run(name, fn, args, iters=ITERS):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    out = jfn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    wt = args[0].shape[0]
    print(f"  {name:28s} {dt*1e3:8.2f} ms   {dt/wt*1e9:7.1f} ns/window")
    return out, dt


def attn_xla(q, k, v, bias):
    # q,k,v: [Wt, nH, N, hd]; bias [nH, N, N]
    attn = jnp.einsum("whnd,whmd->whnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn + bias[None], axis=-1).astype(q.dtype)
    return jnp.einsum("whnm,whmd->whnd", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)


def attn_chunked(q, k, v, bias, chunk=8192):
    Wt = q.shape[0]
    pad = (-Wt) % chunk
    if pad:
        q, k, v = (jnp.pad(t, ((0, pad), (0, 0), (0, 0), (0, 0))) for t in (q, k, v))
    shp = q.shape
    f = lambda t: t.reshape(-1, chunk, *shp[1:])
    out = jax.lax.map(lambda qkv: attn_xla(*qkv, bias), (f(q), f(k), f(v)))
    out = out.reshape(-1, *shp[1:])
    return out[:Wt] if pad else out


def attn_packG(q, k, v, bias, G=5):
    # pack G windows into one [G*N, G*N] score matrix, mask off-diagonal
    Wt, nH, _, hd = q.shape
    pad = (-Wt) % G
    if pad:
        q, k, v = (jnp.pad(t, ((0, pad), (0, 0), (0, 0), (0, 0))) for t in (q, k, v))
    Wp = q.shape[0]
    f = lambda t: t.transpose(0, 2, 1, 3).reshape(Wp // G, G * N, nH, hd).transpose(0, 2, 1, 3)
    qg, kg, vg = f(q), f(k), f(v)  # [Wp/G, nH, G*N, hd]
    attn = jnp.einsum("whnd,whmd->whnm", qg, kg, preferred_element_type=jnp.float32)
    # additive mask: -inf outside the G diagonal NxN blocks + tiled rel bias
    blk = np.kron(np.eye(G, dtype=np.float32), np.ones((N, N), np.float32))
    neg = jnp.asarray(np.where(blk > 0, 0.0, -1e9), jnp.float32)
    bias_g = jnp.tile(bias, (1, G, G)) * jnp.asarray(blk) + neg  # [nH, GN, GN]
    attn = jax.nn.softmax(attn + bias_g[None], axis=-1).astype(q.dtype)
    out = jnp.einsum("whnm,whmd->whnd", attn, vg, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(Wp, N, nH, hd).transpose(0, 2, 1, 3)
    return out[:Wt].astype(q.dtype) if pad else out.astype(q.dtype)


def attn_packG_chunked(q, k, v, bias, G=5, chunk=8192):
    Wt = q.shape[0]
    pad = (-Wt) % chunk
    if pad:
        q, k, v = (jnp.pad(t, ((0, pad), (0, 0), (0, 0), (0, 0))) for t in (q, k, v))
    shp = q.shape
    f = lambda t: t.reshape(-1, chunk, *shp[1:])
    out = jax.lax.map(lambda qkv: attn_packG(*qkv, bias, G=G), (f(q), f(k), f(v)))
    out = out.reshape(-1, *shp[1:])
    return out[:Wt] if pad else out


def attn_vpu(q, k, v, bias):
    # scores via broadcast multiply + reduce: no batched matmul
    attn = jnp.sum(q[:, :, :, None, :] * k[:, :, None, :, :], axis=-1,
                   dtype=jnp.float32)  # [Wt, nH, N, N]
    attn = jax.nn.softmax(attn + bias[None], axis=-1).astype(q.dtype)
    out = jnp.sum(attn[:, :, :, :, None].astype(jnp.float32) *
                  v[:, :, None, :, :].astype(jnp.float32), axis=3)
    return out.astype(q.dtype)


def main():
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0].device_kind}")
    for (Wt, C, nH, label) in [
        (76800, 48, 3, "L0 enc  B=64 (76.8k windows, C=48)"),
        (307200, 24, 3, "SRhead1 B=64 (307k windows, C=24)"),
        (1228800, 12, 3, "SRhead2 B=64 (1.23M windows, C=12)"),
        (1536, 384, 24, "L3 enc  B=64 (1.5k windows, C=384)"),
    ]:
        hd = C // nH
        print(f"{label}: hd={hd}")
        q = jnp.asarray(rng.standard_normal((Wt, nH, N, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((Wt, nH, N, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((Wt, nH, N, hd)), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((nH, N, N)), jnp.float32)

        ref, _ = run("xla-chunked (shipped)", attn_chunked, (q, k, v, bias))
        for name, fn in [
            ("packG5-chunked", functools.partial(attn_packG_chunked, G=5)),
            ("packG10-chunked", functools.partial(attn_packG_chunked, G=10, chunk=8190)),
            ("vpu-bcast", attn_vpu),
        ]:
            try:
                out, _ = run(name, fn, (q, k, v, bias))
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"      max|err| vs shipped = {err:.2e}")
            except Exception as e:  # noqa
                print(f"  {name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        if Wt <= 100000:
            try:
                run("xla-unchunked", attn_xla, (q, k, v, bias))
            except Exception as e:  # noqa
                print(f"  xla-unchunked FAILED: {str(e)[:100]}")


if __name__ == "__main__":
    main()
