"""Pallas relayout kernels: channels-major window partition / reverse.

Round-3 device traces price the XLA `copy` ops that implement
`window_partition_cmajor` / `window_reverse_cmajor` at ~128 ms of a 1526 ms
serving step (~27 ms at L0, ~73 ms at the SR2 level, B=64) — XLA executes the
lane-crossing [B,H,W,C] <-> [C, N, B*nW] permutation ~20-30x slower than copy
bandwidth. These kernels do the same permutation tile-by-tile in VMEM: each
grid step reads one (batch, window-row) slab, permutes it with in-register
shuffles, and writes the destination block — one HBM read + one write at
near-copy bandwidth.

Layout contract matches ops/window.py exactly:
  partition: x[b, hw*ws+i, ww*ws+j, c] -> out[c, i*ws+j, ((b*Hw)+hw)*Ww+ww]
  reverse  : the inverse.

Both require pre-padded inputs (H % ws == W % ws == 0) — callers in
models/layers.py pad/crop around them, mirroring what the XLA ops do
internally. Differentiable: the two permutations are each other's inverse,
so each one's VJP is literally the other kernel (exact, no recompute).

XLA fallbacks remain the default everywhere except the fused serving path
(models/layers.py BasicLayer; SWINWNET_RELAYOUT_KERNEL=0 restores XLA
for A/B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _partition_kernel(x_ref, o_ref, *, ws: int):
    # x_ref: [1, ws, Wp, C] (one batch row of windows); o_ref: [C, ws*ws, Ww]
    x = x_ref[0]  # [ws, Wp, C]
    C = x.shape[-1]
    Ww = x.shape[1] // ws
    x = x.reshape(ws, Ww, ws, C)
    x = x.transpose(3, 0, 2, 1)  # [C, ws, ws, Ww]
    o_ref[:] = x.reshape(C, ws * ws, Ww).astype(o_ref.dtype)


def _reverse_kernel(w_ref, o_ref, *, ws: int):
    # w_ref: [C, ws*ws, Ww]; o_ref: [1, ws, Wp, C]
    w = w_ref[:]
    C, N, Ww = w.shape
    w = w.reshape(C, ws, ws, Ww)
    w = w.transpose(1, 3, 2, 0)  # [ws, Ww, ws, C]
    o_ref[0] = w.reshape(ws, Ww * ws, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _partition_impl(x, ws: int, interpret: bool):
    B, Hp, Wp, C = x.shape
    Hw, Ww = Hp // ws, Wp // ws
    return pl.pallas_call(
        functools.partial(_partition_kernel, ws=ws),
        grid=(B, Hw),
        in_specs=[pl.BlockSpec((1, ws, Wp, C), lambda b, h: (b, h, 0, 0))],
        out_specs=pl.BlockSpec((C, ws * ws, Ww), lambda b, h: (0, 0, b * Hw + h)),
        out_shape=jax.ShapeDtypeStruct((C, ws * ws, B * Hw * Ww), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _reverse_impl(windows, ws: int, Hp: int, Wp: int, interpret: bool):
    C, N, BnW = windows.shape
    Hw, Ww = Hp // ws, Wp // ws
    B = BnW // (Hw * Ww)
    return pl.pallas_call(
        functools.partial(_reverse_kernel, ws=ws),
        grid=(B, Hw),
        in_specs=[pl.BlockSpec((C, N, Ww), lambda b, h: (0, 0, b * Hw + h))],
        out_specs=pl.BlockSpec((1, ws, Wp, C), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), windows.dtype),
        interpret=interpret,
    )(windows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _partition_vjp(x, ws: int, interpret: bool):
    return _partition_impl(x, ws, interpret)


def _partition_fwd(x, ws, interpret):
    return _partition_impl(x, ws, interpret), (x.shape[1], x.shape[2])


def _partition_bwd(ws, interpret, res, g):
    Hp, Wp = res
    return (_reverse_impl(g, ws, Hp, Wp, interpret),)


_partition_vjp.defvjp(_partition_fwd, _partition_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _reverse_vjp(windows, ws: int, Hp: int, Wp: int, interpret: bool):
    return _reverse_impl(windows, ws, Hp, Wp, interpret)


def _reverse_fwd(windows, ws, Hp, Wp, interpret):
    return _reverse_impl(windows, ws, Hp, Wp, interpret), None


def _reverse_bwd(ws, Hp, Wp, interpret, _res, g):
    return (_partition_impl(g, ws, interpret),)


_reverse_vjp.defvjp(_reverse_fwd, _reverse_bwd)


def window_partition_cmajor_pallas(x, window_size: int, interpret: bool = False):
    """[B, Hp, Wp, C] (pre-padded) -> [C, ws*ws, B*nW]."""
    assert x.shape[1] % window_size == 0 and x.shape[2] % window_size == 0, (
        "pallas relayout requires padded input"
    )
    return _partition_vjp(x, window_size, interpret)


def window_reverse_cmajor_pallas(
    windows, window_size: int, Hp: int, Wp: int, interpret: bool = False
):
    """[C, ws*ws, B*nW] -> [B, Hp, Wp, C] (inverse of the partition kernel)."""
    return _reverse_vjp(windows, window_size, Hp, Wp, interpret)
