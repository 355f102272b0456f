"""Pallas relayout kernels: channels-major window partition / reverse.

Round-3 device traces price the XLA `copy` ops that implement
`window_partition_cmajor` / `window_reverse_cmajor` at ~128 ms of a 1526 ms
serving step (~27 ms at L0, ~73 ms at the SR2 level, B=64) — XLA executes the
lane-crossing [B,H,W,C] <-> [C, N, B*nW] permutation ~20-30x slower than copy
bandwidth. These kernels do the same permutation tile-by-tile in VMEM: each
grid step reads a group of R window-rows and writes the permuted block — one
HBM read + one write.

Mosaic cannot shape-cast multi-dim vector merges in-register, so both ends
are expressed as FREE row-major XLA reshapes ([B,Hp,Wp,C] <->
[B*Hw, ws, Ww, ws, C] and [C,N,B*nW] <-> [C, ws, ws, B*Hw, Ww]) and the
kernel body is a single 5-D transpose. Block shapes keep the last two dims
equal to the full array dims (ws, C) on the spatial side and (R, Ww) with
R % 8 == 0 on the windows side, satisfying the Mosaic tiling rule.
`relayout_supported()` tells callers whether a geometry admits the grouping
(B*Hw % 8 == 0); models/layers.py falls back to the XLA transposes when it
does not (e.g. B=1 at the published geometry).

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
from jax.experimental.pallas import tpu as pltpu

# The blocks' trailing dims are intrinsically small (ws=5, Ww, or C), so the
# (8,128) VMEM tiles pad them hard: the worst pipeline geometries measure
# ~24M (C=96 levels) to ~36M (SR2, C=12: the [R,ws,Ww,ws,C] block pads C
# 12->128) of in-flight scoped VMEM, over Mosaic's 16M default. The v5e has
# 128M of VMEM; raise the cap instead of shrinking blocks — subdividing any
# axis here only increases the padded fraction (every candidate axis is
# already below one tile). Round-4 hardware failure: scoped alloc 23.82M at
# [16,40,80,96] (runs/relayout_ab_r04.txt).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _row_group(n_rows: int, interpret: bool = False) -> int | None:
    """Window-row group size R (block's second-to-last windows-side dim).

    Mosaic wants R % 8 == 0; interpret mode (CPU testing) has no tiling
    constraint, so any geometry runs with R=1 there."""
    if interpret:
        return 1
    return 8 if n_rows % 8 == 0 else None


def relayout_supported(B: int, Hp: int, Wp: int, ws: int) -> bool:
    """True when the padded geometry admits a Mosaic-legal blocking."""
    if Hp % ws or Wp % ws:
        return False
    return _row_group(B * (Hp // ws)) is not None


def _partition_kernel(x_ref, o_ref):
    # x_ref: [R, ws, Ww, ws, C] (R window-rows); o_ref: [C, ws, ws, R, Ww]
    o_ref[:] = x_ref[:].transpose(4, 1, 3, 0, 2).astype(o_ref.dtype)


def _reverse_kernel(w_ref, o_ref):
    # w_ref: [C, ws, ws, R, Ww]; o_ref: [R, ws, Ww, ws, C]
    o_ref[:] = w_ref[:].transpose(3, 1, 4, 2, 0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _partition_impl(x, ws: int, interpret: bool):
    B, Hp, Wp, C = x.shape
    Hw, Ww = Hp // ws, Wp // ws
    R = _row_group(B * Hw, interpret)
    if R is None:
        raise ValueError(
            f"relayout kernel unsupported at B={B} Hp={Hp} Wp={Wp} ws={ws}; "
            "gate callers on relayout_supported()"
        )
    xr = x.reshape(B * Hw, ws, Ww, ws, C)  # free row-major reshape
    out = pl.pallas_call(
        _partition_kernel,
        grid=((B * Hw) // R,),
        in_specs=[pl.BlockSpec((R, ws, Ww, ws, C), lambda g: (g, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((C, ws, ws, R, Ww), lambda g: (0, 0, 0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((C, ws, ws, B * Hw, Ww), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(xr)
    return out.reshape(C, ws * ws, B * Hw * Ww)  # free row-major merges


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _reverse_impl(windows, ws: int, Hp: int, Wp: int, interpret: bool):
    C, N, BnW = windows.shape
    Hw, Ww = Hp // ws, Wp // ws
    B = BnW // (Hw * Ww)
    R = _row_group(B * Hw, interpret)
    if R is None:
        raise ValueError(
            f"relayout kernel unsupported at B={B} Hp={Hp} Wp={Wp} ws={ws}; "
            "gate callers on relayout_supported()"
        )
    wr = windows.reshape(C, ws, ws, B * Hw, Ww)  # free row-major reshape
    out = pl.pallas_call(
        _reverse_kernel,
        grid=((B * Hw) // R,),
        in_specs=[pl.BlockSpec((C, ws, ws, R, Ww), lambda g: (0, 0, 0, g, 0))],
        out_specs=pl.BlockSpec((R, ws, Ww, ws, C), lambda g: (g, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Hw, ws, Ww, ws, C), windows.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(wr)
    return out.reshape(B, Hp, Wp, C)  # free row-major merges


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
