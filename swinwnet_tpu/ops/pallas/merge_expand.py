"""Pallas kernels for PatchMerging / PatchExpanding (round 4).

The round-3 device trace prices the BHWC merge/expand glue at ~60 ms of a
1526 ms serving step (PatchMerging 13.6 + 9.7 ms, PatchExpanding 23.9 +
13.1 ms at B=64) — XLA materializes the 2x2 strided slices / pixel-shuffle
through HBM with the C-in-lanes padding tax (C=12..96 padded to 128 lanes,
1.3-10.7x extra bytes per round trip). Each kernel here runs the WHOLE
module (neighbor-concat/LN/reduction, resp. expansion/pixel-shuffle/LN —
reference semantics SwinWNet.py:282-316 and :390-412) in one VMEM pass:
one HBM read of x, one write of the result.

Layout strategy (what makes this Mosaic-friendly):

* Blocks keep the FULL H axis and tile W: [1, H, WBLK, C]. H is a leading
  (untiled) axis, so the 2x2 row pairing is a free leading-axis reshape
  ([H, ...] -> [H//2, 2, ...]) and odd H is a static trace-time special
  case — no input padding, no masks, no program-id arithmetic.
* The column pairing is stride-2 SUBLANE slices + a lane concat (round-5
  rework: the row-major reshape [W, C] == [W//2, 2*C] this kernel first
  used is rejected by hardware Mosaic — infer-vector-layout "unsupported
  shape cast" at the pipeline channel widths, runs/merge_ab_r05.txt —
  while strided sublane access lowers).
* The resulting channel order is [x(0,0), x(0,1), x(1,0), x(1,1)] while the
  reference concatenates [x0, x1, x2, x3] = [(0,0), (1,0), (0,1), (1,1)].
  LayerNorm statistics are order-invariant, so the wrappers PERMUTE the LN
  scale/bias and reduction-weight rows at trace time instead of shuffling
  data in the kernel.
* Pixel-shuffle in expand: out[2h+p, 2w+r] reads the lane slice
  xe[..., p*C + r*C/2 :+ C/2]; the row interleave is a leading-axis
  stack+merge and the column interleave a stride-2 sublane store.

Differentiable via the same custom-VJP recompute pattern as
`fused_block_autodiff`: the primal is the kernel, the backward re-derives
through plain-XLA module math (exact same semantics, fp32 recompute).

Default OFF (`SWINWNET_MERGE_KERNEL=1` to enable) until the hardware A/B
(scripts/merge_ab.py) measures a win; interpret mode covers CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 10 * 1024 * 1024
# output rows processed per in-kernel H-chunk iteration: bounds the fp32
# working set independently of H (the I/O blocks stay in the x dtype)
_H_CHUNK = 8


def _lanes(c: int) -> int:
    return max(128, -(-c // 128) * 128)


def _pick_merge_wblk(H: int, W: int, C: int, itemsize: int = 4) -> int | None:
    """Merge W tile: a divisor of W that keeps the VMEM footprint (x/out
    blocks, double-buffered, plus the fp32 per-H-chunk working set) under
    budget. The merge block keeps the FULL H axis (row pairing + the odd-H
    tail are then block-local). WBLK % 16 == 0 (out sublane block = WBLK//2
    multiple of 8); the full-W block is always shape-legal."""
    cands = [w for w in (96, 64, 48, 32, 16) if W % w == 0] + [W]
    for wblk in cands:
        io = 2 * itemsize * H * wblk * _lanes(C)  # in block, double-buffered
        io += 2 * itemsize * ((H + 1) // 2) * (wblk // 2) * _lanes(2 * C)
        chunk = 4 * 2 * _H_CHUNK * wblk * _lanes(C)
        chunk += 4 * _H_CHUNK * (wblk // 2) * (3 * _lanes(2 * C) + 2 * _lanes(4 * C))
        if io + chunk <= _VMEM_LIMIT:
            return wblk
    return None


def _pick_expand_blk(H: int, W: int, C: int, itemsize: int = 4):
    """Expand (H, W) tile. Expansion is 1->2 rows/cols block-locally, so
    both spatial axes tile freely by any divisor; pick the smallest H
    divisor >= 8 and the largest W divisor that fits VMEM."""
    hblk = next((h for h in range(8, H) if H % h == 0), H)
    cands = [w for w in (192, 96, 64, 48, 32, 16, 8) if W % w == 0] + [W]
    for wblk in cands:
        io = 2 * itemsize * hblk * wblk * _lanes(C)
        io += 2 * itemsize * 2 * hblk * 2 * wblk * _lanes(C // 2)
        hc = min(_H_CHUNK, hblk)
        chunk = 4 * hc * wblk * (_lanes(C) + 3 * _lanes(2 * C))
        chunk += 4 * hc * 2 * wblk * 3 * _lanes(C // 2)
        if io + chunk <= _VMEM_LIMIT:
            return hblk, wblk
    return None


def merge_supported(H: int, W: int, C: int, itemsize: int = 4) -> bool:
    """True when [*, H, W, C] admits a legal merge-kernel blocking."""
    return (
        W % 2 == 0 and W >= 4 and H >= 2
        and _pick_merge_wblk(H, W, C, itemsize) is not None
    )


def expand_supported(H: int, W: int, C: int, itemsize: int = 4) -> bool:
    """True when [*, H, W, C] admits a legal expand-kernel blocking."""
    return C % 2 == 0 and _pick_expand_blk(H, W, C, itemsize) is not None


def _ln_lane(v32, scale, bias, eps=1e-5):
    """fp32 LayerNorm over the minor (lane) axis; scale/bias pre-shaped
    [1, 1, C] (Mosaic cannot shape-cast vector<C> -> vector<..xC>)."""
    mean = jnp.mean(v32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(v32 - mean), axis=-1, keepdims=True)
    return (v32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mm_lane(v, w, cdt):
    """[A, B, K] . [K, F] -> [A, B, F] fp32, contracting the minor axis;
    operands cast to the compute dtype (bf16 serving / fp32 training)."""
    return jax.lax.dot_general(
        v.astype(cdt), w.astype(cdt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _merge_kernel(x_ref, ln_s_ref, ln_b_ref, w_ref, o_ref):
    """One W-tile of PatchMerging: x [1, H, WBLK, C] -> [1, H2, WBLK//2, 2C].

    Channel order of the 4-tap concat is [x(0,0), x(0,1), x(1,0), x(1,1)];
    ln_s/ln_b/w arrive row-permuted to match (see wrapper). The H axis is
    processed in static leading-axis chunks so the fp32 working set stays
    bounded for any geometry."""
    _, H, WBLK, C = x_ref.shape
    H2 = (H + 1) // 2
    cdt = x_ref.dtype
    for h0 in range(0, H2, _H_CHUNK):
        hc = min(_H_CHUNK, H2 - h0)  # output rows this chunk
        rows = min(2 * hc, H - 2 * h0)  # input rows available (odd-H tail)
        x32 = x_ref[0, 2 * h0 : 2 * h0 + rows].astype(jnp.float32)
        he = rows - (rows % 2)
        xp = x32[:he].reshape(he // 2, 2, WBLK, C)  # free leading split
        a, b = xp[:, 0], xp[:, 1]
        if rows % 2:
            # odd H: reference zero-pads one row; the tail pair is (x[H-1], 0)
            a = jnp.concatenate([a, x32[he:]], axis=0)
            b = jnp.concatenate([b, jnp.zeros((1, WBLK, C), jnp.float32)], axis=0)
        # column pairing via stride-2 sublane slices + lane concat. (The
        # row-major reshape [W, C] -> [W//2, 2C] is rejected by hardware
        # Mosaic — infer-vector-layout "unsupported shape cast" at C=48,
        # runs/merge_ab_r05.txt — but produces the same channel order.)
        cat = jnp.concatenate(
            [a[:, 0::2], a[:, 1::2], b[:, 0::2], b[:, 1::2]], axis=-1
        )  # [hc, WBLK//2, 4C]
        y = _ln_lane(cat, ln_s_ref[0], ln_b_ref[0])
        out = _mm_lane(y, w_ref[:], cdt)  # [hc, WBLK//2, 2C] fp32
        o_ref[0, h0 : h0 + hc] = out.astype(o_ref.dtype)


def _expand_kernel(x_ref, w_ref, ln_s_ref, ln_b_ref, o_ref):
    """One W-tile of PatchExpanding: x [1, H, WBLK, C] -> [1, 2H, 2*WBLK, C//2]."""
    _, H, WBLK, C = x_ref.shape
    C2 = C // 2
    cdt = x_ref.dtype
    for h0 in range(0, H, _H_CHUNK):
        hc = min(_H_CHUNK, H - h0)
        xe = _mm_lane(x_ref[0, h0 : h0 + hc], w_ref[:], cdt)  # [hc, WBLK, 2C] f32
        # reference LN sees the Dense output rounded to the compute dtype
        xe = xe.astype(cdt).astype(jnp.float32)
        # pixel shuffle: out[2h+p, 2w+r] <- xe[h, w, p*C + r*C2 :+ C2]. The
        # row interleave is a free leading-axis stack+merge; the column
        # interleave is a stride-2 sublane STORE (the row-major lane-split
        # reshape [W, C] -> [2W, C//2] is Mosaic-illegal on hardware, same
        # class as the merge kernel's failure).
        for r in (0, 1):
            q = jnp.concatenate(
                [
                    _ln_lane(
                        xe[:, :, p * C + r * C2 : p * C + (r + 1) * C2],
                        ln_s_ref[0], ln_b_ref[0],
                    )[:, None]
                    for p in (0, 1)
                ],
                axis=1,
            ).reshape(2 * hc, WBLK, C2)
            o_ref[0, 2 * h0 : 2 * (h0 + hc), r::2] = q.astype(o_ref.dtype)


def _merge_perm(C: int) -> np.ndarray:
    """kernel channel m -> reference channel: [x0, x2, x1, x3] vs the
    reference concat order [x0, x1, x2, x3] (SwinWNet.py:282-316)."""
    r = np.arange(C)
    return np.concatenate([r, 2 * C + r, C + r, 3 * C + r])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _merge_impl(x, ln_s, ln_b, w_red, interpret: bool = False):
    B, H, W, C = x.shape
    assert W % 2 == 0, "merge kernel requires even W (gate on merge_supported)"
    H2 = (H + 1) // 2
    # unsupported geometries only reach here in interpret mode (no VMEM
    # limit there); hardware callers gate on merge_supported()
    wblk = _pick_merge_wblk(H, W, C, x.dtype.itemsize) or W
    perm = _merge_perm(C)
    ln_s_k = ln_s[perm].reshape(1, 1, 4 * C).astype(jnp.float32)
    ln_b_k = ln_b[perm].reshape(1, 1, 4 * C).astype(jnp.float32)
    w_k = w_red[perm, :].astype(x.dtype)
    full = lambda shape: pl.BlockSpec(shape, lambda b, g: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _merge_kernel,
        grid=(B, W // wblk),
        in_specs=[
            pl.BlockSpec((1, H, wblk, C), lambda b, g: (b, 0, g, 0), memory_space=pltpu.VMEM),
            full((1, 1, 4 * C)),
            full((1, 1, 4 * C)),
            full((4 * C, 2 * C)),
        ],
        out_specs=pl.BlockSpec(
            (1, H2, wblk // 2, 2 * C), lambda b, g: (b, 0, g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H2, W // 2, 2 * C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H2 * (W // 2) * 4 * C * 2 * C,
            bytes_accessed=(B * H * W * C + B * H2 * (W // 2) * 2 * C) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ln_s_k, ln_b_k, w_k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _expand_impl(x, w_exp, ln_s, ln_b, interpret: bool = False):
    B, H, W, C = x.shape
    C2 = C // 2
    hblk, wblk = _pick_expand_blk(H, W, C, x.dtype.itemsize) or (H, W)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, h, g: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _expand_kernel,
        grid=(B, H // hblk, W // wblk),
        in_specs=[
            pl.BlockSpec((1, hblk, wblk, C), lambda b, h, g: (b, h, g, 0), memory_space=pltpu.VMEM),
            full((C, 2 * C)),
            full((1, 1, C2)),
            full((1, 1, C2)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * hblk, 2 * wblk, C2), lambda b, h, g: (b, h, g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C2), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * 2 * C,
            bytes_accessed=(B * H * W * C + B * 4 * H * W * C2) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x,
        w_exp.astype(x.dtype),
        ln_s.reshape(1, 1, C2).astype(jnp.float32),
        ln_b.reshape(1, 1, C2).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# XLA recompute functions (module math, used by the custom-VJP backward)
# ---------------------------------------------------------------------------


def _merge_xla(x, ln_s, ln_b, w_red):
    """Reference PatchMerging math (SwinWNet.py:282-316) in x.dtype."""
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    cat = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )
    c32 = cat.astype(jnp.float32)
    mean = jnp.mean(c32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(c32 - mean), axis=-1, keepdims=True)
    y = ((c32 - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b).astype(x.dtype)
    return jnp.dot(y, w_red.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


def _expand_xla(x, w_exp, ln_s, ln_b):
    """Reference PatchExpanding math (SwinWNet.py:390-412) in x.dtype."""
    B, H, W, C = x.shape
    xe = jnp.dot(x, w_exp.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    xe = xe.reshape(B, H, W, 2, 2, C // 2).transpose(0, 1, 3, 2, 4, 5)
    xe = xe.reshape(B, 2 * H, 2 * W, C // 2)
    x32 = xe.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b).astype(x.dtype)


# ---------------------------------------------------------------------------
# Differentiable entry points (fused primal, XLA-recompute backward)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def patch_merge_pallas(x, ln_s, ln_b, w_red, interpret: bool = False):
    """[B, H, W, C] -> [B, ceil(H/2), W/2, 2C]: the whole PatchMerging module
    as one Pallas kernel. Weights in reference layout (LN over the
    [x0,x1,x2,x3] concat; w_red [4C, 2C])."""
    return _merge_impl(x, ln_s, ln_b, w_red, interpret)


def _merge_fwd(x, ln_s, ln_b, w_red, interpret):
    return _merge_impl(x, ln_s, ln_b, w_red, interpret), (x, ln_s, ln_b, w_red)


def _merge_bwd(interpret, res, g):
    x, ln_s, ln_b, w_red = res
    _, vjp = jax.vjp(_merge_xla, x, ln_s, ln_b, w_red)
    gx, gs, gb, gw = vjp(g)
    return gx.astype(x.dtype), gs.astype(ln_s.dtype), gb.astype(ln_b.dtype), gw.astype(w_red.dtype)


patch_merge_pallas.defvjp(_merge_fwd, _merge_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def patch_expand_pallas(x, w_exp, ln_s, ln_b, interpret: bool = False):
    """[B, H, W, C] -> [B, 2H, 2W, C/2]: the whole PatchExpanding module as
    one Pallas kernel. Weights in reference layout (w_exp [C, 2C]; LN over
    the shuffled C/2)."""
    return _expand_impl(x, w_exp, ln_s, ln_b, interpret)


def _expand_fwd(x, w_exp, ln_s, ln_b, interpret):
    return _expand_impl(x, w_exp, ln_s, ln_b, interpret), (x, w_exp, ln_s, ln_b)


def _expand_bwd(interpret, res, g):
    x, w_exp, ln_s, ln_b = res
    _, vjp = jax.vjp(_expand_xla, x, w_exp, ln_s, ln_b)
    gx, gw, gs, gb = vjp(g)
    return gx.astype(x.dtype), gw.astype(w_exp.dtype), gs.astype(ln_s.dtype), gb.astype(ln_b.dtype)


patch_expand_pallas.defvjp(_expand_fwd, _expand_bwd)


# ---------------------------------------------------------------------------
# Standalone BHWC LayerNorm kernel (the third glue bucket: the round-3
# profile prices the free-standing post-embed LN at [B,125,240,48] at
# ~13.7 ms — XLA materializes the fp32 upcast + multi-pass reduction through
# HBM. One read + one write here.)
# ---------------------------------------------------------------------------


def _ln_kernel(x_ref, s_ref, b_ref, o_ref):
    o_ref[0] = _ln_lane(
        x_ref[0].astype(jnp.float32), s_ref[0], b_ref[0]
    ).astype(o_ref.dtype)


def ln_supported(H: int, W: int, C: int, itemsize: int = 4) -> bool:
    """True when [*, H, W, C] admits a legal LN-kernel blocking."""
    hblk = next((h for h in range(8, H) if H % h == 0), H)
    return (2 * itemsize + 2 * 4) * hblk * W * _lanes(C) <= _VMEM_LIMIT


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_impl(x, scale, bias, interpret: bool = False):
    B, H, W, C = x.shape
    hblk = next((h for h in range(8, H) if H % h == 0), H)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, h: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _ln_kernel,
        grid=(B, H // hblk),
        in_specs=[
            pl.BlockSpec((1, hblk, W, C), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            full((1, 1, C)),
            full((1, 1, C)),
        ],
        out_specs=pl.BlockSpec((1, hblk, W, C), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * W * C,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x,
        scale.reshape(1, 1, C).astype(jnp.float32),
        bias.reshape(1, 1, C).astype(jnp.float32),
    )


def _ln_xla(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm_pallas(x, scale, bias, interpret: bool = False):
    """[B, H, W, C] channel LayerNorm (torch eps, fp32 stats) as one Pallas
    kernel; semantics identical to models.layers.LayerNorm."""
    return _ln_impl(x, scale, bias, interpret)


def _ln_fwd(x, scale, bias, interpret):
    return _ln_impl(x, scale, bias, interpret), (x, scale, bias)


def _ln_bwd(interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(_ln_xla, x, scale, bias)
    gx, gs, gb = vjp(g)
    return gx.astype(x.dtype), gs.astype(scale.dtype), gb.astype(bias.dtype)


layernorm_pallas.defvjp(_ln_fwd, _ln_bwd)
