"""Fused whole-Swin-block Pallas TPU kernel.

Round-2 profile (PERFORMANCE.md): the pipeline is HBM-bound — every
inter-op tensor at the hot levels carries C ∈ {12, 24, 48} in the minor
(lane) dim and is padded to the 128-lane tile, so XLA's op-by-op execution
moves 2.7-10.7x more HBM bytes than the math needs, across ~10 materialized
intermediates per block (LN, qkv, scores, softmax, attn-out, proj, residual,
LN2, MLP hidden, MLP out).

This kernel runs ONE ENTIRE SwinTransformerBlock (reference semantics:
SwinWNet.py:211-280 with shift 0, the only shift the shipped checkpoints
use — SwinWNet.py:328) per `pallas_call` grid step, VMEM-resident:

    x -> LN1 -> qkv -> per-window MSA(+rel-pos bias) -> proj -> +residual
      -> LN2 -> fc1 -> GELU(exact) -> fc2 -> +residual -> out

reading each activation block from HBM once and writing once.

Design notes (what round 1's kernel taught us — PERFORMANCE.md round-1
status):

* Activations are 2-D `[Wt*N, C]` token-major end to end. Every reshape
  that reconstructs window structure ([BW*N, hd] -> [BW, N, hd]) happens on
  **fp32** arrays — the bf16 (16, 128)-tiled relayouts that broke round 1's
  in-kernel reshapes never occur; bf16 tensors only ever feed 2-D matmuls.
* Per-head score/value contractions accumulate over **hd16 lane chunks**, so
  a 32-wide head (the decoder levels) is two 16-wide contractions — the
  Mosaic hd=32 lane-slice miscompile path is never taken.
* Matmul precision mirrors the XLA serving path: bf16 operands with fp32
  accumulation (`preferred_element_type`); LN statistics, softmax, and both
  residual adds in fp32.

The kernel covers deterministic, unshifted, unpadded-grid blocks (mask-free
attention, zero dropout) — exactly the serving configuration; other configs
fall back to the XLA formulations in models/layers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# hd chunk for score/value contractions: lane-slice width that Mosaic
# compiles correctly (round-1 validated hd <= 16; wider heads accumulate).
_HD_CHUNK = 16


def _erf32(x):
    """erf for fp32 inputs, Abramowitz & Stegun 7.1.26 (|eps| <= 1.5e-7 —
    fp32-exact for GELU). Mosaic lowers exp but not erf/erfc, so the
    torch-exact GELU is built from this inside the kernel."""
    sgn = jnp.where(x >= 0.0, 1.0, -1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sgn * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(x32, scale, bias, eps=1e-5):
    """fp32 LayerNorm over the minor axis (torch eps)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_kernel(
    x_ref,
    ln1_s_ref,
    ln1_b_ref,
    wqkv_ref,
    bqkv_ref,
    bias_ref,
    wproj_ref,
    bproj_ref,
    ln2_s_ref,
    ln2_b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    *rest,
    num_heads: int,
    window_tokens: int,
    block_windows: int,
    has_mask: bool,
    mlp_hidden_chunk: int = 0,
):
    if has_mask:
        mask_ref, o_ref = rest
    else:
        (o_ref,) = rest
    N = window_tokens
    BW = block_windows
    R = BW * N
    C = x_ref.shape[-1]
    nH = num_heads
    hd = C // nH
    scale = hd**-0.5
    cdt = x_ref.dtype  # compute dtype for MXU operands (bf16 in serving)

    x32 = x_ref[:].astype(jnp.float32)  # [R, C] residual trunk

    # ---- LN1 -> qkv ----
    y = _ln(x32, ln1_s_ref[:], ln1_b_ref[:])
    if has_mask:
        # zero pad token slots post-LN (reference pad-after-norm semantics,
        # SwinWNet.py:243-253): pad rows feed bias-only q/k/v, exactly like
        # the unfused windowed path on non-tiling grids
        y = y * mask_ref[:]
    qkv = jnp.dot(y.astype(cdt), wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]  # [R, 3C] fp32

    # ---- per-window MSA, heads unrolled, hd in <=16 chunks ----
    # Each head-chunk's output is folded straight into the out-projection
    # (proj += oh_chunk @ wproj[rows]) so no [R, C] attention output or
    # per-head padded buffers stay live — the VMEM peak is one head's
    # transient score/value tensors, reused across iterations.
    proj = None
    for h in range(nH):
        # scores[w, n, m] = scale * sum_d q[w,n,d] k[w,m,d], accumulated over
        # hd16 chunks; every reshape below is on fp32 arrays.
        attn = None
        for d0 in range(0, hd, _HD_CHUNK):
            dw = min(_HD_CHUNK, hd - d0)
            qh = qkv[:, h * hd + d0 : h * hd + d0 + dw].reshape(BW, N, dw)
            kh = qkv[:, C + h * hd + d0 : C + h * hd + d0 + dw].reshape(BW, N, dw)
            part = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )  # [BW, N, N]
            attn = part if attn is None else attn + part
        attn = attn * scale + bias_ref[h][None]
        attn = jax.nn.softmax(attn, axis=-1)  # fp32

        for d0 in range(0, hd, _HD_CHUNK):
            dw = min(_HD_CHUNK, hd - d0)
            vh = qkv[:, 2 * C + h * hd + d0 : 2 * C + h * hd + d0 + dw].reshape(BW, N, dw)
            oh = jax.lax.dot_general(
                attn, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )  # [BW, N, dw]
            part = jnp.dot(
                oh.reshape(R, dw).astype(cdt),
                wproj_ref[h * hd + d0 : h * hd + d0 + dw, :],
                preferred_element_type=jnp.float32,
            )  # [R, C]
            proj = part if proj is None else proj + part

    # ---- residual ----
    x32 = x32 + proj + bproj_ref[:]

    # ---- LN2 -> MLP -> residual ----
    y2 = _ln(x32, ln2_s_ref[:], ln2_b_ref[:])
    H = w1_ref.shape[1]
    hchunk = mlp_hidden_chunk or H
    y2c = y2.astype(cdt)
    mlp = None
    # optional hidden-dim chunking bounds the live fp32 [R, hchunk] hidden
    # buffer (wide-C levels); chunks are static lane slices of the weights
    for h0 in range(0, H, hchunk):
        hw = min(hchunk, H - h0)
        hmid = jnp.dot(
            y2c, w1_ref[:, h0 : h0 + hw], preferred_element_type=jnp.float32
        )
        hmid = hmid + b1_ref[h0 : h0 + hw]
        # torch-exact erf GELU (see _erf32)
        hmid = 0.5 * hmid * (1.0 + _erf32(hmid * jnp.float32(0.7071067811865476)))
        part = jnp.dot(
            hmid.astype(cdt), w2_ref[h0 : h0 + hw, :], preferred_element_type=jnp.float32
        )
        mlp = part if mlp is None else mlp + part
    x32 = x32 + mlp + b2_ref[:]

    o_ref[:] = x32.astype(o_ref.dtype)


def _pick_block_windows(C: int, N: int, mlp_hidden: int) -> int:
    """Windows per grid step, sized so the scoped-VMEM peak (x32 + qkv +
    proj accum + MLP hidden, all fp32 lane-padded to 128, plus per-head
    transients and bf16 I/O double buffers) stays well under the 16 MB
    scoped limit."""

    def pad(c):
        return max(128, -(-c // 128) * 128)

    for bw in (256, 128, 64, 32, 16, 8):
        rows = bw * N
        live = 4 * rows * (2 * pad(C) + pad(3 * C) + pad(mlp_hidden))
        live += 4 * bw * 32 * 128 * 4  # per-head q/k/v/score transients
        live += 2 * rows * pad(C) * 4  # bf16 in/out double buffers
        if live <= 7 * 1024 * 1024:
            return bw
    return 4


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window_tokens", "block_windows", "interpret"),
)
def fused_swin_block(
    x,
    ln1_s,
    ln1_b,
    wqkv,
    bqkv,
    rel_bias,
    wproj,
    bproj,
    ln2_s,
    ln2_b,
    w1,
    b1,
    w2,
    b2,
    num_heads: int,
    window_tokens: int,
    pad_mask=None,
    block_windows: int = 0,
    interpret: bool = False,
):
    """x [Wt*N, C] window tokens -> full Swin block output, one fused kernel.

    Weights arrive in x.dtype (bf16 for serving); LN params, biases and the
    rel-pos bias table in fp32. `rel_bias` is [nH, N, N] (gathered by the
    caller; the gather index is static per trace).

    `pad_mask` [Wt*N, 1] {0,1} marks real (non-pad) token slots for grids
    that don't tile by the window; None when the grid tiles exactly.
    """
    Rt, C = x.shape
    N = window_tokens
    Wt = Rt // N
    BW = block_windows or _pick_block_windows(C, N, w1.shape[1])
    BW = min(BW, max(1, Wt))
    pad = (-Wt) % BW
    if pad:
        x = jnp.pad(x, ((0, pad * N), (0, 0)))
        if pad_mask is not None:
            pad_mask = jnp.pad(pad_mask, ((0, pad * N), (0, 0)))
    Wp = Wt + pad

    nH = num_heads
    R = BW * N
    mlp_hidden = w1.shape[1]
    # chunk the fp32 MLP hidden when it alone would exceed ~2 MB of VMEM
    hchunk = 0
    if 4 * R * mlp_hidden > 2 * 1024 * 1024:
        hchunk = max(128, (2 * 1024 * 1024 // (4 * R)) // 128 * 128)
        hchunk = min(hchunk, mlp_hidden)
    kernel = functools.partial(
        _block_kernel,
        num_heads=nH,
        window_tokens=N,
        block_windows=BW,
        has_mask=pad_mask is not None,
        mlp_hidden_chunk=hchunk,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full((C,)),
        full((C,)),
        full((C, 3 * C)),
        full((3 * C,)),
        full((nH, N, N)),
        full((C, C)),
        full((C,)),
        full((C,)),
        full((C,)),
        full((C, mlp_hidden)),
        full((mlp_hidden,)),
        full((mlp_hidden, C)),
        full((C,)),
    ]
    args = [x, ln1_s, ln1_b, wqkv, bqkv, rel_bias, wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2]
    if pad_mask is not None:
        in_specs.append(pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(pad_mask.astype(jnp.float32))

    flops_per_row = 2 * C * 3 * C + 2 * 2 * N * C + 2 * C * C + 2 * 2 * C * mlp_hidden
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Wp * N, C), x.dtype),
        grid=(Wp // BW,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        # the input block is dead after the kernel (the block's output replaces
        # it in the layer chain) — aliasing halves the padded HBM footprint
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=Wp * N * flops_per_row,
            bytes_accessed=2 * Wp * N * C * x.dtype.itemsize,
            transcendentals=Wp * (nH * N * N + N * mlp_hidden),
        ),
        interpret=interpret,
    )(*args)

    if pad:
        out = out[:Rt]
    return out


def _block_kernel_wide(
    x_ref,
    ln1_s_ref,
    ln1_b_ref,
    wqkv_ref,
    bqkv_ref,
    bias_ref,
    wproj_ref,
    bproj_ref,
    ln2_s_ref,
    ln2_b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    o_ref,
    *,
    num_heads: int,
    score_chunk: int,
):
    """Wide-lane variant: x block is [N, BW, C] token-slot-major, so the
    attention core runs with the WINDOW axis in the 128-lane dimension —
    full VPU occupancy instead of hd/128 (~12% for hd=16). The only
    transposes are supported last-two-dim swaps of small fp32 arrays
    ([N, BW, dw] <-> [N, dw, BW]); [N, BW, C] <-> [N*BW, C] merges are
    layout-free because BW is a sublane-tile multiple."""
    N, BW, C = x_ref.shape
    R = N * BW
    nH = num_heads
    hd = C // nH
    scale = hd**-0.5
    cdt = x_ref.dtype

    x32 = x_ref[:].reshape(R, C).astype(jnp.float32)  # rows are n-major

    y = _ln(x32, ln1_s_ref[:], ln1_b_ref[:])
    qkv = jnp.dot(y.astype(cdt), wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:]).astype(cdt)  # [R, 3C] compute-dtype (VMEM economy)

    proj = None
    for h in range(nH):
        # ---- scores [N, N, BW]: accumulate over dw-wide head chunks ----
        attn = None
        for d0 in range(0, hd, score_chunk):
            dw = min(score_chunk, hd - d0)
            qh = qkv[:, h * hd + d0 : h * hd + d0 + dw].astype(jnp.float32)
            kh = qkv[:, C + h * hd + d0 : C + h * hd + d0 + dw].astype(jnp.float32)
            qt = jnp.swapaxes(qh.reshape(N, BW, dw), 1, 2)  # [N, dw, BW]
            kt = jnp.swapaxes(kh.reshape(N, BW, dw), 1, 2)
            part = jnp.sum(qt[:, None] * kt[None, :], axis=2)  # [N, N, BW]
            attn = part if attn is None else attn + part
        attn = attn * scale + bias_ref[h][:, :, None]
        # softmax over the key axis (axis 1) — a sublane reduction
        attn = attn - jnp.max(attn, axis=1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=1, keepdims=True)

        # ---- values: out[n, d, w] = sum_m attn[m?]  ----
        for d0 in range(0, hd, score_chunk):
            dw = min(score_chunk, hd - d0)
            vh = qkv[:, 2 * C + h * hd + d0 : 2 * C + h * hd + d0 + dw].astype(jnp.float32)
            vt = jnp.swapaxes(vh.reshape(N, BW, dw), 1, 2)  # [N(m), dw, BW]
            oh = jnp.sum(attn[:, :, None, :] * vt[None, :, :, :], axis=1)  # [N, dw, BW]
            oh = jnp.swapaxes(oh, 1, 2).reshape(R, dw)  # n-major rows
            part = jnp.dot(
                oh.astype(cdt),
                wproj_ref[h * hd + d0 : h * hd + d0 + dw, :],
                preferred_element_type=jnp.float32,
            )
            proj = part if proj is None else proj + part

    x32 = x32 + proj + bproj_ref[:]

    y2 = _ln(x32, ln2_s_ref[:], ln2_b_ref[:])
    hmid = jnp.dot(y2.astype(cdt), w1_ref[:], preferred_element_type=jnp.float32)
    hmid = hmid + b1_ref[:]
    hmid = 0.5 * hmid * (1.0 + _erf32(hmid * jnp.float32(0.7071067811865476)))
    mlp = jnp.dot(hmid.astype(cdt), w2_ref[:], preferred_element_type=jnp.float32)
    x32 = x32 + mlp + b2_ref[:]

    o_ref[:] = x32.reshape(N, BW, C).astype(o_ref.dtype)


def _pick_block_windows_wide(C: int) -> int:
    """BW for the wide-lane kernel: 128 lanes when VMEM allows; the fp32
    hidden/qkv buffers force smaller blocks as C grows (deep levels have few
    windows and are matmul-dominated, so narrower lanes cost little there)."""
    if C <= 96:
        return 128
    if C <= 192:
        return 64
    return 32


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_windows", "score_chunk", "interpret"),
)
def fused_swin_block_wide(
    x,
    ln1_s,
    ln1_b,
    wqkv,
    bqkv,
    rel_bias,
    wproj,
    bproj,
    ln2_s,
    ln2_b,
    w1,
    b1,
    w2,
    b2,
    num_heads: int,
    block_windows: int = 0,
    score_chunk: int = 8,
    interpret: bool = False,
):
    """x [N, Wt, C] (token-slot-major windows, see
    ops/window.py:window_partition_nmajor) -> full Swin block, wide-lane
    fused kernel. Weight/bias conventions as `fused_swin_block`."""
    N, Wt, C = x.shape
    BW = block_windows or _pick_block_windows_wide(C)
    BW = min(BW, max(8, Wt))
    pad = (-Wt) % BW
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Wp = Wt + pad

    nH = num_heads
    kernel = functools.partial(_block_kernel_wide, num_heads=nH, score_chunk=score_chunk)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    mlp_hidden = w1.shape[1]

    flops_per_row = 2 * C * 3 * C + 2 * 2 * N * C + 2 * C * C + 2 * 2 * C * mlp_hidden
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Wp, C), x.dtype),
        grid=(Wp // BW,),
        in_specs=[
            pl.BlockSpec((N, BW, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            full((C,)),
            full((C,)),
            full((C, 3 * C)),
            full((3 * C,)),
            full((nH, N, N)),
            full((C, C)),
            full((C,)),
            full((C,)),
            full((C,)),
            full((C, mlp_hidden)),
            full((mlp_hidden,)),
            full((mlp_hidden, C)),
            full((C,)),
        ],
        out_specs=pl.BlockSpec((N, BW, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=Wp * N * flops_per_row,
            bytes_accessed=2 * Wp * N * C * x.dtype.itemsize,
            transcendentals=Wp * (nH * N * N + N * mlp_hidden),
        ),
        interpret=interpret,
    )(x, ln1_s, ln1_b, wqkv, bqkv, rel_bias, wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2)

    if pad:
        out = out[:, :Wt]
    return out


def _block_kernel_cst(
    x_ref,
    ln1_s_ref,
    ln1_b_ref,
    wqkv_ref,
    bqkv_ref,
    bias_ref,
    wproj_ref,
    bproj_ref,
    ln2_s_ref,
    ln2_b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    *rest,
    num_heads: int,
    score_chunk: int,
    has_mask: bool,
    loop_heads: bool,
):
    """Channels-major variant: x block is [C, N, BW] - channels on the MAJOR
    axis, token slots on sublanes, windows on lanes. Built for the SR-head
    levels (C=12/24) where any layout with C in lanes inflates HBM I/O
    5-11x; here HBM padding is a uniform ~1.28x (N=25 -> 32 sublanes) for
    every C, and the kernel body needs NO transposes or reshapes at all:

    * LN reduces over axis 0 (major);
    * per-token matmuls are dot_generals contracting the major axis
      ([Cout, C] . [C, N, BW] -> [Cout, N, BW]);
    * per-head q/k/v are major-axis slices (always layout-free);
    * the attention core is the wide-lane broadcast with windows in lanes.

    wqkv/w1/w2 arrive TRANSPOSED ([out, in]) vs the row-major kernels;
    wproj arrives UNtransposed ([in, out]) so its per-head-chunk row slices
    are major-axis slices (dynamic-sliceable in the fori_loop path).

    With `has_mask`, an extra [1, N, BW] {0,1} operand zeroes pad token
    slots post-LN1 — reproducing the reference's pad-after-norm semantics
    (SwinWNet.py:243-253) for grids that don't tile by the window, exactly
    as the unfused windowed path does.
    """
    if has_mask:
        mask_ref, o_ref, *scratch = rest
    else:
        o_ref, *scratch = rest
    C, N, BW = x_ref.shape
    nH = num_heads
    hd = C // nH
    scale = hd**-0.5
    cdt = x_ref.dtype

    x32 = x_ref[:].astype(jnp.float32)  # [C, N, BW]

    def ln_t(v, s_ref, b_ref):
        # scale/bias refs arrive pre-shaped [C, 1, 1] (Mosaic cannot shape-
        # cast vector<C> -> vector<Cx1x1> in-kernel)
        mean = jnp.mean(v, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=0, keepdims=True)
        y = (v - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * s_ref[:] + b_ref[:]

    def mm_t(w, v):
        """[Cout, Cin] . [Cin, N, BW] -> [Cout, N, BW] (contract major)."""
        return jax.lax.dot_general(
            w.astype(cdt), v.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    y = ln_t(x32, ln1_s_ref, ln1_b_ref)
    if has_mask:
        y = y * mask_ref[:]
    qkv = mm_t(wqkv_ref[:], y) + bqkv_ref[:]  # [3C, N, BW] f32
    qkv = qkv.astype(cdt)

    def head_attention(h, proj_acc, get_qkv, get_bias, get_wproj):
        """One head's scores -> softmax -> values, folded into the
        projection accumulator. The getters abstract static value slicing
        (unrolled path) vs dynamic `pl.ds` ref slicing (fori_loop path —
        Mosaic lowers dynamic indexing on REFS, not on values)."""
        attn = None
        for d0 in range(0, hd, score_chunk):
            dw = min(score_chunk, hd - d0)
            qt = get_qkv(h * hd + d0, dw).astype(jnp.float32)  # [dw, N, BW]
            kt = get_qkv(C + h * hd + d0, dw).astype(jnp.float32)
            part = jnp.sum(qt[:, :, None, :] * kt[:, None, :, :], axis=0)  # [N, N, BW]
            attn = part if attn is None else attn + part
        attn = attn * scale + get_bias(h)  # bias is [nH, N, N, 1]
        attn = attn - jnp.max(attn, axis=1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=1, keepdims=True)  # softmax over keys m

        for d0 in range(0, hd, score_chunk):
            dw = min(score_chunk, hd - d0)
            vt = get_qkv(2 * C + h * hd + d0, dw).astype(jnp.float32)
            # oh[d, n, w] = sum_m attn[n, m, w] * vt[d, m, w]
            oh = jnp.sum(attn[None, :, :, :] * vt[:, None, :, :], axis=2)  # [dw, N, BW]
            # wproj arrives UNtransposed [C_in, C_out]: row slices are
            # (sublane-aligned) major-axis slices in both paths
            part = jax.lax.dot_general(
                get_wproj(h * hd + d0, dw).astype(cdt),
                oh.astype(cdt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, N, BW]
            proj_acc = part if proj_acc is None else proj_acc + part
        return proj_acc

    if loop_heads:
        # one head's buffers live at a time: Mosaic's scoped-VMEM stack
        # grows with static unroll, so wide levels (C >= 96) iterate.
        # qkv parks in a VMEM scratch ref so the loop can pl.ds-slice it.
        (qkv_sc,) = scratch
        qkv_sc[:] = qkv
        proj = jax.lax.fori_loop(
            0,
            nH,
            lambda h, acc: head_attention(
                h,
                acc,
                # starts are h*hd + d0 with hd and score_chunk both 8-multiples
                # on this path; pl.multiple_of makes that provable to Mosaic
                lambda s, z: qkv_sc[pl.ds(pl.multiple_of(s, 8), z)],
                lambda hh: bias_ref[pl.ds(hh, 1)][0],
                lambda s, z: wproj_ref[pl.ds(pl.multiple_of(s, 8), z)],
            ),
            jnp.zeros((C, N, BW), jnp.float32),
        )
    else:
        proj = None
        for h in range(nH):
            proj = head_attention(
                h,
                proj,
                lambda s, z: qkv[s : s + z],
                lambda hh: bias_ref[hh],
                lambda s, z: wproj_ref[s : s + z],
            )

    x32 = x32 + proj + bproj_ref[:]

    y2 = ln_t(x32, ln2_s_ref, ln2_b_ref)
    if 4 * C * N * BW * 4 <= 4 * 1024 * 1024:
        hmid = mm_t(w1_ref[:], y2) + b1_ref[:]  # [H, N, BW]
        hmid = 0.5 * hmid * (1.0 + _erf32(hmid * jnp.float32(0.7071067811865476)))
        x32 = x32 + mm_t(w2_ref[:], hmid) + b2_ref[:]
        o_ref[:] = x32.astype(o_ref.dtype)
    else:
        # MLP is per-token: chunk the token-slot (sublane) axis so the fp32
        # [4C, n, BW] hidden stays small; each chunk writes its output rows
        # directly (8-aligned sublane slices; the N=25 tail is a 1-row
        # masked store).
        for n0 in range(0, N, 8):
            nc = min(8, N - n0)
            hc = mm_t(w1_ref[:], y2[:, n0 : n0 + nc, :]) + b1_ref[:]
            hc = 0.5 * hc * (1.0 + _erf32(hc * jnp.float32(0.7071067811865476)))
            xc = x32[:, n0 : n0 + nc, :] + mm_t(w2_ref[:], hc) + b2_ref[:]
            o_ref[:, n0 : n0 + nc, :] = xc.astype(o_ref.dtype)


def _pick_block_windows_cst(C: int) -> int:
    """Lanes per grid step. Pallas requires the lane-axis block to be a
    multiple of 128, so the only lever against the scoped-VMEM limit as C
    grows is chunking inside the kernel (see the MLP token chunking); above
    C=96 the buffers cannot fit at any legal BW and the caller keeps those
    (cheap, few-window) levels on the XLA path.

    BW=128 everywhere: the round-3 sweep (scripts/tune_fused_blocks.py)
    measured 128 faster than 256 at the SR levels too (SR1 36.8 vs 39.7 ms,
    SR2 19.5 vs 20.1 ms at the shipped score chunks) — the kernel is
    VPU-ALU-bound, so smaller blocks just pipeline better."""
    return 128


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_windows", "score_chunk", "interpret"),
)
def fused_swin_block_cst(
    x,
    ln1_s,
    ln1_b,
    wqkv_t,
    bqkv,
    rel_bias,
    wproj_t,
    bproj,
    ln2_s,
    ln2_b,
    w1_t,
    b1,
    w2_t,
    b2,
    num_heads: int,
    pad_mask=None,
    block_windows: int = 0,
    score_chunk: int = 8,
    interpret: bool = False,
):
    """x [C, N, Wt] (channels-major windows, see
    ops/window.py:window_partition_cmajor) -> full Swin block.

    `pad_mask` [N, Wt] {0,1} marks real (non-pad) token slots for grids
    that don't tile by the window; None when the grid tiles exactly.

    NOTE: wqkv_t/w1_t/w2_t arrive transposed ([out_features, in_features]);
    wproj_t is a misnomer kept for positional symmetry — pass wproj
    UNtransposed ([in_features, out_features]).
    """
    C, N, Wt = x.shape
    nH = num_heads
    BW = block_windows or _pick_block_windows_cst(C)
    BW = min(BW, max(8, Wt))
    pad = (-Wt) % BW
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        if pad_mask is not None:
            pad_mask = jnp.pad(pad_mask, ((0, 0), (0, pad)))
    Wp = Wt + pad

    loop_heads = C >= 96
    kernel = functools.partial(
        _block_kernel_cst,
        num_heads=nH,
        score_chunk=score_chunk,
        has_mask=pad_mask is not None,
        loop_heads=loop_heads,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    mlp_hidden = w1_t.shape[0]

    # Mosaic cannot shape-cast vector<C> -> vector<Cx1x1> inside the kernel:
    # every broadcast operand is pre-shaped here.
    col = lambda v: v.reshape(v.shape[0], 1, 1)
    ln1_s, ln1_b, bqkv, bproj = col(ln1_s), col(ln1_b), col(bqkv), col(bproj)
    ln2_s, ln2_b, b1, b2 = col(ln2_s), col(ln2_b), col(b1), col(b2)
    rel_bias = rel_bias[..., None]  # [nH, N, N, 1]

    in_specs = [
        pl.BlockSpec((C, N, BW), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        full((C, 1, 1)),
        full((C, 1, 1)),
        full((3 * C, C)),
        full((3 * C, 1, 1)),
        full((nH, N, N, 1)),
        full((C, C)),
        full((C, 1, 1)),
        full((C, 1, 1)),
        full((C, 1, 1)),
        full((mlp_hidden, C)),
        full((mlp_hidden, 1, 1)),
        full((C, mlp_hidden)),
        full((C, 1, 1)),
    ]
    args = [x, ln1_s, ln1_b, wqkv_t, bqkv, rel_bias, wproj_t, bproj, ln2_s, ln2_b, w1_t, b1, w2_t, b2]
    if pad_mask is not None:
        in_specs.append(pl.BlockSpec((1, N, BW), lambda i: (0, 0, i), memory_space=pltpu.VMEM))
        args.append(pad_mask.astype(jnp.float32)[None])

    flops_per_row = 2 * C * 3 * C + 2 * 2 * N * C + 2 * C * C + 2 * 2 * C * mlp_hidden
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, N, Wp), x.dtype),
        grid=(Wp // BW,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((C, N, BW), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        scratch_shapes=(
            [pltpu.VMEM((3 * C, N, BW), x.dtype)] if loop_heads else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=Wp * N * flops_per_row,
            bytes_accessed=2 * Wp * N * C * x.dtype.itemsize,
            transcendentals=Wp * (nH * N * N + N * mlp_hidden),
        ),
        interpret=interpret,
    )(*args)

    if pad:
        out = out[:, :, :Wt]
    return out


def swin_block_reference(
    x, ln1_s, ln1_b, wqkv, bqkv, rel_bias, wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2,
    num_heads: int, window_tokens: int, pad_mask=None,
):
    """Plain-XLA fp32 reference of the fused block (same math, same
    precision choices) for kernel validation and for the custom-VJP
    backward recompute (`fused_block_autodiff`). `pad_mask` [Wt*N, 1]
    reproduces the kernels' post-LN1 pad-slot zeroing."""
    N = window_tokens
    Rt, C = x.shape
    Wt = Rt // N
    nH = num_heads
    hd = C // nH

    x32 = x.astype(jnp.float32)
    y = _ln(x32, ln1_s, ln1_b)
    if pad_mask is not None:
        y = y * pad_mask
    qkv = y @ wqkv.astype(jnp.float32) + bqkv
    q = qkv[:, :C].reshape(Wt, N, nH, hd).transpose(0, 2, 1, 3)
    k = qkv[:, C : 2 * C].reshape(Wt, N, nH, hd).transpose(0, 2, 1, 3)
    v = qkv[:, 2 * C :].reshape(Wt, N, nH, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("whnd,whmd->whnm", q, k) * (hd**-0.5) + rel_bias[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(Rt, C)
    x32 = x32 + out @ wproj.astype(jnp.float32) + bproj
    y2 = _ln(x32, ln2_s, ln2_b)
    hmid = jax.nn.gelu(y2 @ w1.astype(jnp.float32) + b1, approximate=False)
    x32 = x32 + hmid @ w2.astype(jnp.float32) + b2
    return x32.astype(x.dtype)


# ---------------------------------------------------------------------------
# Differentiable entry point: fused forward, XLA-recompute backward
# ---------------------------------------------------------------------------


def _layout_xla_block(layout, num_heads, window_tokens, x, mask, *weights):
    """Pure-XLA fp32 re-expression of the fused kernels' math for any I/O
    layout — the backward-recompute function for `fused_block_autodiff`.
    Converts x/mask/weights to the canonical row-major layout, runs the
    (masked) reference block, and converts the output back."""
    N = window_tokens
    weights = list(weights)
    if layout == "cmajor":
        C, _, Wt = x.shape
        x2 = jnp.transpose(x, (2, 1, 0)).reshape(Wt * N, C)
        m2 = None if mask is None else mask.T.reshape(-1, 1)
        for i in (2, 9, 11):  # wqkv, w1, w2 arrive transposed on this path
            weights[i] = jnp.swapaxes(weights[i], 0, 1)
        out = swin_block_reference(
            x2, *weights, num_heads=num_heads, window_tokens=N, pad_mask=m2
        )
        return jnp.transpose(out.reshape(Wt, N, C), (2, 1, 0))
    if layout == "nmajor":
        _, Wt, C = x.shape
        x2 = jnp.transpose(x, (1, 0, 2)).reshape(Wt * N, C)
        out = swin_block_reference(
            x2, *weights, num_heads=num_heads, window_tokens=N, pad_mask=None
        )
        return jnp.transpose(out.reshape(Wt, N, C), (1, 0, 2))
    # rowmajor: x is [Wt*N, C], mask already [Wt*N, 1]
    return swin_block_reference(
        x, *weights, num_heads=num_heads, window_tokens=N, pad_mask=mask
    )


def _fused_kernel_call(layout, num_heads, window_tokens, opts, x, mask, *weights):
    # opts = (score_chunk, interpret)
    score_chunk, interpret = opts[0], opts[1]
    if layout == "cmajor":
        return fused_swin_block_cst(
            x, *weights, num_heads=num_heads, pad_mask=mask,
            score_chunk=score_chunk, interpret=interpret,
        )
    if layout == "nmajor":
        return fused_swin_block_wide(
            x, *weights, num_heads=num_heads,
            score_chunk=score_chunk, interpret=interpret,
        )
    return fused_swin_block(
        x, *weights, num_heads=num_heads, window_tokens=window_tokens,
        pad_mask=mask, interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_block_autodiff(layout, num_heads, window_tokens, has_mask, opts, x, *args):
    """Differentiable fused Swin block: the primal is the fused Pallas
    kernel for `layout` ("rowmajor" | "nmajor" | "cmajor"); the backward
    rematerializes through the pure-XLA reference of the same math
    (fp32 — training precision) and differentiates that. This is the
    standard recompute trade: training forwards get the kernels' one-HBM-
    read/one-write profile, the backward is left to XLA (which remat was
    already recomputing op-by-op).

    args = (mask?, ln1_s, ln1_b, wqkv, bqkv, rel_bias, wproj, bproj,
            ln2_s, ln2_b, w1, b1, w2, b2); mask present iff has_mask.
    opts = (score_chunk, interpret).
    """
    mask = args[0] if has_mask else None
    weights = args[1:] if has_mask else args
    return _fused_kernel_call(layout, num_heads, window_tokens, opts, x, mask, *weights)


def _fused_block_fwd(layout, num_heads, window_tokens, has_mask, opts, x, *args):
    out = fused_block_autodiff(layout, num_heads, window_tokens, has_mask, opts, x, *args)
    return out, (x, args)


def _fused_block_bwd(layout, num_heads, window_tokens, has_mask, opts, res, g):
    x, args = res
    mask = args[0] if has_mask else None
    weights = args[1:] if has_mask else args

    def f(x, *weights):
        return _layout_xla_block(layout, num_heads, window_tokens, x, mask, *weights)

    _, vjp = jax.vjp(f, x, *weights)
    grads = vjp(g.astype(jnp.float32))
    gx, gw = grads[0], grads[1:]
    gx = gx.astype(x.dtype)
    gw = tuple(gi.astype(wi.dtype) for gi, wi in zip(gw, weights))
    if has_mask:
        return (gx, jnp.zeros_like(mask)) + gw
    return (gx,) + gw


fused_block_autodiff.defvjp(_fused_block_fwd, _fused_block_bwd)
