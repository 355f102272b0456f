"""Fused window-MSA Pallas TPU kernel.

The hot op of the whole framework (SURVEY.md §3.1 "HOT LOOP"): multi-head
self-attention inside 5x5=25-token windows with a learned relative-position
bias (reference: SwinWNet.py:151-209). Up to ~1.5k windows per sample at the
finest level, every Swin block, three tower traversals per pipeline call.

Why a kernel: the XLA path materializes qkv [Wt, 25, 3C] and the attention
tensor [Wt, nH, 25, 25] in HBM between fusions. Here one `pallas_call`
processes a block of windows entirely in VMEM — qkv projection (MXU, rows =
block*25), per-head scores, bias add, softmax, value contraction, and the
output projection — writing only the final [Wt, 25, C] back to HBM. This op
is bandwidth-bound at these sizes, so killing the intermediate HBM traffic is
the whole game; padding the 25-token axis to the 128 lane is the price and is
shared by both paths.

The kernel covers the shipped configuration (shift_size=0, no dropout, no
shift mask — SwinWNet.py:328); callers fall back to the XLA path for masked /
dropout variants. Correctness is validated in interpret mode against
`window_attention_reference` (tests/test_pallas.py) and numerically on real
TPU by the checkpoint-parity suite when the flag is on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_reference(x_windows, wqkv, bqkv, rel_bias, wproj, bproj, num_heads):
    """Plain-XLA reference of the fused op (same math as
    models.layers.WindowAttention without dropout/mask)."""
    Wt, N, C = x_windows.shape
    nH = num_heads
    hd = C // nH
    scale = hd**-0.5

    qkv = jnp.einsum("wnc,cd->wnd", x_windows, wqkv, precision=jax.lax.Precision.HIGHEST)
    if bqkv is not None:
        qkv = qkv + bqkv
    qkv = qkv.reshape(Wt, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * scale, qkv[1], qkv[2]

    attn = jnp.einsum("whnd,whmd->whnm", q, k, precision=jax.lax.Precision.HIGHEST)
    attn = attn + rel_bias[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v, precision=jax.lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(Wt, N, C)
    out = jnp.einsum("wnc,cd->wnd", out, wproj, precision=jax.lax.Precision.HIGHEST)
    return out + bproj


def _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, bproj_ref, o_ref, *, num_heads):
    # Mosaic notes: tpu.matmul supports at most ONE batch dim, and 5-D
    # reshape+transpose of the packed qkv crashes the compiler — so heads are
    # a static python loop over lane slices of the single qkv matmul result
    # (slices at hd granularity are cheap relayouts; all matmuls stay 3-D).
    BW, N, C = x_ref.shape
    nH = num_heads
    hd = C // nH
    scale = hd**-0.5

    x = x_ref[:].reshape(BW * N, C)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]

    heads = []
    for h in range(nH):
        qh = qkv[:, h * hd : (h + 1) * hd].reshape(BW, N, hd)
        kh = qkv[:, C + h * hd : C + (h + 1) * hd].reshape(BW, N, hd)
        vh = qkv[:, 2 * C + h * hd : 2 * C + (h + 1) * hd].reshape(BW, N, hd)

        attn = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [BW, N, N]
        attn = attn * scale + bias_ref[h][None]
        attn = jax.nn.softmax(attn, axis=-1)

        oh = jax.lax.dot_general(
            attn, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [BW, N, hd]
        heads.append(oh.reshape(BW * N, hd))

    out = jnp.concatenate(heads, axis=-1).astype(x.dtype)
    o = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    o = o + bproj_ref[:]
    o_ref[:] = o.reshape(BW, N, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_windows", "interpret")
)
def fused_window_attention(
    x_windows,
    wqkv,
    bqkv,
    rel_bias,
    wproj,
    bproj,
    num_heads: int,
    block_windows: int = 64,
    interpret: bool = False,
):
    """x_windows [Wt, N, C] -> [Wt, N, C] fused W-MSA.

    rel_bias: [nH, N, N] (bias table already gathered by the caller — it is a
    static [25, 25] index so the gather happens once per jit trace).
    """
    Wt, N, C = x_windows.shape
    BW = min(block_windows, Wt) if Wt > 0 else block_windows
    pad = (-Wt) % BW
    if pad:
        x_windows = jnp.pad(x_windows, ((0, pad), (0, 0), (0, 0)))
    Wp = x_windows.shape[0]

    grid = (Wp // BW,)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((Wp, N, C), x_windows.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BW, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BW, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Wp * N * C * 3 * C  # qkv
            + 2 * Wp * num_heads * N * N * (C // num_heads) * 2  # scores + values
            + 2 * Wp * N * C * C,  # out proj
            bytes_accessed=Wp * N * C * 4 * 2 + C * 4 * C * 4,
            transcendentals=Wp * num_heads * N * N,
        ),
        interpret=interpret,
    )(x_windows, wqkv, bqkv, rel_bias, wproj, bproj)

    if pad:
        out = out[:Wt]
    return out
