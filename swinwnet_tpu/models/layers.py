"""flax.linen building blocks of the SwinWNet model family.

Design notes (TPU-first, not a translation):

* Tokens travel as **[B, H, W, C] grids**, not flattened [B, L, C] sequences —
  resolution is carried by the array shape instead of side-channel tuples,
  windowing is a static reshape, and NHWC is the native TPU conv layout.
* All pad/crop arithmetic is **static**: under `jit` the grid shape is a
  Python int, so the reference's runtime padding (SwinWNet.py:86-106,
  282-302) becomes trace-time constants.
* The reference's `ScaleAwarePatchEmbed` mutates `self.proj.dilation/stride`
  at call time (SwinWNet.py:60-67); here the *same kernel array* is applied
  through `lax.conv_general_dilated` with scale-dependent static strides /
  rhs_dilation — functionally identical, JAX-pure.
* Numerics match PyTorch for checkpoint parity: LayerNorm eps=1e-5, exact
  (erf) GELU, qkv packing order, relative-position bias indexing, and
  torch-style kaiming-uniform Dense/Conv initialization.

Reference file for all layer semantics: /root/reference/SwinWNet.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.window import (
    compute_mask,
    window_partition,
    window_partition_cmajor,
    window_partition_nmajor,
    window_reverse,
    window_reverse_cmajor,
    window_reverse_nmajor,
)
from ..ops.resize import bilinear_resize

# ---------------------------------------------------------------------------
# torch-compatible initializers / primitives
# ---------------------------------------------------------------------------

# torch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def gelu_exact(x):
    """torch nn.GELU default (erf form); jax.nn.gelu defaults to tanh approx."""
    return jax.nn.gelu(x, approximate=False)


def matmul_precision(dtype) -> jax.lax.Precision:
    """fp32 compute requests HIGHEST so the MXU does full-precision passes
    (checkpoint parity); bf16 compute uses the fast default path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


class Dense(nn.Module):
    """nn.Linear with torch-default init (incl. fan-in uniform bias)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype), precision=matmul_precision(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s, d: torch_bias_init(k, s, d, fan_in), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the channel axis, torch eps=1e-5, fp32 statistics."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class Conv(nn.Module):
    """NHWC conv with torch-default init."""

    features: int
    kernel_size: Tuple[int, int]
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw
        kernel = self.param(
            "kernel", torch_kernel_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        bias = self.param(
            "bias", lambda k, s, d: torch_bias_init(k, s, d, fan_in), (self.features,), jnp.float32
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=matmul_precision(self.dtype),
        )
        return y + bias.astype(self.dtype)


# ---------------------------------------------------------------------------
# Patch embedding
# ---------------------------------------------------------------------------


class ScaleAwarePatchEmbed(nn.Module):
    """One conv kernel embeds both LR (scale 1) and SR-output (scale 2) images
    onto the *same token grid* (reference: SwinWNet.py:29-82).

    scale 1: stride=p, dilation=1 over [B, C, H, W]
    scale 2: stride=2p, rhs_dilation=2 over [B, C, 2H, 2W] -> identical grid.

    Returns ([B, h, w, embed_dim] token grid, (H_pad, W_pad)).
    Input is NCHW to match the reference's public API.
    """

    patch_size: int = 2
    in_chans: int = 1
    embed_dim: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_factor: int = 1):
        p, s = self.patch_size, scale_factor
        B, C, H, W = x.shape
        assert C == self.in_chans, f"expected {self.in_chans} channels, got {C}"
        fan_in = self.in_chans * p * p
        kernel = self.param(
            "proj_kernel", torch_kernel_init, (p, p, self.in_chans, self.embed_dim), jnp.float32
        )
        bias = self.param(
            "proj_bias",
            lambda k, sh, d: torch_bias_init(k, sh, d, fan_in),
            (self.embed_dim,),
            jnp.float32,
        )

        x = x.transpose(0, 2, 3, 1)  # NHWC
        # pad so that the strided/dilated conv covers the full image
        # (the reference formula at SwinWNet.py:70-71 is a no-op for the
        # supported 250x480 / 500x960 geometry; we pad to a multiple of p*s)
        m = p * s
        pad_h = (m - H % m) % m
        pad_w = (m - W % m) % m
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        new_H, new_W = H + pad_h, W + pad_w

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(p * s, p * s),
            padding="VALID",
            rhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=matmul_precision(self.dtype),
        )
        y = y + bias.astype(self.dtype)
        # free-standing BHWC LN stays on XLA: a one-read-one-write Pallas
        # LN kernel won its standalone A/B 3.32x (21.4 -> 6.5 ms at the
        # published geometry) yet measured NEUTRAL-to-negative in the full
        # pipeline (45.88 vs 46.19 img/s, runs/ln_insitu_r05.txt) — in situ
        # XLA fuses this LN into its producers, so the standalone XLA
        # number was an isolation artifact. Kernel deleted in round 5.
        y = LayerNorm(dtype=self.dtype, name="norm")(y)
        return y, (new_H, new_W)


# ---------------------------------------------------------------------------
# Window attention
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def relative_position_index(window_size: int) -> np.ndarray:
    """Static [N, N] index into the (2w-1)^2 bias table (SwinWNet.py:163-172)."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # 2, w, w
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class _LinearParams(nn.Module):
    """Declares Dense-compatible params ({kernel, bias}) and returns them raw,
    so a caller can route them either through inline XLA math or into a fused
    Pallas kernel while keeping the checkpoint tree identical."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, fan_in: int):
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s, d: torch_bias_init(k, s, d, fan_in), (self.features,), jnp.float32
            )
        return kernel, bias


class WindowAttention(nn.Module):
    """MSA within a window with learned relative-position bias
    (reference: SwinWNet.py:151-209).

    Input: [num_windows_total, N, C] window tokens; optional additive mask
    [nW, N, N] for shifted windows.

    TPU formulation ("bcast", the default): a 25-token window is far below
    the 128x128 MXU tile, so scores/values as *batched matmuls* pay a fixed
    per-window cost (~0.6 us/window measured on v5e — window count, not
    FLOPs, set round 1's wall clock). Instead the attention core is computed
    as broadcast-multiply-reduce on the VPU with heads kept in the minor
    axis — scores [Wt, N, N, nH] — so there are NO transposes anywhere
    between the qkv matmul and the output projection (measured 3x faster at
    the finest level, and relayout-free). "matmul" keeps the round-1 batched
    einsum path.

    `use_pallas` is consumed one level up: SwinTransformerBlock routes
    eligible windowed blocks through the fused whole-block kernel
    (ops/pallas/swin_block.py) instead of calling this module at all.
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    # >0: process windows in lax.map chunks of this size, bounding the live
    # attention tensor to [chunk, N, N, nH] — bounds HBM for very large
    # window batches (the finest SR-head level materializes 30 GB at B=32
    # without it). 0 = off.
    attn_chunk: int = 0
    # "bcast" (VPU, default) | "matmul" (per-window MXU) | "packed" (MXU on
    # 5-window 125-token tiles with a block-diagonal bias/mask — 5x redundant
    # score FLOPs but ~full MXU tile occupancy vs 25x25's 4%)
    formulation: str = "bcast"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        Bw, N, C = x.shape
        nH = self.num_heads
        hd = C // nH
        scale = hd**-0.5
        prec = matmul_precision(self.dtype)

        qkv_k, qkv_b = _LinearParams(3 * C, self.qkv_bias, name="qkv")(C)
        proj_k, proj_b = _LinearParams(C, True, name="proj")(C)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, nH),
            jnp.float32,
        )
        rpi = jnp.asarray(relative_position_index(self.window_size))
        rel_bias_nnh = bias_table[rpi.reshape(-1)].reshape(N, N, nH)  # heads minor
        rel_bias = rel_bias_nnh.transpose(2, 0, 1)  # [nH, N, N] for matmul path

        def attend_bcast(xw, m):
            """[k, N, C] windows -> attention output, heads-minor layout.

            scores[w,n,m,h] = sum_d q[w,n,h,d] k[w,m,h,d]: a VPU
            multiply-accumulate (f32 accumulation, matching the MXU path's
            preferred_element_type), never a sub-MXU-tile batched matmul.
            """
            k_ = xw.shape[0]
            qkv = jnp.dot(xw.astype(self.dtype), qkv_k.astype(self.dtype), precision=prec)
            if qkv_b is not None:
                qkv = qkv + qkv_b.astype(self.dtype)
            q = qkv[..., :C].reshape(k_, N, nH, hd) * jnp.asarray(scale, self.dtype)
            kk = qkv[..., C : 2 * C].reshape(k_, N, nH, hd)
            v = qkv[..., 2 * C :].reshape(k_, N, nH, hd)

            attn = jnp.sum(
                q[:, :, None].astype(jnp.float32) * kk[:, None].astype(jnp.float32),
                axis=-1,
            )  # [k, N, N, nH] fp32
            attn = attn + rel_bias_nnh[None]
            if m is not None:
                nW = m.shape[0]
                attn = attn.reshape(k_ // nW, nW, N, N, nH) + m[None, :, :, :, None]
                attn = attn.reshape(k_, N, N, nH)
            attn = jax.nn.softmax(attn, axis=2).astype(self.dtype)
            if self.attn_drop > 0.0:
                attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.sum(
                attn[:, :, :, :, None].astype(jnp.float32) * v[:, None].astype(jnp.float32),
                axis=2,
            )  # [k, N, nH, hd]
            return out.reshape(k_, N, C).astype(self.dtype)

        def attend_matmul(xw, m):
            """Round-1 batched-einsum path (kept for A/B and CPU tests)."""
            k_ = xw.shape[0]
            qkv = jnp.dot(xw.astype(self.dtype), qkv_k.astype(self.dtype), precision=prec)
            if qkv_b is not None:
                qkv = qkv + qkv_b.astype(self.dtype)
            qkv = qkv.reshape(k_, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
            q, kk, v = qkv[0] * scale, qkv[1], qkv[2]
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q, kk, preferred_element_type=jnp.float32, precision=prec
            )
            attn = attn + rel_bias[None]
            if m is not None:
                nW = m.shape[0]
                attn = attn.reshape(k_ // nW, nW, nH, N, N) + m[None, :, None].astype(attn.dtype)
                attn = attn.reshape(k_, nH, N, N)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            if self.attn_drop > 0.0:
                attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32, precision=prec
            )
            return out.transpose(0, 2, 1, 3).reshape(k_, N, C).astype(self.dtype)

        def attend_packed(xw, m, group: int = 5):
            """Window-packed MXU formulation: stack `group` windows along the
            token axis (5 x 25 = 125 rows ~ one 128-row MXU tile) and run ONE
            [G*N, G*N] score matmul per packed tile. Cross-window scores are
            computed redundantly (G-fold extra FLOPs) and killed by a static
            block-diagonal -1e9 mask folded into the tiled rel-pos bias; the
            value contraction then sees full MXU occupancy too. Shift masks
            (m) are not supported — the shipped checkpoints never shift
            (SwinWNet.py:328), and callers fall back to bcast when m is set.
            """
            assert m is None, "packed formulation requires mask=None"
            k_ = xw.shape[0]
            pad = (-k_) % group
            if pad:
                xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
            kp = xw.shape[0] // group
            GN = group * N
            qkv = jnp.dot(xw.astype(self.dtype), qkv_k.astype(self.dtype), precision=prec)
            if qkv_b is not None:
                qkv = qkv + qkv_b.astype(self.dtype)
            qkv = qkv.reshape(kp, GN, 3, nH, hd)
            q = qkv[:, :, 0] * jnp.asarray(scale, self.dtype)
            kk = qkv[:, :, 1]
            v = qkv[:, :, 2]
            # static packed bias: rel-pos bias on the diagonal blocks, -1e9 off
            eye = jnp.eye(group, dtype=jnp.float32)
            packed_bias = (
                eye[:, None, :, None] * rel_bias[:, None, :, None, :]
                + (1.0 - eye)[:, None, :, None] * (-1e9)
            )  # [nH broadcast]: shapes [G,1,G,1]x[nH,1,N,1,N] -> [nH,G,N,G,N]
            packed_bias = packed_bias.reshape(nH, GN, GN)
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, kk, preferred_element_type=jnp.float32, precision=prec
            )
            attn = attn + packed_bias[None]
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            if self.attn_drop > 0.0:
                attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32, precision=prec
            )
            out = out.reshape(kp * group, N, C).astype(self.dtype)
            return out[:k_] if pad else out

        attend = {
            "bcast": attend_bcast,
            "matmul": attend_matmul,
            "packed": attend_packed,
        }[self.formulation]
        if self.formulation == "packed" and mask is not None:
            attend = attend_bcast  # shift masks: packed unsupported, see above

        chunkable = (
            self.attn_chunk > 0
            and mask is None
            and (self.attn_drop == 0.0 or deterministic)
            and Bw > self.attn_chunk
        )
        if chunkable:
            K = self.attn_chunk
            pad = (-Bw) % K
            xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
            out = jax.lax.map(lambda c: attend(c, None), xp.reshape(-1, K, N, C)).reshape(
                -1, N, C
            )
            if pad:
                out = out[:Bw]
        else:
            out = attend(x, mask)

        out = jnp.dot(out, proj_k.astype(self.dtype), precision=prec) + proj_b.astype(self.dtype)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class Mlp(nn.Module):
    """2-layer MLP with exact GELU (reference: SwinWNet.py:228-234)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class _LNParams(nn.Module):
    """Declares LayerNorm-compatible params ({scale, bias}) and returns them
    raw, for routing into the fused block kernel with an identical
    checkpoint tree."""

    @nn.compact
    def __call__(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return s, b


class _AttnParams(nn.Module):
    """WindowAttention's param tree (qkv/proj/bias-table), returned raw."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        C = self.dim
        qkv_k, qkv_b = _LinearParams(3 * C, self.qkv_bias, name="qkv")(C)
        proj_k, proj_b = _LinearParams(C, True, name="proj")(C)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        return qkv_k, qkv_b, proj_k, proj_b, table


class _MlpParams(nn.Module):
    """Mlp's param tree (fc1/fc2), returned raw."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, in_dim: int):
        k1, b1 = _LinearParams(self.hidden, True, name="fc1")(in_dim)
        k2, b2 = _LinearParams(self.out, True, name="fc2")(self.hidden)
        return k1, b1, k2, b2


@functools.lru_cache(maxsize=64)
def _window_pad_mask_np(H: int, W: int, window_size: int) -> Optional[np.ndarray]:
    """[nW, N, 1] {0,1} mask of real (non-pad) token slots per window, or
    None when (H, W) tile exactly. Used by the windowed block layout to keep
    pad tokens at zero *post-LN*, exactly as the reference's per-block
    pad-after-norm does (SwinWNet.py:243-253)."""
    ws = window_size
    if H % ws == 0 and W % ws == 0:
        return None
    grid = np.zeros((H + (-H) % ws, W + (-W) % ws, 1), np.float32)
    grid[:H, :W] = 1.0
    Hp, Wp = grid.shape[0], grid.shape[1]
    m = grid.reshape(Hp // ws, ws, Wp // ws, ws, 1).transpose(0, 2, 1, 3, 4)
    return m.reshape(-1, ws * ws, 1)


class SwinTransformerBlock(nn.Module):
    """Pre-LN W-MSA / SW-MSA block (reference: SwinWNet.py:211-280).

    Two layouts:
    * grid (`windowed=False`): input [B, H, W, C]; partition/reverse inside
      the block. Required for shift_size > 0 (cyclic roll is a grid op).
    * windowed (`windowed=True`, shift 0 only): input [B*nW, N, C] window
      tokens — BasicLayer partitions ONCE and runs every block in window
      layout, cancelling the per-block partition/reverse relayouts (shift is
      always 0 in the shipped checkpoints, SwinWNet.py:328). `grid_hw` is the
      unpadded grid shape; when it doesn't tile by `window_size`, pad token
      slots are re-zeroed post-LN each block, which makes the windowed layout
      *exactly* equal to the reference's pad-after-norm per block: attention
      is the only cross-token op and it sees identical inputs.
    """

    dim: int
    num_heads: int
    window_size: int = 5
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    attn_chunk: int = 0
    windowed: bool = False
    # "" = unfused windowed [B*nW, N, C]; "nmajor" = [N, B*nW, C] wide-lane
    # kernel; "cmajor" = [C, N, B*nW] channels-major kernel (SR levels)
    fused_layout: str = ""
    grid_hw: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.windowed:
            assert self.shift_size == 0, "windowed layout requires shift_size=0"
            if self.fused_layout:
                # BasicLayer decided the whole stack fuses (see its
                # `fuse_stack` gate) and partitioned accordingly; the entire
                # block is one fused Pallas kernel call.
                return self._fused_windowed(x, layout=self.fused_layout)
            shortcut = x
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)
            pad_mask = _window_pad_mask_np(*self.grid_hw, self.window_size)
            if pad_mask is not None:
                nW = pad_mask.shape[0]
                x = (
                    x.reshape(-1, nW, x.shape[1], x.shape[2])
                    * jnp.asarray(pad_mask, self.dtype)[None]
                ).reshape(x.shape)
            x = WindowAttention(
                dim=self.dim,
                window_size=self.window_size,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop,
                proj_drop=self.drop,
                use_pallas=self.use_pallas,
                attn_chunk=self.attn_chunk,
                dtype=self.dtype,
                name="attn",
            )(x, mask=None, deterministic=deterministic)
        else:
            B, H, W, C = x.shape
            shortcut = x
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)

            if self.shift_size > 0:
                x = jnp.roll(x, shift=(-self.shift_size, -self.shift_size), axis=(1, 2))
                attn_mask = compute_mask(H, W, self.window_size, self.shift_size)
            else:
                attn_mask = None

            x_windows, (Hp, Wp) = window_partition(x, self.window_size)
            attn_windows = WindowAttention(
                dim=self.dim,
                window_size=self.window_size,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                attn_drop=self.attn_drop,
                proj_drop=self.drop,
                use_pallas=self.use_pallas,
                attn_chunk=self.attn_chunk,
                dtype=self.dtype,
                name="attn",
            )(x_windows, mask=attn_mask, deterministic=deterministic)
            x = window_reverse(attn_windows, self.window_size, Hp, Wp)

            if self.shift_size > 0:
                x = jnp.roll(x, shift=(self.shift_size, self.shift_size), axis=(1, 2))
            if Hp != H or Wp != W:
                x = x[:, :H, :W, :]

        # reference simplifies drop_path to plain Dropout (SwinWNet.py:225)
        x = nn.Dropout(self.drop_path, deterministic=deterministic)(x)
        x = shortcut + x

        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden=int(self.dim * self.mlp_ratio),
            out=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        y = nn.Dropout(self.drop_path, deterministic=deterministic)(y)
        return x + y

    def _fused_windowed(self, x, layout: str = "rowmajor"):
        """Route the whole block through the fused Pallas kernel
        (ops/pallas/swin_block.py): one HBM read + one write per block
        instead of ~10 materialized intermediates. Param tree is identical
        to the unfused path (checkpoint compatible). Serving only:
        deterministic, shift 0, exactly-tiling grid.

        layout: "rowmajor" — x is [B*nW, N, C]; row-major kernel.
                "nmajor"   — x is [N, B*nW, C] (window_partition_nmajor);
                             wide-lane kernel, windows in the lane axis.
                "cmajor"   — x is [C, N, B*nW] (window_partition_cmajor);
                             channels-major kernel, uniform ~1.28x HBM
                             padding — the only fusable layout for the
                             SR-head C=12/24 levels."""
        from ..ops.pallas.swin_block import fused_block_autodiff

        C = self.dim
        N = self.window_size * self.window_size
        s1, b1 = _LNParams(name="norm1")(C)
        qkv_k, qkv_b, proj_k, proj_b, table = _AttnParams(
            dim=C,
            window_size=self.window_size,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            name="attn",
        )()
        s2, b2 = _LNParams(name="norm2")(C)
        hidden = int(self.dim * self.mlp_ratio)
        k1, bb1, k2, bb2 = _MlpParams(hidden=hidden, out=C, name="mlp")(C)

        rpi = jnp.asarray(relative_position_index(self.window_size))
        rel_bias = table[rpi.reshape(-1)].reshape(N, N, self.num_heads).transpose(2, 0, 1)
        if qkv_b is None:
            qkv_b = jnp.zeros((3 * C,), jnp.float32)

        interp = jax.default_backend() != "tpu"
        weights = dict(
            ln1_s=s1,
            ln1_b=b1,
            wqkv=qkv_k.astype(self.dtype),
            bqkv=qkv_b.astype(jnp.float32),
            rel_bias=rel_bias.astype(jnp.float32),
            wproj=proj_k.astype(self.dtype),
            bproj=proj_b.astype(jnp.float32),
            ln2_s=s2,
            ln2_b=b2,
            w1=k1.astype(self.dtype),
            b1=bb1.astype(jnp.float32),
            w2=k2.astype(self.dtype),
            b2=bb2.astype(jnp.float32),
        )
        # every call goes through the custom-VJP entry point: the primal is
        # the fused kernel; under jax.grad the backward rematerializes
        # through the pure-XLA reference — so use_pallas=True is trainable
        if layout == "nmajor":
            return fused_block_autodiff(
                "nmajor", self.num_heads, N, False, (8, interp),
                x.astype(self.dtype), *weights.values(),
            )
        if layout == "cmajor":
            for k in ("wqkv", "w1", "w2"):  # wproj stays [in, out] (row slices)
                weights[k] = jnp.swapaxes(weights[k], 0, 1)
            hd = C // self.num_heads
            m = _window_pad_mask_np(*self.grid_hw, self.window_size)
            mask = ()
            if m is not None:  # [nW, N, 1] per sample -> [N, B*nW] c-major
                nW = m.shape[0]
                Bv = x.shape[2] // nW
                mask = (jnp.asarray(np.tile(m[:, :, 0].T, (1, Bv))),)
            # wide score chunks win big (fewer [sc,N,N,BW] partial
            # accumulations: sc=4 measured 5x SLOWER than sc=16 at L0);
            # the C>=96 fori_loop path is capped at 8 for scoped VMEM
            # and 8-multiple slice alignment
            return fused_block_autodiff(
                "cmajor", self.num_heads, N, bool(mask),
                (min(16, hd) if C <= 48 else 8, interp),
                x.astype(self.dtype), *mask, *weights.values(),
            )
        m = _window_pad_mask_np(*self.grid_hw, self.window_size)
        mask = ()
        if m is not None:  # [nW, N, 1] per sample -> [B*nW*N, 1] row-major
            nW = m.shape[0]
            Bv = x.shape[0] // nW
            mask = (jnp.asarray(np.tile(m, (Bv, 1, 1)).reshape(-1, 1)),)
        out = fused_block_autodiff(
            "rowmajor", self.num_heads, N, bool(mask), (8, interp),
            x.reshape(-1, C).astype(self.dtype), *mask, *weights.values(),
        )
        return out.reshape(x.shape)


class BasicLayer(nn.Module):
    """Stack of `depth` Swin blocks; shift_size=0 for every block, matching
    the shipped checkpoints (reference: SwinWNet.py:318-340, ':328 always 0').

    With shift 0 the layer partitions the grid into windows ONCE, runs all
    blocks in window-token layout, and reverses once — per-block
    partition/reverse pairs are pure relayouts that cancel, and LN/MLP/
    residual are per-token so the layout is transparent to them (pad slots
    are re-zeroed post-LN inside each block; see SwinTransformerBlock).

    `remat=True` rematerializes each block under reverse-mode AD
    (jax.checkpoint) — activations are recomputed in the backward pass,
    trading ~1/3 more FLOPs for O(depth) less live memory, which is the
    standard TPU HBM trade for training."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 5
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    attn_chunk: int = 0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block_cls = (
            nn.remat(SwinTransformerBlock, static_argnums=(2,))
            if self.remat
            else SwinTransformerBlock
        )
        windowed = self.shift_size == 0
        fused_layout = ""
        if windowed:
            B, H, W, C = x.shape
            grid_hw = (H, W)
            # Whole-stack fused-kernel gate + layout choice:
            # * C <= 96 levels use the channels-major kernel on [C, N, Wt]:
            #   uniform ~1.28x HBM padding at every width (vs 128/C-fold for
            #   any C-in-lanes layout) — essential for the SR-head C=12/24
            #   levels (largest token grids, 5-11x tax otherwise).
            # * C = 192/384 levels (round 3): the channels-major buffers
            #   cannot fit scoped VMEM at the 128-lane minimum legal block;
            #   the ROW-MAJOR kernel ([Wt*N, C], C in lanes) fits via its
            #   VMEM-sized BW, pads only 1.33x/1.0x there, and covers the
            #   non-tiling grids via pad masks — but MEASURED END TO END IT
            #   LOSES to XLA (full pipeline B=64 bf16: 32.3 -> 26.2 img/s,
            #   config-#1 segmentation 38.7 -> 36.4; the deep levels are
            #   few-window and matmul-dominated, and the kernel's per-window
            #   25x25 dots underfill the MXU — same reason rowmajor lost at
            #   C<=96 in round 2). Default OFF; SWINWNET_FUSED_DEEP=1
            #   enables it for A/B.
            # "1" = plain rowmajor kernel (round 3 — measured slower than
            # XLA). The round-4 "packed" in-kernel variant was deleted in
            # round 5: the XLA-level packed formulation loses 1.4-2.2x at
            # every site (runs/attn_packed_r05.txt) and the in-kernel one
            # cannot lower (375-row blocks violate Mosaic's 8-row rule).
            fuse_deep = os.environ.get("SWINWNET_FUSED_DEEP", "0") == "1"
            # fp32 (training precision) doubles every kernel buffer: at C=96
            # the fori-loop cmajor kernel's scoped-VMEM stack measures 16.8 MB
            # against the 16 MB limit (fine in bf16: ~8.4 MB), so fp32 keeps
            # C=96 on XLA; C<=48 and the SR levels — the HBM-dominant ones —
            # stay fused in training too.
            fp32_cap = 48 if self.dtype != jnp.bfloat16 else 96
            # windows land on the kernels' lane axis; below ~one 128-lane
            # tile Mosaic's in-kernel reshapes reject the block (observed:
            # BW=8 fails "unsupported shape cast" on hardware) and the
            # kernel would be all padding anyway — tiny grids stay on XLA
            nw_total = B * (-(-H // self.window_size)) * (-(-W // self.window_size))
            interpret_env = bool(os.environ.get("SWINWNET_FUSED_INTERPRET"))
            fusable = (
                self.use_pallas
                and deterministic
                and (nw_total >= 128 or interpret_env)
                and (self.dim <= fp32_cap or (fuse_deep and self.dim <= 384))
                and (jax.default_backend() == "tpu" or interpret_env)
            )
            if fusable:
                if self.dim <= fp32_cap:
                    # "nmajor" (wide-lane, [N, Wt, C]) is kept for A/B via
                    # env; it has no mask support, so padded grids fall back.
                    fused_layout = os.environ.get("SWINWNET_FUSED_LAYOUT", "cmajor")
                    if (
                        fused_layout == "nmajor"
                        and _window_pad_mask_np(H, W, self.window_size) is not None
                    ):
                        fused_layout = ""
                else:
                    fused_layout = "rowmajor"
            # the cmajor relayout stays on XLA transposes: a Pallas
            # permutation kernel was built and raced in rounds 4-5
            # (runs/relayout_ab_r05.txt — 39.8 ms vs XLA 1.1 ms for the
            # L0 partition+reverse round trip; XLA cancels adjacent
            # partition∘reverse pairs, which no standalone kernel can) and
            # deleted as a measured loss.
            part = {
                "nmajor": window_partition_nmajor,
                "cmajor": window_partition_cmajor,
                "rowmajor": window_partition,
                "": window_partition,
            }[fused_layout]
            x, (Hp, Wp) = part(x, self.window_size)
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=self.shift_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                use_pallas=self.use_pallas,
                attn_chunk=self.attn_chunk,
                windowed=windowed,
                fused_layout=fused_layout,
                grid_hw=grid_hw if windowed else None,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        if windowed:
            rev = {
                "nmajor": window_reverse_nmajor,
                "cmajor": window_reverse_cmajor,
                "rowmajor": window_reverse,
                "": window_reverse,
            }[fused_layout]
            x = rev(x, self.window_size, Hp, Wp)
            if Hp != H or Wp != W:
                x = x[:, :H, :W, :]
        return x


# ---------------------------------------------------------------------------
# Down / up sampling
# ---------------------------------------------------------------------------


class PatchMerging(nn.Module):
    """2x downsample: 2x2 neighbor concat -> LN -> Linear(4C->2C, no bias)
    (reference: SwinWNet.py:282-316).

    Runs as inline XLA ops. A whole-module Pallas kernel (concat/LN/
    reduction in one VMEM pass) was built in round 4 and deleted in
    round 5: both kernel formulations of the 2x2 column pairing — an
    in-register lane-merging shape cast and a strided-slice rework — are
    rejected by Mosaic on real TPUs ("unsupported shape cast", then "Only
    2D gather is supported"; runs/merge_ab_r05.txt, runs/merge_ab_r05b.txt).
    Interleaving lanes has no legal Mosaic idiom at these widths."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h = H % 2
        pad_w = W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class PatchExpanding(nn.Module):
    """2x upsample: Linear(C->2C, no bias) -> pixel-shuffle -> LN
    (reference: SwinWNet.py:390-412).

    Inline XLA ops; the round-4 whole-module Pallas kernel was deleted in
    round 5 for the mirrored Mosaic limitation PatchMerging hit (lane
    splitting instead of lane interleaving — see PatchMerging's note)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 2)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


# ---------------------------------------------------------------------------
# Encoder / bottleneck / decoder
# ---------------------------------------------------------------------------


class SwinEncoder(nn.Module):
    """4 stages of (BasicLayer -> skip -> PatchMerging) + final BasicLayer
    (reference: SwinWNet.py:342-378). Returns the list of skip grids; the last
    entry is the deepest (pre-bottleneck) feature map."""

    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 5
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    attn_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        skips = []
        dim = self.embed_dim
        n = len(self.depths)
        for i in range(n - 1):
            x = BasicLayer(
                dim=dim,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                use_pallas=self.use_pallas,
                attn_chunk=self.attn_chunk,
                remat=self.remat,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
            skips.append(x)
            x = PatchMerging(dim=dim, dtype=self.dtype, name=f"downs_{i}")(x)
            dim *= 2
        x = BasicLayer(
            dim=dim,
            depth=self.depths[-1],
            num_heads=self.num_heads[-1],
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop=self.drop,
            attn_drop=self.attn_drop,
            drop_path=self.drop_path,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
            name=f"layers_{n-1}",
        )(x, deterministic=deterministic)
        skips.append(x)
        return skips


class Bottleneck(nn.Module):
    """Depth-2 BasicLayer at 8C (reference: SwinWNet.py:380-388)."""

    dim: int
    num_heads: int
    window_size: int = 5
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    attn_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return BasicLayer(
            dim=self.dim,
            depth=2,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop=self.drop,
            attn_drop=self.attn_drop,
            drop_path=self.drop_path,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
            name="layer",
        )(x, deterministic=deterministic)


class SwinDecoder(nn.Module):
    """3 stages: PatchExpanding -> crop-to-skip -> concat -> BasicLayer ->
    Linear(2C->C) (reference: SwinWNet.py:427-493). Decoder depths/heads are
    `depths[-2::-1]` / `num_heads[-2::-1]` (SwinWNet.py:437-438)."""

    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 5
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    attn_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, deterministic: bool = True):
        dec_depths = tuple(self.depths[-2::-1])
        dec_heads = tuple(self.num_heads[-2::-1])
        skips = skips[-2::-1]

        dim = self.embed_dim * 8
        for i in range(len(self.depths) - 1):
            expanded = dim // 2
            concat_dim = dim

            x = PatchExpanding(dim=dim, dtype=self.dtype, name=f"ups_{i}")(x)

            skip = skips[i]
            th, tw = skip.shape[1], skip.shape[2]
            if x.shape[1] != th or x.shape[2] != tw:
                x = x[:, :th, :tw, :]

            x = jnp.concatenate([x, skip], axis=-1)
            x = BasicLayer(
                dim=concat_dim,
                depth=dec_depths[i],
                num_heads=dec_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                use_pallas=self.use_pallas,
                attn_chunk=self.attn_chunk,
                remat=self.remat,
                dtype=self.dtype,
                name=f"swin_blocks_{i}",
            )(x, deterministic=deterministic)
            x = Dense(expanded, dtype=self.dtype, name=f"linears_{i}")(x)
            dim = expanded
        return x


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


class SegmentationHead(nn.Module):
    """Conv3x3+GELU+Conv1x1 -> bilinear x(p*scale) -> crop; 1-channel logits
    (reference: SwinWNet.py:495-531). Input [B, h, w, C] grid; output NCHW."""

    embed_dim: int = 48
    patch_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padded_res: Tuple[int, int], scale_factor: int = 1):
        H, W = padded_res
        x = Conv(self.embed_dim // 2, (3, 3), dtype=self.dtype, name="conv1")(x)
        x = gelu_exact(x)
        x = Conv(1, (1, 1), dtype=self.dtype, name="conv2")(x)
        x = x.transpose(0, 3, 1, 2)  # NCHW
        up = self.patch_size * scale_factor
        x = bilinear_resize(x, x.shape[2] * up, x.shape[3] * up)
        return x[:, :, :H, :W]


class UpscalingHead(nn.Module):
    """2x (PatchExpanding + depth-2 BasicLayer) + conv reconstruction; output
    has 2 channels when error_matrix else 1 (reference: SwinWNet.py:594-688).
    Input [B, h, w, C] grid; output NCHW at 4x the token resolution."""

    error_matrix: bool = False
    embed_dim: int = 48
    patch_size: int = 2
    window_size: int = 5
    num_heads: int = 3
    depth: int = 2
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    attn_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = self.embed_dim
        for i in range(2):
            x = PatchExpanding(dim=dim, dtype=self.dtype, name=f"ups_{i}")(x)
            x = BasicLayer(
                dim=dim // 2,
                depth=self.depth,
                num_heads=self.num_heads,
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                use_pallas=self.use_pallas,
                attn_chunk=self.attn_chunk,
                remat=self.remat,
                dtype=self.dtype,
                name=f"swin_blocks_{i}",
            )(x, deterministic=deterministic)
            dim //= 2

        out_ch = 2 if self.error_matrix else 1
        x = Conv(dim, (3, 3), dtype=self.dtype, name="conv1")(x)
        x = gelu_exact(x)
        x = Conv(out_ch, (1, 1), dtype=self.dtype, name="conv2")(x)
        return x.transpose(0, 3, 1, 2)  # NCHW


# ---------------------------------------------------------------------------
# Cross attention between towers
# ---------------------------------------------------------------------------


class CrossAttentionBlock(nn.Module):
    """LN(q), LN(kv) -> multi-head cross attention -> q + gamma * out with
    gamma init 0 so the towers start decoupled (reference: SwinWNet.py:764-783).

    Matches torch nn.MultiheadAttention numerics: packed in-projection,
    q scaled by head_dim**-0.5 after projection. Operates on [B, L, C]
    full-token sequences (callers flatten grids)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv):
        B, Lq, C = q.shape
        nH = self.num_heads
        hd = C // nH

        qn = LayerNorm(dtype=self.dtype, name="norm_q")(q)
        kvn = LayerNorm(dtype=self.dtype, name="norm_kv")(kv)

        # torch MHA in_proj: xavier_uniform over the packed [3C, C] weight
        in_proj_w = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (C, 3 * C), jnp.float32
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,), jnp.float32)

        qp = jnp.dot(qn.astype(self.dtype), in_proj_w[:, :C].astype(self.dtype), precision=matmul_precision(self.dtype)) + in_proj_b[:C]
        kp = (
            jnp.dot(kvn.astype(self.dtype), in_proj_w[:, C : 2 * C].astype(self.dtype), precision=matmul_precision(self.dtype))
            + in_proj_b[C : 2 * C]
        )
        vp = (
            jnp.dot(kvn.astype(self.dtype), in_proj_w[:, 2 * C :].astype(self.dtype), precision=matmul_precision(self.dtype))
            + in_proj_b[2 * C :]
        )

        Lk = kv.shape[1]
        qp = qp.reshape(B, Lq, nH, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
        kp = kp.reshape(B, Lk, nH, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, Lk, nH, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", qp, kp, preferred_element_type=jnp.float32, precision=matmul_precision(self.dtype))
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vp, preferred_element_type=jnp.float32, precision=matmul_precision(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C).astype(self.dtype)
        out = Dense(C, dtype=self.dtype, name="out_proj")(out)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return q + gamma * out


class MultiScaleCrossAttention(nn.Module):
    """Zip of CrossAttentionBlocks over skip lists (reference: SwinWNet.py:785-797).
    Accepts [B, H, W, C] grids, flattens to sequences internally."""

    dims: Sequence[int]
    heads: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, target_skips, source_skips):
        out = []
        for i, (t, s) in enumerate(zip(target_skips, source_skips)):
            B, H, W, C = t.shape
            t_seq = t.reshape(B, H * W, C)
            s_seq = s.reshape(B, s.shape[1] * s.shape[2], s.shape[3])
            y = CrossAttentionBlock(
                dim=self.dims[i], num_heads=self.heads[i], dtype=self.dtype, name=f"blocks_{i}"
            )(t_seq, s_seq)
            out.append(y.reshape(B, H, W, C))
        return out
