"""SwinWNet: dual-branch W-shaped network (reference: SwinWNet.py:800-957).

Two SwinUNet towers — segmentator and upscaler — share one scale-aware patch
embedding and are coupled by gamma-gated cross-attention at the two deepest
skip levels (dims [4C, 8C], heads [3, 3]; SwinWNet.py:843-848).

Three staged methods mirror the reference API:
  segment_1(x)                  LR segmentation, returns (logits, seg skips)
  upscale(x, skips_segmentator) 2x SR conditioned on seg skips, returns
                                (sr NCHW, upscaler skips)
  segment_2(x, skips_upscaler)  HR segmentation of the SR output via the
                                *shared* patch embedding at scale_factor=2

Invoke with `model.apply(vars, x, method=SwinWNet.segment_1)` or through the
jitted pipeline in `swinwnet_tpu.pipelines.inference`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Bottleneck,
    MultiScaleCrossAttention,
    ScaleAwarePatchEmbed,
    SegmentationHead,
    SwinDecoder,
    SwinEncoder,
    UpscalingHead,
)


class SwinWNet(nn.Module):
    patch_size: int = 2
    in_chans: int = 1
    error_matrix: bool = False
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 5
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    attn_chunk: int = 0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(
            embed_dim=self.embed_dim,
            depths=tuple(self.depths),
            num_heads=tuple(self.num_heads),
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
        )
        in_ch = self.in_chans + 1 if self.error_matrix else self.in_chans
        self.patch_embed = ScaleAwarePatchEmbed(
            patch_size=self.patch_size, in_chans=in_ch, embed_dim=self.embed_dim, dtype=self.dtype
        )

        self.segmentator_encoder = SwinEncoder(**kw)
        self.segmentator_bottleneck = Bottleneck(
            dim=self.embed_dim * 8,
            num_heads=self.num_heads[-1],
            window_size=self.window_size,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.segmentator_decoder = SwinDecoder(**kw)
        self.segmentator_head = SegmentationHead(
            embed_dim=self.embed_dim, patch_size=self.patch_size, dtype=self.dtype
        )

        self.ca_seg_to_sr = MultiScaleCrossAttention(
            dims=(self.embed_dim * 4, self.embed_dim * 8), heads=(3, 3), dtype=self.dtype
        )
        self.ca_sr_to_seg = MultiScaleCrossAttention(
            dims=(self.embed_dim * 4, self.embed_dim * 8), heads=(3, 3), dtype=self.dtype
        )

        self.upscaler_encoder = SwinEncoder(**kw)
        self.upscaler_bottleneck = Bottleneck(
            dim=self.embed_dim * 8,
            num_heads=self.num_heads[-1],
            window_size=self.window_size,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.upscaler_decoder = SwinDecoder(**kw)
        self.upscaler_head = UpscalingHead(
            error_matrix=self.error_matrix,
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            window_size=self.window_size,
            num_heads=3,
            depth=2,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop=self.drop,
            attn_drop=self.attn_drop,
            drop_path=self.drop_path,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
        )

    def __call__(self, x, deterministic: bool = True):
        """Full W pass (segment_1 -> upscale -> segment_2) so that `init`
        creates every tower's parameters. Pipelines call the staged methods."""
        seg, skips_seg = self.segment_1(x, deterministic=deterministic)
        up, skips_up = self.upscale(x, skips_seg, deterministic=deterministic)
        seg_hr, _ = self.segment_2(up, skips_up, deterministic=deterministic)
        return seg, up, seg_hr

    def segment_1(self, x, deterministic: bool = True):
        """LR segmentation (reference: SwinWNet.py:886-905)."""
        tokens, padded_res = self.patch_embed(x, scale_factor=1)
        skips = self.segmentator_encoder(tokens, deterministic=deterministic)
        x_b = self.segmentator_bottleneck(skips[-1], deterministic=deterministic)
        x_dec = self.segmentator_decoder(x_b, skips, deterministic=deterministic)
        seg = self.segmentator_head(x_dec, padded_res)
        return seg, skips

    def upscale(self, x, skips_segmentator, deterministic: bool = True):
        """2x super-resolution conditioned on segmentator skips
        (reference: SwinWNet.py:907-932)."""
        result_H = x.shape[2] * 2
        result_W = x.shape[3] * 2
        tokens, _ = self.patch_embed(x, scale_factor=1)
        skips_up = self.upscaler_encoder(tokens, deterministic=deterministic)

        ca = self.ca_seg_to_sr(
            [skips_up[-2], skips_up[-1]], [skips_segmentator[-2], skips_segmentator[-1]]
        )
        skips_up = list(skips_up)
        skips_up[-2], skips_up[-1] = ca

        x_b = self.upscaler_bottleneck(skips_up[-1], deterministic=deterministic)
        x_dec = self.upscaler_decoder(x_b, skips_up, deterministic=deterministic)
        upscaled = self.upscaler_head(x_dec, deterministic=deterministic)
        return upscaled[:, :, :result_H, :result_W], skips_up

    def segment_2(self, x, skips_upscaler, deterministic: bool = True):
        """HR segmentation of the SR output through the shared embedding at
        scale_factor=2 (reference: SwinWNet.py:934-957)."""
        tokens, padded_res = self.patch_embed(x, scale_factor=2)
        skips = self.segmentator_encoder(tokens, deterministic=deterministic)

        ca = self.ca_sr_to_seg(
            [skips[-2], skips[-1]], [skips_upscaler[-2], skips_upscaler[-1]]
        )
        skips = list(skips)
        skips[-2], skips[-1] = ca

        x_b = self.segmentator_bottleneck(skips[-1], deterministic=deterministic)
        x_dec = self.segmentator_decoder(x_b, skips, deterministic=deterministic)
        seg = self.segmentator_head(x_dec, padded_res, scale_factor=2)
        return seg, skips
