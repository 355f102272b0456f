"""Standalone single-tower models: SwinUNet (segmentation) and SwinUNetSR
(super-resolution) (reference: SwinWNet.py:533-592, 691-761).

Both take NCHW images and return NCHW outputs to keep the reference's public
API; internally everything is [B, H, W, C] token grids.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Bottleneck,
    ScaleAwarePatchEmbed,
    SegmentationHead,
    SwinDecoder,
    SwinEncoder,
    UpscalingHead,
)


class SwinUNet(nn.Module):
    """Segmentation tower: embed -> encoder -> bottleneck -> decoder -> seg head.

    Weights checkpoint: models/SwinUnet_binary_segmentation_diffraction.pth
    (BASELINE config #1).
    """

    patch_size: int = 2
    in_chans: int = 1
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
        self.patch_embed = ScaleAwarePatchEmbed(
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
        )
        self.encoder = SwinEncoder(**kw)
        self.bottleneck = Bottleneck(
            dim=self.embed_dim * 8,
            num_heads=self.num_heads[-1],
            window_size=self.window_size,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.decoder = SwinDecoder(**kw)
        self.head = SegmentationHead(
            embed_dim=self.embed_dim, patch_size=self.patch_size, dtype=self.dtype
        )

    def __call__(self, x, deterministic: bool = True):
        tokens, padded_res = self.patch_embed(x, scale_factor=1)
        skips = self.encoder(tokens, deterministic=deterministic)
        x_b = self.bottleneck(skips[-1], deterministic=deterministic)
        x_dec = self.decoder(x_b, skips, deterministic=deterministic)
        return self.head(x_dec, padded_res)


class SwinUNetSR(nn.Module):
    """SR tower: same trunk + UpscalingHead; output cropped to [.., 2H, 2W]
    (reference: SwinWNet.py:740-761). Weights checkpoint:
    models/SwinUnetSR_upscaler_for_segmented_diffraction.pth (BASELINE #2)."""

    patch_size: int = 2
    in_chans: int = 1
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
        self.patch_embed = ScaleAwarePatchEmbed(
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
        )
        self.encoder = SwinEncoder(**kw)
        self.bottleneck = Bottleneck(
            dim=self.embed_dim * 8,
            num_heads=self.num_heads[-1],
            window_size=self.window_size,
            use_pallas=self.use_pallas,
            attn_chunk=self.attn_chunk,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.decoder = SwinDecoder(**kw)
        self.head = UpscalingHead(
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
        result_H = x.shape[2] * 2
        result_W = x.shape[3] * 2
        tokens, _ = self.patch_embed(x, scale_factor=1)
        skips = self.encoder(tokens, deterministic=deterministic)
        x_b = self.bottleneck(skips[-1], deterministic=deterministic)
        x_dec = self.decoder(x_b, skips, deterministic=deterministic)
        upscaled = self.head(x_dec, deterministic=deterministic)
        return upscaled[:, :, :result_H, :result_W]
