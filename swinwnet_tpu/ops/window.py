"""Window partition / reverse and shifted-window attention masks.

Pure static reshapes: under `jit` the token-grid shape is a compile-time
constant, so the reference's dynamic pad-to-multiple logic
(SwinWNet.py:86-121) becomes Python integer arithmetic at trace time and XLA
sees only fixed-shape pads and transposes (which it folds into layout changes).

The SW-MSA mask (SwinWNet.py:123-149) is likewise static per (H, W, ws, ss)
and is computed once in numpy with an LRU cache. Note: the reference's
`compute_mask` is dead code (shift_size is hard-coded 0, SwinWNet.py:328) and
carries a broadcasting bug (`unsqueeze(1) - unsqueeze(0)` yields [nW, nW, N]
instead of [nW, N, N]); we implement the standard Swin semantics
([nW, N, N], pairwise region-id difference) so shifted windows actually work.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window_size: int):
    """[B, H, W, C] -> ([B * nW, ws*ws, C], (Hp, Wp)) with zero padding.

    Equivalent to SwinWNet.py:86-106 (partition) followed by the token flatten
    at SwinWNet.py:255.
    """
    B, H, W, C = x.shape
    ws = window_size
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    return x, (Hp, Wp)


def window_reverse(windows: jnp.ndarray, window_size: int, Hp: int, Wp: int) -> jnp.ndarray:
    """[B * nW, ws*ws, C] -> [B, Hp, Wp, C] (SwinWNet.py:108-121)."""
    ws = window_size
    nW = (Hp // ws) * (Wp // ws)
    B = windows.shape[0] // nW
    C = windows.shape[-1]
    x = windows.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x


def window_partition_nmajor(x: jnp.ndarray, window_size: int):
    """[B, H, W, C] -> ([ws*ws, B * nW, C], (Hp, Wp)): token-slot-major
    window layout for the wide-lane fused block kernel, which wants the
    *window* axis in the lane dimension (ops/pallas/swin_block.py). Same
    relayout cost class as `window_partition` — one transpose per layer."""
    B, H, W, C = x.shape
    ws = window_size
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(2, 4, 0, 1, 3, 5).reshape(ws * ws, -1, C)
    return x, (Hp, Wp)


def window_reverse_nmajor(windows: jnp.ndarray, window_size: int, Hp: int, Wp: int) -> jnp.ndarray:
    """[ws*ws, B * nW, C] -> [B, Hp, Wp, C] (inverse of
    `window_partition_nmajor`)."""
    ws = window_size
    nW = (Hp // ws) * (Wp // ws)
    B = windows.shape[1] // nW
    C = windows.shape[-1]
    x = windows.reshape(ws, ws, B, Hp // ws, Wp // ws, C)
    x = x.transpose(2, 3, 0, 4, 1, 5).reshape(B, Hp, Wp, C)
    return x


def window_partition_cmajor(x: jnp.ndarray, window_size: int):
    """[B, H, W, C] -> ([C, ws*ws, B * nW], (Hp, Wp)): channels-major window
    layout for the CST fused block kernel (ops/pallas/swin_block.py), which
    wants windows on the lane axis and token slots on sublanes — HBM padding
    is a uniform ~1.28x (25 -> 32 sublanes) regardless of C."""
    B, H, W, C = x.shape
    ws = window_size
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(5, 2, 4, 0, 1, 3).reshape(C, ws * ws, -1)
    return x, (Hp, Wp)


def window_reverse_cmajor(windows: jnp.ndarray, window_size: int, Hp: int, Wp: int) -> jnp.ndarray:
    """[C, ws*ws, B * nW] -> [B, Hp, Wp, C] (inverse of
    `window_partition_cmajor`)."""
    ws = window_size
    nW = (Hp // ws) * (Wp // ws)
    B = windows.shape[2] // nW
    C = windows.shape[0]
    x = windows.reshape(C, ws, ws, B, Hp // ws, Wp // ws)
    x = x.transpose(3, 4, 1, 5, 2, 0).reshape(B, Hp, Wp, C)
    return x


@functools.lru_cache(maxsize=64)
def _compute_mask_np(H: int, W: int, window_size: int, shift_size: int) -> np.ndarray:
    ws = window_size
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    Hp, Wp = H + pad_b, W + pad_r
    img_mask = np.zeros((Hp, Wp), dtype=np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -shift_size), slice(-shift_size, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift_size), slice(-shift_size, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[h, w] = cnt
            cnt += 1
    mask_windows = (
        img_mask.reshape(Hp // ws, ws, Wp // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask


def compute_mask(H: int, W: int, window_size: int, shift_size: int) -> jnp.ndarray:
    """Additive SW-MSA attention mask [nW, ws*ws, ws*ws] (SwinWNet.py:123-149)."""
    return jnp.asarray(_compute_mask_np(H, W, window_size, shift_size))
