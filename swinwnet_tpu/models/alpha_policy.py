"""RL alpha policy: a learned global gain on the SR output
(reference: RL_policy.py:4-24).

Conv(2->8, 3x3) + ReLU + global average pool + Linear(8->1) -> (mu, std=1);
`apply_action(sr_out, alpha) = sr_out * sigmoid(alpha)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, Dense


class AlphaPolicy(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, 2, H, W] NCHW (normalized masked LR pattern)
        x = x.transpose(0, 2, 3, 1)
        x = Conv(8, (3, 3), dtype=self.dtype, name="conv")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + Flatten
        mu = Dense(1, dtype=self.dtype, name="fc")(x)  # [B, 1]
        std = jnp.ones_like(mu)  # log_std fixed at 0 (RL_policy.py:17-19)
        return mu, std


def apply_action(sr_out, alpha):
    """sr_out: [B, C, H, W]; alpha: [B, 1] -> gain sigmoid(alpha) per sample."""
    a = alpha.reshape(-1, 1, 1, 1)
    return sr_out * jax.nn.sigmoid(a)
