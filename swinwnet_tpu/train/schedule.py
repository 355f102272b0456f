"""LR schedule: linear warmup then cosine decay, stepped per epoch
(reference: Segmentator_pretrain.py:138-151 — torch LambdaLR semantics where
the factor for epoch e is lr_lambda(e), held constant within the epoch).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, warmup_epochs: int, num_epochs: int, steps_per_epoch: int):
    """optax-compatible step -> lr schedule reproducing the reference's
    per-epoch warmup+cosine factor."""

    def schedule(step):
        epoch = jnp.floor_divide(step, max(steps_per_epoch, 1))
        warm = (epoch + 1.0) / max(warmup_epochs, 1)
        progress = (epoch - warmup_epochs) / max(num_epochs - warmup_epochs, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        factor = jnp.where(epoch < warmup_epochs, warm, cos)
        return base_lr * factor

    return schedule
