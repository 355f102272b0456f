"""Device-mesh construction and sharding rules.

The reference is single-device eager PyTorch (SURVEY.md §2.3: no
DataParallel/DDP/distributed anywhere). The TPU framework makes batch data
parallelism first-class: a 1-D `Mesh(('data',))` over ICI, params replicated,
the batch axis sharded. The model (~29M params) fits trivially per chip, so
DP is the strategy that pays; windows are embarrassingly parallel inside each
shard (the natural "sequence parallelism" of Swin is the window axis, which
rides inside the batched attention einsum).

All jitted steps in pipelines/ and train/ are pure functions of (params,
batch), so `jax.jit` + these shardings is the entire distribution story — XLA
inserts the psum for the loss/grad reductions.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over the first `n_devices` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding spec: [B, ...] split over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a [B, ...] pytree with the batch axis sharded over the mesh.
    B must be divisible by the mesh size (see `pad_to_multiple`)."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(array, multiple: int, axis: int = 0):
    """Pad the batch axis up to a multiple of the mesh size (static shapes for
    XLA). Returns (padded, original_size)."""
    n = array.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return array, n
    pad_widths = [(0, 0)] * array.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(np.asarray(array), pad_widths, mode="edge"), n
