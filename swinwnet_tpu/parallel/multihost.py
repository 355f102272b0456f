"""Multi-host (DCN) initialization.

Single-host multi-chip needs nothing beyond `make_mesh`. For pod slices
spanning hosts, call `initialize_multihost()` once per process before any
backend use; JAX then exposes the global device set and the same 1-D data
mesh spans ICI within a slice and DCN across slices. Collectives in our
steps are inserted by GSPMD, so no code changes are needed beyond the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize with explicit or env-based configuration.

    Returns False (no-op) when the runtime is single-process with no
    coordinator configured; returns True after the distributed service is up.
    Tested in tests/test_multihost.py including a real coordinator bring-up.
    """
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_batch_slice(
    global_batch: int,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> slice:
    """This process's contiguous slice of a global batch.

    Data loading is per-host: each process feeds its local devices its slice,
    and `shard_batch` over the global mesh stitches them into one logical
    array. The global batch must divide evenly (static shapes everywhere)."""
    n = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    per = global_batch // n
    return slice(pid * per, (pid + 1) * per)
