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
    No-op when the runtime is single-process."""
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
