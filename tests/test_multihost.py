"""Multi-host (DCN) init layer: the no-op contract, the batch-slice helper,
and a real `jax.distributed` service bring-up in a subprocess (degenerate
1-process "cluster" — the same code path a pod slice runs per host, without
needing multiple hosts)."""

import subprocess
import sys

import numpy as np

from swinwnet_tpu.parallel.multihost import initialize_multihost, process_batch_slice


def test_noop_when_single_process():
    assert initialize_multihost() is False
    assert initialize_multihost(num_processes=1) is False


def test_process_batch_slice_math():
    # 100 samples over 4 processes: contiguous equal slices
    assert process_batch_slice(100, num_processes=4, process_id=0) == slice(0, 25)
    assert process_batch_slice(100, num_processes=4, process_id=3) == slice(75, 100)
    # indivisible batch is rejected (static shapes everywhere)
    import pytest

    with pytest.raises(ValueError):
        process_batch_slice(10, num_processes=4, process_id=0)


def test_distributed_initialize_single_process_cluster():
    """Bring up the real jax.distributed coordinator + client (1-process
    cluster) in a subprocess so the global state does not leak into this
    test session; run a sharded psum through the initialized runtime."""
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
from swinwnet_tpu.parallel.multihost import initialize_multihost
ok = initialize_multihost(
    coordinator_address="localhost:57431", num_processes=1, process_id=0
)
assert ok is True
assert jax.process_count() == 1
import jax.numpy as jnp
from swinwnet_tpu.parallel import make_mesh, shard_batch
mesh = make_mesh(4)
x = shard_batch(jnp.arange(8.0).reshape(8, 1), mesh)
total = float(jax.jit(lambda v: v.sum())(x))
assert total == 28.0, total
print("MULTIHOST_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "MULTIHOST_OK" in out.stdout, out.stdout + out.stderr
