"""Multi-chip sharding validation on the 8-device virtual CPU mesh:
sharded execution must produce the same numbers as single-device, and the
graft entry's multichip dry run must execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.models import SwinWNet
from swinwnet_tpu.parallel import make_mesh, pad_to_multiple, replicate, shard_batch

TINY = dict(
    in_chans=1,
    error_matrix=True,
    embed_dim=12,
    depths=(1, 1, 1, 1),
    num_heads=(3, 6, 12, 24),
    window_size=5,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple():
    x = np.ones((5, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (8, 3) and n == 5
    padded, n = pad_to_multiple(np.ones((8, 3)), 8)
    assert padded.shape == (8, 3) and n == 8


def test_sharded_forward_matches_single_device():
    model = SwinWNet(**TINY)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (8, 2, 40, 40)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def fwd(variables, x):
        seg, _ = model.apply(variables, x, method=SwinWNet.segment_1)
        return seg

    want = np.asarray(fwd(variables, x))

    mesh = make_mesh(8)
    variables_r = replicate(variables, mesh)
    x_s = shard_batch(x, mesh)
    got = np.asarray(fwd(variables_r, x_s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
