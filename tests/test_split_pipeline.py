"""Split-compiled pipeline must produce the same stages as the single graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.models import SwinWNet
from swinwnet_tpu.pipelines import STAGE_NAMES
from swinwnet_tpu.pipelines.inference import make_inference_fn
from swinwnet_tpu.pipelines.split import make_split_inference_fn

TINY = dict(
    in_chans=1,
    error_matrix=True,
    embed_dim=12,
    depths=(1, 1, 1, 1),
    num_heads=(3, 6, 12, 24),
    window_size=5,
)


@pytest.mark.slow
def test_split_matches_single_graph():
    model = SwinWNet(**TINY)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (2, 1, 40, 40)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 40, 40)))

    single = make_inference_fn(model)(variables, x)
    split = make_split_inference_fn(model)(variables, x)

    assert set(split) == set(STAGE_NAMES)
    for name in STAGE_NAMES:
        a, b = np.asarray(single[name]), np.asarray(split[name])
        denom = max(np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() / denom < 1e-5, name


@pytest.mark.slow
def test_viewer_session_split_flag():
    """The attribute-API wrapper and the viewer CLI expose the split-compiled
    path (`SwinWNetInference(split=True)`, `viewer --split`)."""
    from swinwnet_tpu.pipelines.inference import SwinWNetInference

    model = SwinWNet(**TINY)
    x = np.random.default_rng(1).uniform(0, 10, (1, 1, 40, 40)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 40, 40)))

    fused = SwinWNetInference(model, variables)
    split = SwinWNetInference(model, variables, split=True)
    out_a = np.asarray(fused(x))
    out_b = np.asarray(split(x))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-5, atol=1e-6)
    for name in STAGE_NAMES:
        assert getattr(split, name) is not None
