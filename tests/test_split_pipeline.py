"""Split-compiled pipeline must produce the same stages as the single graph."""

import jax
import jax.numpy as jnp
import numpy as np

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
