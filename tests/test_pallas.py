"""Fused window-MSA Pallas kernel: interpret-mode correctness vs the XLA
reference implementation (real-TPU execution is covered by bench/microbench
and the flagged parity suite)."""

import numpy as np
import pytest

from swinwnet_tpu.ops.pallas import fused_window_attention, window_attention_reference


@pytest.mark.parametrize("C,nH,Wt", [(48, 3, 10), (96, 6, 7), (384, 24, 3)])
def test_interpret_matches_reference(C, nH, Wt):
    rng = np.random.default_rng(C)
    N = 25
    x = rng.normal(size=(Wt, N, C)).astype(np.float32)
    wqkv = rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.1
    bqkv = rng.normal(size=(3 * C,)).astype(np.float32) * 0.1
    bias = rng.normal(size=(nH, N, N)).astype(np.float32) * 0.1
    wproj = rng.normal(size=(C, C)).astype(np.float32) * 0.1
    bproj = rng.normal(size=(C,)).astype(np.float32) * 0.1

    want = np.asarray(window_attention_reference(x, wqkv, bqkv, bias, wproj, bproj, nH))
    got = np.asarray(
        fused_window_attention(x, wqkv, bqkv, bias, wproj, bproj, nH, block_windows=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_matches_flax_window_attention():
    """Kernel math == models.layers.WindowAttention (incl. rel-pos gather)."""
    import jax
    import jax.numpy as jnp

    from swinwnet_tpu.models.layers import WindowAttention, relative_position_index

    C, nH, N, Wt = 48, 3, 25, 6
    mod = WindowAttention(dim=C, window_size=5, num_heads=nH)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(Wt, N, C)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(mod.apply(variables, x))

    p = variables["params"]
    table = np.asarray(p["relative_position_bias_table"])
    rpi = relative_position_index(5)
    bias = table[rpi.reshape(-1)].reshape(N, N, nH).transpose(2, 0, 1)

    got = np.asarray(
        fused_window_attention(
            x,
            np.asarray(p["qkv"]["kernel"]),
            np.asarray(p["qkv"]["bias"]),
            bias.astype(np.float32),
            np.asarray(p["proj"]["kernel"]),
            np.asarray(p["proj"]["bias"]),
            nH,
            block_windows=8,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
