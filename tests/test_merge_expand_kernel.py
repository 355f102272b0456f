"""Parity tests for the fused PatchMerging / PatchExpanding Pallas kernels
(ops/pallas/merge_expand.py) against the flax module math, in interpret mode
(CPU). Geometries cover every site the serving pipeline hits (reference:
SwinWNet.py:282-316 merge, :390-412 expand), including the odd-H rows the
published 250x480 geometry produces at L0 (125 rows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.models.layers import PatchExpanding, PatchMerging
from swinwnet_tpu.ops.pallas.merge_expand import (
    expand_supported,
    merge_supported,
    patch_expand_pallas,
    patch_merge_pallas,
)

# (H, W, C): every merge site in the published pipeline + a small odd-W case
MERGE_GEOMS = [(125, 240, 48), (63, 120, 96), (32, 60, 192), (10, 16, 8)]
# expand sites: decoder ups + the two SR-head expands (SR1 shrunk to keep CPU
# interpret time sane — the kernel blocks over W, so width is the only axis
# that changes the code path and 96 exercises multi-block grids)
EXPAND_GEOMS = [(16, 30, 384), (32, 60, 192), (63, 120, 96), (125, 96, 48), (50, 96, 24)]


def _tol(dtype):
    return dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("geom", MERGE_GEOMS)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_merge_parity(geom, dtype):
    H, W, C = geom
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)), dtype)
    mod = PatchMerging(dim=C, dtype=dtype)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    p = params["params"]
    got = patch_merge_pallas(
        x, p["norm"]["scale"], p["norm"]["bias"], p["reduction"]["kernel"], True
    )
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **_tol(dtype)
    )


@pytest.mark.parametrize("geom", EXPAND_GEOMS)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_expand_parity(geom, dtype):
    H, W, C = geom
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)), dtype)
    mod = PatchExpanding(dim=C, dtype=dtype)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    p = params["params"]
    got = patch_expand_pallas(
        x, p["expand"]["kernel"], p["norm"]["scale"], p["norm"]["bias"], True
    )
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **_tol(dtype)
    )


def test_merge_grads_match_module():
    """custom-VJP backward (XLA recompute) == module gradients, fp32."""
    H, W, C = 10, 16, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, H, W, C)), jnp.float32)
    mod = PatchMerging(dim=C, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    p = params["params"]

    def via_module(x, s, b, w):
        pp = {"params": {"norm": {"scale": s, "bias": b}, "reduction": {"kernel": w}}}
        return jnp.sum(jnp.square(mod.apply(pp, x)))

    def via_kernel(x, s, b, w):
        return jnp.sum(jnp.square(patch_merge_pallas(x, s, b, w, True)))

    args = (x, p["norm"]["scale"], p["norm"]["bias"], p["reduction"]["kernel"])
    g_mod = jax.grad(via_module, argnums=(0, 1, 2, 3))(*args)
    g_ker = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(*args)
    for gm, gk in zip(g_mod, g_ker):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gm), rtol=1e-4, atol=1e-5)


def test_expand_grads_match_module():
    H, W, C = 8, 16, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, H, W, C)), jnp.float32)
    mod = PatchExpanding(dim=C, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    p = params["params"]

    def via_module(x, w, s, b):
        pp = {"params": {"expand": {"kernel": w}, "norm": {"scale": s, "bias": b}}}
        return jnp.sum(jnp.square(mod.apply(pp, x)))

    def via_kernel(x, w, s, b):
        return jnp.sum(jnp.square(patch_expand_pallas(x, w, s, b, True)))

    args = (x, p["expand"]["kernel"], p["norm"]["scale"], p["norm"]["bias"])
    g_mod = jax.grad(via_module, argnums=(0, 1, 2, 3))(*args)
    g_ker = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(*args)
    for gm, gk in zip(g_mod, g_ker):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gm), rtol=1e-4, atol=1e-5)


def test_geometry_gate():
    assert not merge_supported(10, 15, 8)  # odd W
    # every serving-pipeline site admits a blocking at bf16 (itemsize 2)
    for h, w, c in MERGE_GEOMS[:3]:
        assert merge_supported(h, w, c, 2), (h, w, c)
    for h, w, c in [(16, 30, 384), (32, 60, 192), (63, 120, 96),
                    (125, 240, 48), (250, 480, 24)]:
        assert expand_supported(h, w, c, 2), (h, w, c)


@pytest.mark.slow
def test_model_forward_with_merge_kernels(monkeypatch):
    """End-to-end: a SwinWNet forward with SWINWNET_MERGE_KERNEL=1 (interpret
    mode off-TPU) routes every PatchMerging/PatchExpanding through the fused
    kernels and matches the inline XLA path."""
    from swinwnet_tpu.models.swin_wnet import SwinWNet

    tiny = dict(
        in_chans=1, error_matrix=True, embed_dim=12,
        depths=(1, 1, 1, 1), num_heads=(3, 6, 12, 24), window_size=5,
    )
    model = SwinWNet(**tiny)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (2, 2, 20, 20)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def seg(variables, x):
        out, _ = model.apply(variables, x, method=SwinWNet.segment_1)
        return out

    want = np.asarray(seg(variables, x))
    monkeypatch.setenv("SWINWNET_FUSED_INTERPRET", "1")
    monkeypatch.setenv("SWINWNET_MERGE_KERNEL", "1")

    @jax.jit
    def seg_k(variables, x):
        out, _ = model.apply(variables, x, method=SwinWNet.segment_1)
        return out

    got = np.asarray(seg_k(variables, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layernorm_kernel_parity(dtype):
    from swinwnet_tpu.models.layers import LayerNorm
    from swinwnet_tpu.ops.pallas.merge_expand import layernorm_pallas, ln_supported

    H, W, C = 125, 48, 48
    assert ln_supported(H, W, C, 2)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)), dtype)
    mod = LayerNorm(dtype=dtype)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    got = layernorm_pallas(x, params["params"]["scale"], params["params"]["bias"], True)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **_tol(dtype)
    )


def test_layernorm_kernel_grads():
    from swinwnet_tpu.models.layers import LayerNorm
    from swinwnet_tpu.ops.pallas.merge_expand import layernorm_pallas

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 10, 16, 8)), jnp.float32)
    mod = LayerNorm(dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    s, b = params["params"]["scale"], params["params"]["bias"]

    g_mod = jax.grad(
        lambda x, s, b: jnp.sum(
            jnp.square(mod.apply({"params": {"scale": s, "bias": b}}, x))
        ),
        argnums=(0, 1, 2),
    )(x, s, b)
    g_ker = jax.grad(
        lambda x, s, b: jnp.sum(jnp.square(layernorm_pallas(x, s, b, True))),
        argnums=(0, 1, 2),
    )(x, s, b)
    for gm, gk in zip(g_mod, g_ker):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gm), rtol=1e-4, atol=1e-5)
