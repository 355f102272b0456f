"""Fused whole-Swin-block Pallas kernel (ops/pallas/swin_block.py).

Validates, in interpret mode on the CPU test backend:
* kernel output vs the fp32 XLA reference at every (C, nH) signature the
  pipeline instantiates — including the hd=32 decoder heads that round 1's
  window-MSA kernel could not compile;
* bf16 kernel error vs fp32 truth is bounded by the XLA bf16 serving path's
  own quantization error (same cast points — the fair yardstick);
* model-level routing: BasicLayer(use_pallas=True) matches the unfused
  layer and declares a byte-identical checkpoint tree.

Reference block semantics: SwinWNet.py:211-280 (shift 0, SwinWNet.py:328).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swinwnet_tpu.models.layers import BasicLayer
from swinwnet_tpu.ops.pallas.swin_block import (
    fused_swin_block,
    fused_swin_block_cst,
    fused_swin_block_wide,
    swin_block_reference,
)

N = 25  # window_size 5


def _make_args(rng, C, nH, dt):
    A = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    args = dict(
        ln1_s=jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
        ln1_b=A(C),
        wqkv=A(C, 3 * C),
        bqkv=A(3 * C),
        rel_bias=A(nH, N, N),
        wproj=A(C, C),
        bproj=A(C),
        ln2_s=jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
        ln2_b=A(C),
        w1=A(C, 4 * C),
        b1=A(4 * C),
        w2=A(4 * C, C),
        b2=A(C),
    )
    if dt != jnp.float32:
        for k in ("wqkv", "wproj", "w1", "w2"):
            args[k] = args[k].astype(dt)
    return args


# every (C, nH) signature the flagship pipeline instantiates:
# encoder 48/3 96/6 192/12 384/24 (hd16), decoder 384/12 192/6 96/3 (hd32),
# SR head 24/3 12/3 (hd8/hd4)
SIGNATURES = [(48, 3), (96, 6), (192, 12), (384, 24), (384, 12), (192, 6), (96, 3), (24, 3), (12, 3)]


@pytest.mark.parametrize("C,nH", SIGNATURES)
def test_fp32_matches_reference(C, nH):
    rng = np.random.default_rng(C * 31 + nH)
    Wt = 20
    x = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    out = fused_swin_block(
        x, *args.values(), num_heads=nH, window_tokens=N, block_windows=8, interpret=True
    )
    ref = swin_block_reference(x, *args.values(), num_heads=nH, window_tokens=N)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=5e-3 * float(jnp.abs(ref).max())
    )


def test_block_padding_path():
    """Wt not divisible by block_windows exercises the pad/trim path."""
    rng = np.random.default_rng(7)
    C, nH, Wt = 48, 3, 13
    x = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    out = fused_swin_block(
        x, *args.values(), num_heads=nH, window_tokens=N, block_windows=8, interpret=True
    )
    ref = swin_block_reference(x, *args.values(), num_heads=nH, window_tokens=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=2e-4)


@pytest.mark.parametrize("C,nH", [(48, 3), (384, 12)])
def test_bf16_error_bounded_by_serving_path(C, nH):
    """bf16 kernel deviation from fp32 truth must be of the same order as the
    XLA bf16 serving path's deviation (identical quantization points)."""
    rng = np.random.default_rng(C)
    Wt = 16
    xf = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args32 = _make_args(rng, C, nH, jnp.float32)
    ref32 = np.asarray(
        swin_block_reference(xf, *args32.values(), num_heads=nH, window_tokens=N), np.float32
    )

    args_bf = dict(args32)
    for k in ("wqkv", "wproj", "w1", "w2"):
        args_bf[k] = args_bf[k].astype(jnp.bfloat16)
    ker = np.asarray(
        fused_swin_block(
            xf.astype(jnp.bfloat16),
            *args_bf.values(),
            num_heads=nH,
            window_tokens=N,
            block_windows=8,
            interpret=True,
        ),
        np.float32,
    )
    err = np.abs(ker - ref32).max()
    scale = np.abs(ref32).max()
    assert err < 0.05 * scale + 0.05, (err, scale)


@pytest.mark.parametrize("C,nH", SIGNATURES)
def test_wide_fp32_matches_reference(C, nH):
    """Wide-lane variant (windows in the lane axis, token-slot-major I/O —
    the layout BasicLayer's fused stack actually uses)."""
    rng = np.random.default_rng(C * 17 + nH)
    Wt = 20
    x2 = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    ref = swin_block_reference(x2, *args.values(), num_heads=nH, window_tokens=N)
    x3 = jnp.transpose(x2.reshape(Wt, N, C), (1, 0, 2))
    out = fused_swin_block_wide(
        x3, *args.values(), num_heads=nH, block_windows=8, interpret=True
    )
    out2 = jnp.transpose(out, (1, 0, 2)).reshape(Wt * N, C)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref), rtol=0, atol=5e-3 * float(jnp.abs(ref).max())
    )


def test_wide_uneven_window_count():
    """Wt not divisible by block_windows pads/trims along the window axis."""
    rng = np.random.default_rng(3)
    C, nH, Wt = 48, 3, 37
    x2 = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    ref = swin_block_reference(x2, *args.values(), num_heads=nH, window_tokens=N)
    x3 = jnp.transpose(x2.reshape(Wt, N, C), (1, 0, 2))
    out = fused_swin_block_wide(
        x3, *args.values(), num_heads=nH, block_windows=16, interpret=True
    )
    out2 = jnp.transpose(out, (1, 0, 2)).reshape(Wt * N, C)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=0, atol=2e-4)


@pytest.mark.parametrize("C,nH", SIGNATURES)
def test_cst_fp32_matches_reference(C, nH):
    """Channels-major variant ([C, N, Wt] I/O, transposed weights — the
    layout the SR-head levels fuse with)."""
    rng = np.random.default_rng(C * 13 + nH)
    Wt = 20
    x2 = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    ref = swin_block_reference(x2, *args.values(), num_heads=nH, window_tokens=N)
    x3 = jnp.transpose(x2.reshape(Wt, N, C), (2, 1, 0))
    targs = dict(args)
    for k in ("wqkv", "w1", "w2"):  # wproj stays [in, out]
        targs[k] = jnp.swapaxes(args[k], 0, 1)
    out = fused_swin_block_cst(
        x3,
        *targs.values(),
        num_heads=nH,
        block_windows=8,
        score_chunk=min(8, C // nH),
        interpret=True,
    )
    out2 = jnp.transpose(out, (2, 1, 0)).reshape(Wt * N, C)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref), rtol=0, atol=5e-3 * float(jnp.abs(ref).max())
    )


def test_sr_level_routing_matches_unfused():
    """C=12 (SR-head level) routes through the channels-major kernel and
    matches the unfused layer."""
    os.environ["SWINWNET_FUSED_INTERPRET"] = "1"
    try:
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 25, 30, 12)), jnp.float32)
        m0 = BasicLayer(dim=12, depth=2, num_heads=3, window_size=5, use_pallas=False)
        m1 = BasicLayer(dim=12, depth=2, num_heads=3, window_size=5, use_pallas=True)
        v = m0.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m0.apply(v, x)), np.asarray(m1.apply(v, x)), rtol=0, atol=5e-5
        )
    finally:
        del os.environ["SWINWNET_FUSED_INTERPRET"]


def test_model_routing_matches_unfused():
    """BasicLayer(use_pallas=True) must produce the unfused layer's output
    and an identical param tree (checkpoint compatibility)."""
    os.environ["SWINWNET_FUSED_INTERPRET"] = "1"
    try:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 25, 30, 48)), jnp.float32)
        m0 = BasicLayer(dim=48, depth=2, num_heads=3, window_size=5, use_pallas=False)
        m1 = BasicLayer(dim=48, depth=2, num_heads=3, window_size=5, use_pallas=True)
        v0 = m0.init(jax.random.PRNGKey(0), x)
        v1 = m1.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        for p0, p1 in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
            np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        y0 = np.asarray(m0.apply(v0, x))
        y1 = np.asarray(m1.apply(v0, x))
        np.testing.assert_allclose(y0, y1, rtol=0, atol=5e-5)
    finally:
        del os.environ["SWINWNET_FUSED_INTERPRET"]


def test_padded_grid_fused_matches():
    """A grid that doesn't tile by the window fuses via the channels-major
    kernel's in-kernel pad mask and must match the unfused output (which
    re-zeroes pad slots post-LN)."""
    os.environ["SWINWNET_FUSED_INTERPRET"] = "1"
    try:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 23, 31, 48)), jnp.float32)
        m0 = BasicLayer(dim=48, depth=1, num_heads=3, window_size=5, use_pallas=False)
        m1 = BasicLayer(dim=48, depth=1, num_heads=3, window_size=5, use_pallas=True)
        v = m0.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m0.apply(v, x)), np.asarray(m1.apply(v, x)), rtol=0, atol=1e-6
        )
    finally:
        del os.environ["SWINWNET_FUSED_INTERPRET"]


def test_rowmajor_mask_matches_reference_zeroed():
    """Row-major kernel with a pad mask == reference run on post-LN-zeroed
    pad slots (the pad-after-norm semantics, SwinWNet.py:243-253): build the
    expected output by masking inside a modified reference."""
    rng = np.random.default_rng(7)
    C, nH, Wt = 192, 12, 6
    x2 = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    mask = (rng.uniform(size=(Wt * N, 1)) > 0.3).astype(np.float32)
    mask[: N] = 1.0  # keep at least one fully-real window
    maskj = jnp.asarray(mask)

    # reference with the same post-LN1 zeroing applied manually
    import swinwnet_tpu.ops.pallas.swin_block as sb

    x32 = x2
    y = sb._ln(x32, args["ln1_s"], args["ln1_b"]) * maskj
    qkv = y @ args["wqkv"] + args["bqkv"]
    hd = C // nH
    q = qkv[:, :C].reshape(Wt, N, nH, hd).transpose(0, 2, 1, 3)
    k = qkv[:, C : 2 * C].reshape(Wt, N, nH, hd).transpose(0, 2, 1, 3)
    v = qkv[:, 2 * C :].reshape(Wt, N, nH, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("whnd,whmd->whnm", q, k) * (hd**-0.5) + args["rel_bias"][None]
    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum("whnm,whmd->whnd", attn, v).transpose(0, 2, 1, 3).reshape(Wt * N, C)
    x32 = x32 + o @ args["wproj"] + args["bproj"]
    y2 = sb._ln(x32, args["ln2_s"], args["ln2_b"])
    hmid = jax.nn.gelu(y2 @ args["w1"] + args["b1"], approximate=False)
    ref = x32 + hmid @ args["w2"] + args["b2"]

    out = fused_swin_block(
        x2, *args.values(), num_heads=nH, window_tokens=N,
        pad_mask=maskj, block_windows=2, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=5e-4 * float(jnp.abs(ref).max())
    )


def test_rowmajor_mlp_hidden_chunking():
    """Forcing a large BW triggers the hidden-dim-chunked MLP path; output
    must match the unchunked reference exactly (fp32, same contraction
    order within each chunk)."""
    rng = np.random.default_rng(8)
    C, nH, Wt = 384, 24, 16
    x2 = jnp.asarray(rng.standard_normal((Wt * N, C)), jnp.float32)
    args = _make_args(rng, C, nH, jnp.float32)
    ref = swin_block_reference(x2, *args.values(), num_heads=nH, window_tokens=N)
    # BW=16 -> R=400 -> fp32 hidden 400x1536 = 2.46 MB > 2 MB threshold
    # -> hchunk 1280 (one full + one 256 tail chunk)
    out = fused_swin_block(
        x2, *args.values(), num_heads=nH, window_tokens=N,
        block_windows=16, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=5e-4 * float(jnp.abs(ref).max())
    )


@pytest.mark.parametrize("C,nH", [(192, 12), (384, 24), (384, 12), (192, 6)])
def test_deep_level_routing_padded_grid(C, nH):
    """C=192/384 levels (round 3) route through the masked row-major kernel
    on non-tiling grids and must match the unfused layer. (Deep fusion is
    default-off — measured slower end to end than XLA at these levels — so
    the gate env is set explicitly here.)"""
    os.environ["SWINWNET_FUSED_INTERPRET"] = "1"
    os.environ["SWINWNET_FUSED_DEEP"] = "1"
    try:
        rng = np.random.default_rng(C + nH)
        x = jnp.asarray(rng.standard_normal((1, 8, 15, C)), jnp.float32)  # 8 -> pad 10
        m0 = BasicLayer(dim=C, depth=1, num_heads=nH, window_size=5, use_pallas=False)
        m1 = BasicLayer(dim=C, depth=1, num_heads=nH, window_size=5, use_pallas=True)
        v = m0.init(jax.random.PRNGKey(0), x)
        y0 = np.asarray(m0.apply(v, x))
        y1 = np.asarray(m1.apply(v, x))
        np.testing.assert_allclose(y0, y1, rtol=0, atol=5e-4 * float(np.abs(y0).max()))
    finally:
        del os.environ["SWINWNET_FUSED_INTERPRET"]
        del os.environ["SWINWNET_FUSED_DEEP"]


@pytest.mark.slow
@pytest.mark.parametrize("C,nH,grid", [(48, 3, (8, 15)), (192, 12, (8, 15)), (12, 3, (10, 15))])
def test_fused_gradients_match_unfused(C, nH, grid):
    """use_pallas=True is trainable (round 3): the custom-VJP backward
    (XLA recompute of the kernel math) must match the unfused layer's
    gradients wrt params and input on padded and exact grids."""
    os.environ["SWINWNET_FUSED_INTERPRET"] = "1"
    os.environ["SWINWNET_FUSED_DEEP"] = "1"  # exercise the C=192 fused route
    try:
        rng = np.random.default_rng(C)
        x = jnp.asarray(rng.standard_normal((1, *grid, C)), jnp.float32)
        ct = jnp.asarray(rng.standard_normal((1, *grid, C)), jnp.float32)
        m0 = BasicLayer(dim=C, depth=1, num_heads=nH, window_size=5, use_pallas=False)
        m1 = BasicLayer(dim=C, depth=1, num_heads=nH, window_size=5, use_pallas=True)
        v = m0.init(jax.random.PRNGKey(0), x)

        def loss(m):
            def f(params, x):
                return jnp.sum(m.apply({"params": params}, x) * ct)
            return jax.grad(f, argnums=(0, 1))(v["params"], x)

        g0, gx0 = loss(m0)
        g1, gx1 = loss(m1)
        scale = float(np.abs(np.asarray(gx0)).max())
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=0, atol=1e-4 * scale)
        for p0, p1 in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            s = max(float(np.abs(np.asarray(p0)).max()), 1e-9)
            np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=0, atol=2e-4 * s)
    finally:
        del os.environ["SWINWNET_FUSED_INTERPRET"]
        del os.environ["SWINWNET_FUSED_DEEP"]


def test_fused_gate_routing_matrix():
    """The fused-kernel gate's routing rules (round 3):

    * tiny window counts (< one 128-lane tile) stay on XLA on hardware —
      Mosaic rejects sub-128 lane blocks ("unsupported shape cast" at BW=8,
      observed on a v5e) — but still fuse under the interpret env so these
      CPU tests can exercise the kernels on small grids;
    * fp32 caps the cmajor route at C<=48 (the C=96 fori-loop kernel's
      scoped-VMEM stack exceeds the 16 MB limit in fp32; bf16 fuses).
    """

    def route(dim, nH, dtype, shape, env=None):
        env = env or {}
        os.environ.update(env)
        try:
            m = BasicLayer(dim=dim, depth=1, num_heads=nH, window_size=5,
                           use_pallas=True, dtype=dtype)
            x = jnp.zeros(shape, dtype)
            v = m.init(jax.random.PRNGKey(0), x)
            jxp = str(jax.make_jaxpr(lambda p, a: m.apply(p, a))(v, x))
            return "fused" if ("custom_vjp" in jxp or "pallas" in jxp) else "xla"
        finally:
            for k in env:
                os.environ.pop(k, None)

    interp = {"SWINWNET_FUSED_INTERPRET": "1"}
    # no interpret env on the CPU test backend -> XLA everywhere
    assert route(48, 3, jnp.float32, (1, 50, 60, 48)) == "xla"
    # interpret env: small grids fuse (this file's kernel tests depend on it)
    assert route(48, 3, jnp.float32, (1, 10, 15, 48), interp) == "fused"
    # fp32 C=96 -> XLA (scoped-VMEM cap); bf16 C=96 fuses
    assert route(96, 6, jnp.float32, (1, 50, 60, 96), interp) == "xla"
    assert route(96, 6, jnp.bfloat16, (1, 50, 60, 96), interp) == "fused"


