"""Compute-mode consistency: bfloat16 serving mode vs fp32, remat parity,
and the regression utility against the published results files."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinwnet_tpu.data.generation import synthesize_dataset
from swinwnet_tpu.models import SwinWNet

TINY = dict(
    in_chans=1,
    error_matrix=True,
    embed_dim=12,
    depths=(1, 1, 1, 1),
    num_heads=(3, 6, 12, 24),
    window_size=5,
)


@pytest.mark.slow
def test_bf16_segmentation_agrees_with_fp32():
    """bf16 is the throughput mode; binarized masks must agree with fp32 on
    the overwhelming majority of pixels."""
    H = W = 40
    images, _ = synthesize_dataset(2, H=H, W=W, seed=3)
    x = jnp.asarray(images[:, None], jnp.float32)
    from swinwnet_tpu.ops.norms import ensure_2ch

    x = ensure_2ch(x)

    m32 = SwinWNet(**TINY, dtype=jnp.float32)
    m16 = SwinWNet(**TINY, dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), x[:1])

    seg32, _ = m32.apply(v, x, method=SwinWNet.segment_1)
    seg16, _ = m16.apply(v, x, method=SwinWNet.segment_1)
    mask32 = np.asarray(jax.nn.sigmoid(seg32)) >= 0.5
    mask16 = np.asarray(jax.nn.sigmoid(seg16.astype(jnp.float32))) >= 0.5
    agreement = (mask32 == mask16).mean()
    assert agreement > 0.99, f"bf16/fp32 mask agreement {agreement:.4f}"


def test_remat_model_matches():
    H = W = 40
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, H, W)), jnp.float32)
    m = SwinWNet(**TINY)
    mr = SwinWNet(**TINY, remat=True)
    v = m.init(jax.random.PRNGKey(0), x)
    seg, _ = m.apply(v, x, method=SwinWNet.segment_1)
    seg_r, _ = mr.apply(v, x, method=SwinWNet.segment_1)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_r), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/results"), reason="published results not available"
)
def test_regression_loader_matches_survey_stats():
    from swinwnet_tpu.evalharness import compare_with_baseline, load_baseline_arrays

    arrs = load_baseline_arrays(
        "/root/reference/results/SwinUnet_pretrain_segmentation_metrics.json"
    )
    iou = arrs["metrics_50/IoU"]
    assert len(iou) == 1200
    np.testing.assert_allclose(iou.mean(), 0.7970, atol=1e-3)

    rec = compare_with_baseline(iou, iou)
    assert rec["pass"]
    rec = compare_with_baseline(iou * 0.8, iou)
    assert not rec["pass"]


def test_attn_chunk_matches_unchunked():
    """lax.map-chunked attention must match the monolithic path to fp32
    reduction-order noise (same math over window chunks; XLA may fuse the
    bcast formulation's VPU reductions differently under lax.map, shifting
    a handful of elements by ~1e-5 relative)."""
    H = W = 40
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2, H, W)), jnp.float32)
    m = SwinWNet(**TINY)
    mc = SwinWNet(**TINY, attn_chunk=16)
    v = m.init(jax.random.PRNGKey(0), x)
    seg, _ = m.apply(v, x, method=SwinWNet.segment_1)
    seg_c, _ = mc.apply(v, x, method=SwinWNet.segment_1)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_c), rtol=1e-4, atol=1e-5)

    up, _ = m.apply(v, x, m.apply(v, x, method=SwinWNet.segment_1)[1], method=SwinWNet.upscale)
    up_c, _ = mc.apply(v, x, mc.apply(v, x, method=SwinWNet.segment_1)[1], method=SwinWNet.upscale)
    np.testing.assert_allclose(np.asarray(up), np.asarray(up_c), rtol=1e-4, atol=1e-5)
