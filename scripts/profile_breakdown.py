"""Per-stage / per-component timing breakdown of the flagship pipeline.

Times each piece as its own jitted function with the bench.py methodology
(data-dependency chaining + final host fetch). Not as exact as a fused
whole-pipeline profile (XLA can fuse across stage boundaries), but it names
the sinks, which is what PERFORMANCE.md needs.

Usage:  python scripts/profile_breakdown.py [B] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from swinwnet_tpu.models import SwinWNet
from swinwnet_tpu.models.layers import BasicLayer, Mlp, LayerNorm, WindowAttention
from swinwnet_tpu.ops.window import window_partition
from swinwnet_tpu.pipelines.inference import inference_stages
from swinwnet_tpu.ops.norms import denormalize_piecewise, ensure_2ch, normalize_piecewise

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DTYPE = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bfloat16") else jnp.float32
USE_PALLAS = os.environ.get("SWINWNET_PROFILE_PALLAS", "0") != "0"
ITERS = 3

rng = np.random.default_rng(0)


def timeit(name, fn, *args, iters=ITERS):
    """fn(*args) -> pytree; chained through a scalar data dependency."""
    jfn = jax.jit(lambda eps, *a: jnp.asarray(
        jax.tree_util.tree_reduce(
            lambda acc, t: acc + (t.astype(jnp.float32).sum() if hasattr(t, "astype") else 0.0),
            fn(*a), 0.0
        ), jnp.float32))
    eps = jnp.float32(0.0)
    out = jfn(eps, *args)
    _ = float(out)  # compile + warmup
    out = jfn(eps, *args)
    _ = float(out)
    t0 = time.perf_counter()
    acc = eps
    for _ in range(iters):
        acc = jfn(acc * 1e-30, *args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:55s} {dt*1e3:9.2f} ms  ({B/dt:8.1f} img/s)")
    return dt


def main():
    from swinwnet_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    print(f"B={B} dtype={DTYPE.__name__} device={jax.devices()[0].device_kind}")
    model = SwinWNet(
        in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
        num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192,
        use_pallas=USE_PALLAS, dtype=DTYPE,
    )
    x = jnp.asarray(rng.uniform(0, 1e3, (B, 2, 250, 480)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    total = timeit("FULL pipeline (8 stages)", lambda v, xx: inference_stages(model, v, xx)["images_masked_hr"], variables, x)

    # --- stage-level ---
    seg1 = jax.jit(lambda v, xx: model.apply(v, xx, method=SwinWNet.segment_1))
    seg_out, skips_seg = seg1(variables, x)
    seg_map = jax.nn.sigmoid(seg_out)
    masked = x * seg_map
    norm, params_norm = normalize_piecewise(masked)
    ups = jax.jit(lambda v, n, s: model.apply(v, n, s, method=SwinWNet.upscale))
    upscaled_norm, skips_sr = ups(variables, norm, skips_seg)
    upscaled_denorm = denormalize_piecewise(upscaled_norm, params_norm)
    seg2 = jax.jit(lambda v, u, s: model.apply(v, u, s, method=SwinWNet.segment_2))

    timeit("stage: segment_1", lambda v, xx: seg1(v, xx)[0], variables, x)
    timeit("stage: upscale", lambda v, n, s: ups(v, n, s)[0], variables, norm, skips_seg)
    timeit("stage: segment_2", lambda v, u, s: seg2(v, u, s)[0], variables, upscaled_denorm, skips_sr)
    timeit("stage: normalize+denorm+masks", lambda xx, sm: denormalize_piecewise(normalize_piecewise(xx * sm)[0][:, :, :250, :480], normalize_piecewise(xx * sm)[1]), x, seg_map)

    # --- component micro-benches at the real shapes ---
    def mk(mod, shape, **apply_kw):
        xx = jnp.asarray(rng.standard_normal(shape), DTYPE)
        v = mod.init(jax.random.PRNGKey(0), xx, **apply_kw)
        return mod, v, xx

    # finest-level encoder BasicLayer: [B,125,240,48] depth 2 heads 3
    for (h, w, c, nh, bb, lbl) in [
        (125, 240, 48, 3, B, "L0 enc  [125,240,48]"),
        (63, 120, 96, 6, B, "L1 enc  [63,120,96]"),
        (32, 60, 192, 12, B, "L2 enc  [32,60,192]"),
        (16, 30, 384, 24, B, "L3 enc  [16,30,384]"),
        (250, 480, 24, 3, B, "SRhead1 [250,480,24]"),
        (500, 960, 12, 3, min(B, 16), "SRhead2 [500,960,12]"),
    ]:
        mod = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=5, attn_chunk=8192,
                         use_pallas=USE_PALLAS, dtype=DTYPE)
        xx = jnp.asarray(rng.standard_normal((bb, h, w, c)), DTYPE)
        v = mod.init(jax.random.PRNGKey(0), xx)
        timeit(f"BasicLayer d2 B={bb} {lbl}", lambda vv, a: mod.apply(vv, a), v, xx)

    # pieces of the finest block
    h, w, c, nh = 125, 240, 48, 3
    xx = jnp.asarray(rng.standard_normal((B, h, w, c)), DTYPE)
    ln = LayerNorm(dtype=DTYPE)
    vln = ln.init(jax.random.PRNGKey(0), xx)
    timeit("  LayerNorm [B,125,240,48]", lambda vv, a: ln.apply(vv, a), vln, xx)

    mlp = Mlp(hidden=4 * c, out=c, dtype=DTYPE)
    vm = mlp.init(jax.random.PRNGKey(0), xx)
    timeit("  MLP 48->192->48", lambda vv, a: mlp.apply(vv, a), vm, xx)

    xw, _ = window_partition(xx, 5)
    attn = WindowAttention(dim=c, window_size=5, num_heads=nh, attn_chunk=8192, dtype=DTYPE)
    va = attn.init(jax.random.PRNGKey(0), xw)
    timeit(f"  WindowAttention chunked [{xw.shape[0]},25,48]", lambda vv, a: attn.apply(vv, a), va, xw)
    attn2 = WindowAttention(dim=c, window_size=5, num_heads=nh, attn_chunk=0, dtype=DTYPE)
    timeit(f"  WindowAttention unchunked [{xw.shape[0]},25,48]", lambda vv, a: attn2.apply(vv, a), va, xw)
    timeit("  window_partition+reverse", lambda a: window_partition(a, 5)[0], xx)

    # --- glue ops at the real shapes (round-3 lever sizing): the inter-level
    # [B,H,W,C] tensors are C-minor, so XLA lane-pads them 128/C-fold; these
    # rows price each relayout / resample that touches them ---
    from swinwnet_tpu.models.layers import PatchExpanding, PatchMerging, ScaleAwarePatchEmbed
    from swinwnet_tpu.ops.window import window_partition_cmajor, window_reverse_cmajor

    for (h, w, c, bb, lbl) in [
        (125, 240, 48, B, "L0  [125,240,48]"),
        (250, 480, 24, B, "SR1 [250,480,24]"),
        (500, 960, 12, min(B, 16), "SR2 [500,960,12]"),
    ]:
        xx = jnp.asarray(rng.standard_normal((bb, h, w, c)), DTYPE)
        timeit(f"  partition_cmajor B={bb} {lbl}", lambda a: window_partition_cmajor(a, 5)[0], xx)
        xc, (hp, wp) = window_partition_cmajor(xx, 5)
        timeit(f"  reverse_cmajor   B={bb} {lbl}", lambda a: window_reverse_cmajor(a, 5, hp, wp), xc)

    for (h, w, c, bb, lbl) in [(125, 240, 48, B, "L0"), (63, 120, 96, B, "L1")]:
        xx = jnp.asarray(rng.standard_normal((bb, h, w, c)), DTYPE)
        pm = PatchMerging(dim=c, dtype=DTYPE)
        vpm = pm.init(jax.random.PRNGKey(0), xx)
        timeit(f"  PatchMerging {lbl} [{h},{w},{c}]", lambda vv, a: pm.apply(vv, a), vpm, xx)

    for (h, w, c, bb, lbl) in [(250, 480, 24, B, "SR1->SR2"), (125, 240, 48, B, "dec L0")]:
        xx = jnp.asarray(rng.standard_normal((bb, h, w, c)), DTYPE)
        pe = PatchExpanding(dim=c, dtype=DTYPE)
        vpe = pe.init(jax.random.PRNGKey(0), xx)
        timeit(f"  PatchExpanding {lbl} [{h},{w},{c}]", lambda vv, a: pe.apply(vv, a), vpe, xx)

    emb = ScaleAwarePatchEmbed(embed_dim=48, in_chans=2, dtype=DTYPE)
    xe = jnp.asarray(rng.standard_normal((B, 2, 250, 480)), jnp.float32)
    ve = emb.init(jax.random.PRNGKey(0), xe)
    timeit("  ScaleAwarePatchEmbed [B,2,250,480]", lambda vv, a: emb.apply(vv, a), ve, xe)

    print(f"\nFULL: {total*1e3:.1f} ms -> {B/total:.1f} img/s")


if __name__ == "__main__":
    main()
