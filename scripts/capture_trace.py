"""Capture a jax.profiler trace of a chosen component on the TPU.

Usage: python scripts/capture_trace.py [l0|full|srh1] [outdir]
Parse with scripts/parse_trace.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from swinwnet_tpu.models import SwinWNet
from swinwnet_tpu.models.layers import BasicLayer
from swinwnet_tpu.pipelines.inference import inference_stages

WHAT = sys.argv[1] if len(sys.argv) > 1 else "l0"
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_{WHAT}"
B = 64
DTYPE = jnp.bfloat16
rng = np.random.default_rng(0)


def main():
    use_pallas = os.environ.get("SWINWNET_TRACE_PALLAS", "1") != "0"
    if WHAT == "full":
        model = SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
            num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192, dtype=DTYPE,
            use_pallas=use_pallas,
        )
        x = jnp.asarray(rng.uniform(0, 1e3, (B, 2, 250, 480)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x[:1])
        fn = jax.jit(lambda vv, a: inference_stages(model, vv, a)["images_masked_hr"])
    else:
        h, w, c, nh = {"l0": (125, 240, 48, 3), "srh1": (250, 480, 24, 3)}[WHAT]
        mod = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=5, attn_chunk=8192, dtype=DTYPE,
                         use_pallas=use_pallas)
        x = jnp.asarray(rng.standard_normal((B, h, w, c)), DTYPE)
        v = mod.init(jax.random.PRNGKey(0), x)
        fn = jax.jit(mod.apply)

    out = fn(v, x)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))

    with jax.profiler.trace(OUT):
        for _ in range(3):
            out = fn(v, x)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out.astype(jnp.float32)))
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
