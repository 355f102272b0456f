"""Port a PyTorch .pth checkpoint to a native orbax checkpoint.

    python scripts/port_checkpoint.py SwinWNet_diffraction+error_matrix.pth out_dir/

Applies the GUI loader conveniences (state-dict unwrap, `module.` strip,
error-matrix sniffing — swinwnet_viewer_gui.py:129-151), converts to the flax
tree, validates it against a freshly initialized model of the sniffed
configuration, and saves with utils.checkpoint.

Note: the published `.pth` files in the reference checkout are git-LFS
pointer stubs (SURVEY.md §2.1); run this against real downloads from the
GitHub release / HF hub.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("pth", help="PyTorch checkpoint path")
    parser.add_argument("out", help="output orbax checkpoint directory")
    parser.add_argument("--skip-validate", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from swinwnet_tpu.apps.viewer import load_model_any
    from swinwnet_tpu.utils import save_checkpoint

    model, variables, error_matrix = load_model_any(args.pth)
    n_params = sum(p.size for p in jax.tree.leaves(variables))
    print(f"converted {args.pth}: {n_params/1e6:.1f}M params, error_matrix={error_matrix}")

    if not args.skip_validate:
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2 if error_matrix else 1, 20, 20)))
        want = {
            "/".join(map(str, p))
            for p, _ in jax.tree_util.tree_flatten_with_path(ref["params"])[0]
        }
        got = {
            "/".join(map(str, p))
            for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        }
        missing, extra = want - got, got - want
        if missing or extra:
            raise SystemExit(f"tree mismatch; missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}")
        print("tree structure validated against model init")

    path = save_checkpoint(args.out, variables, step=0)
    print(f"saved orbax checkpoint: {path}")


if __name__ == "__main__":
    main()
