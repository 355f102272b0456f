"""Numerical debugging aids (SURVEY.md §5: the reference has no sanitizers;
the TPU framework exposes a NaN-check mode and pytree finiteness asserts).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_check():
    """Enable jax_debug_nans for the enclosed block: any NaN produced by a
    jitted computation raises immediately with the offending primitive
    (re-runs the op un-jitted for a precise traceback)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_pytree(tree, name: str = "pytree"):
    """Host-side check that every leaf is finite (e.g. params after a step)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.isfinite(arr).all()):
            key = "/".join(str(p) for p in path)
            raise FloatingPointError(f"non-finite values in {name} at {key}")
