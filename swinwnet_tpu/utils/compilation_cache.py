"""Persistent XLA compilation cache (round-3 fix for the ~20-minute cold
compile of the fused serving pipeline through the remote-compile tunnel).

`enable_persistent_cache()` points JAX's on-disk executable cache at a
stable directory so every process after the first reuses compiled
executables (measured on this machine's axon TPU backend: a 2.3 s toy
compile -> 0.02 s in a fresh process; the full fused 8-stage pipeline's
multi-minute cold start -> seconds, see PERFORMANCE.md "Cold compile").

Call it before the first `jit` execution. All CLI entry points (bench.py,
scripts/*, apps) do this by default; opt out with SWINWNET_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/swinwnet_tpu/xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache; returns the dir (or None
    if disabled via SWINWNET_COMPILE_CACHE=0)."""
    env = os.environ.get("SWINWNET_COMPILE_CACHE")
    if env == "0":
        return None
    path = path or env or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: tunnel round-trips dominate even small compiles
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
