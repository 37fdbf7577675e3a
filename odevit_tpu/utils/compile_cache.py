"""Persistent XLA compilation cache.

TPU compiles in this environment are expensive (the tunneled runtime
compiles remotely; a ViT-Base train step takes minutes), and training
runs get interrupted by VM restarts — every restart used to re-pay every
compile. JAX's persistent compilation cache keys serialized executables
by HLO hash, so re-runs (bench refreshes, recovered training, the
evidence suite's resumable arms) skip straight to execution.

The cache lives inside the repo by default (``.jax_cache/``, gitignored)
because the repo directory is the one disk known to survive VM
restarts. Backends whose executables can't be serialized simply skip
writes — enabling the cache is always safe.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_persistent_cache(directory: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory
    (idempotent). Honors ``JAX_COMPILATION_CACHE_DIR`` when set; pass
    ``directory`` to override both. Returns the directory used."""
    global _enabled
    import jax

    path = (directory or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_DIR)
    if _enabled and jax.config.jax_compilation_cache_dir == path:
        return path
    # TPU-only: CPU compiles are cheap, and CPU AOT entries written by a
    # previous VM (different host CPU features after a restart) reload
    # with SIGILL-risk warnings — the cache exists for the minutes-long
    # tunneled TPU compiles, not for the CPU backend
    if jax.default_backend() == "cpu":
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took noticeable compile time; the default
    # (1s) would skip small-but-retraced helpers like eval steps
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
