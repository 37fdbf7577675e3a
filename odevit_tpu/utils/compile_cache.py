"""Persistent XLA compilation cache, keyed by host fingerprint.

TPU compiles in this environment are expensive (the tunneled runtime
compiles remotely; a ViT-Base train step takes minutes), and training
runs get interrupted by VM restarts — every restart used to re-pay every
compile. JAX's persistent compilation cache keys serialized executables
by HLO hash, so re-runs (bench refreshes, recovered training, the
evidence suite's resumable arms) skip straight to execution.

The cache lives inside the repo by default (``.jax_cache/``, gitignored)
because the repo directory is the one disk known to survive VM restarts.

Host-fingerprint keying: TPU executables embed host-CPU AOT components
(``cpu_aot_loader``), so an entry serialized on one VM reloads on a
*different* host CPU with SIGILL-risk errors — JAX's own cache key is
HLO-hash only and does not include the host. Entries therefore live in
a per-host subdirectory ``host-<fp>/`` where ``<fp>`` hashes the CPU
model/flags plus the jax/jaxlib/libtpu versions; a cache written by one
VM is simply invisible on an incompatible one. Stale sibling host dirs
and legacy un-keyed top-level entries are purged best-effort on enable
(they can only belong to dead VMs or old layouts).
"""

from __future__ import annotations

import hashlib
import os
import platform
import shutil

_DEFAULT_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")

_enabled_path: str | None = None


def host_fingerprint() -> str:
    """12-hex-char digest of everything that must match for a serialized
    executable to be safe to reload on this host: CPU identity/feature
    flags (the AOT-component SIGILL axis) and jax/jaxlib/libtpu versions
    (the serialization-format axis)."""
    parts = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags") and key not in seen:
                    seen.add(key)
                    parts.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        pass
    import jax
    import jaxlib
    parts += [jax.__version__, jaxlib.__version__]
    try:  # libtpu version changes the TPU executable format
        import libtpu
        parts.append(str(getattr(libtpu, "__version__", "")))
    except Exception:  # noqa: BLE001 — absent off-TPU
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def _purge_stale(base: str, keep: str) -> None:
    """Remove legacy un-keyed entries (top-level files) and host dirs for
    other fingerprints. Best-effort: a failed unlink must never break
    enabling the cache."""
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        path = os.path.join(base, name)
        if path == keep:
            continue
        try:
            if os.path.isdir(path):
                if name.startswith("host-"):
                    shutil.rmtree(path, ignore_errors=True)
            else:
                os.unlink(path)
        except OSError:
            pass


def enable_persistent_cache(directory: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent host-keyed directory
    (idempotent). Honors ``JAX_COMPILATION_CACHE_DIR`` as the *base* when
    set; pass ``directory`` to override both. Returns the directory used
    (the per-host subdirectory)."""
    global _enabled_path
    import jax

    base = (directory or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_BASE)
    # TPU-only: CPU compiles are cheap, and the cache exists for the
    # minutes-long tunneled TPU compiles, not for the CPU backend
    if jax.default_backend() == "cpu":
        return base
    path = os.path.join(base, f"host-{host_fingerprint()}")
    if _enabled_path == path:
        return path
    os.makedirs(path, exist_ok=True)
    _purge_stale(base, keep=path)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took noticeable compile time; the default
    # (1s) would skip small-but-retraced helpers like eval steps
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_path = path
    return path
