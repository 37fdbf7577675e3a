"""Host-fingerprinted persistent compile cache (VERDICT r3 item 2).

TPU executables embed host-CPU AOT components; a cache written by one VM
must not be reloadable on a different host CPU (the round-3 driver tail
was flooded with cpu_aot_loader machine-mismatch errors from exactly
this). The fix keys the cache directory by a host fingerprint and purges
stale layouts on enable.
"""

import os

from odevit_tpu.utils import compile_cache as cc


def test_fingerprint_is_deterministic_and_short():
    a, b = cc.host_fingerprint(), cc.host_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex


def test_purge_removes_legacy_and_stale_host_dirs(tmp_path):
    base = tmp_path / "cache"
    keep = base / "host-abc"
    stale = base / "host-dead"
    other = base / "unrelated_dir"
    keep.mkdir(parents=True)
    stale.mkdir()
    other.mkdir()
    (base / "legacy_entry.bin").write_bytes(b"x" * 16)
    (stale / "entry").write_bytes(b"y")
    (keep / "entry").write_bytes(b"z")

    cc._purge_stale(str(base), keep=str(keep))

    assert (keep / "entry").exists()           # current host untouched
    assert not stale.exists()                  # other-host dir purged
    assert not (base / "legacy_entry.bin").exists()  # legacy layout purged
    assert other.exists()                      # non host-* dirs untouched


def test_enable_is_noop_on_cpu_backend(tmp_path):
    # the test suite runs on the CPU backend; enabling must not set the
    # jax cache dir (CPU compiles are cheap and CPU AOT entries are the
    # poisoning vector)
    import jax
    if jax.default_backend() != "cpu":
        import pytest
        pytest.skip("requires CPU backend")
    before = jax.config.jax_compilation_cache_dir
    out = cc.enable_persistent_cache(str(tmp_path / "c"))
    assert jax.config.jax_compilation_cache_dir == before
    assert not os.path.isdir(out) or out == str(tmp_path / "c")
