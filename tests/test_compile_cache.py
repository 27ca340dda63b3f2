"""Persistent XLA compilation cache for the serving image.

Boot-time warmup compiles the encoder at every sequence bucket — tens
of seconds to minutes per program through a remote TPU tunnel. The
persistent cache (runtime/compile_cache.py, JAX_COMPILATION_CACHE_DIR
baked in the Dockerfile) must make the SECOND boot serve every warmup
program from disk instead of recompiling."""

import types

import jax
import pytest

from dial_rag_tpu.runtime.compile_cache import init_compilation_cache


@pytest.fixture
def cache_dir(tmp_path):
    """Enable the persistent cache at a temp dir; restore after."""
    old_dir = jax.config.jax_compilation_cache_dir
    old_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    old_min_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    assert init_compilation_cache(str(tmp_path)) == str(tmp_path)
    try:
        yield tmp_path
    finally:
        # The cache backend is a process singleton: restoring the config
        # alone would leave writes going to tmp_path (or vice versa on
        # setup) — reset so the next user re-initializes at old_dir.
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min_time
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", old_min_size
        )


def test_init_without_dir_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert init_compilation_cache() is None


def test_warmup_hits_persistent_cache_on_second_boot(cache_dir):
    """Run the ACTUAL serving warmup (service/app.py::_warmup_device)
    twice: the first 'boot' persists every compiled program to the
    cache dir; after jax.clear_caches() (a fresh process's in-memory
    state) the second 'boot' must be served from disk — observed via
    the /jax/compilation_cache/cache_hits monitoring event — and must
    not grow the cache (same programs, same keys)."""
    from jax._src import monitoring

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.service.app import _warmup_device

    embedder = BgeEmbedder.from_random(batch_size=8)
    application = types.SimpleNamespace(embedder=embedder)

    # drop executables other tests may have compiled: the first boot
    # must genuinely compile so it persists the full program set
    jax.clear_caches()
    _warmup_device(application)  # first boot: compile + persist
    files = sorted(p.name for p in cache_dir.iterdir())
    assert files, "warmup persisted nothing"

    events = []

    def listener(event, **kwargs):
        events.append(event)

    monitoring.register_event_listener(listener)
    try:
        jax.clear_caches()  # drop in-memory executables, keep disk
        _warmup_device(application)  # second boot
    finally:
        monitoring.unregister_event_listener(listener)

    assert "/jax/compilation_cache/cache_hits" in events
    assert sorted(p.name for p in cache_dir.iterdir()) == files
