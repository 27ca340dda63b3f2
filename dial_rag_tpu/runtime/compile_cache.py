"""Persistent XLA compilation cache for the serving image.

Boot-time warmup (service/app.py::_warmup_device) compiles the encoder
at every sequence bucket plus the dense scan — through a remote-attached
TPU each fresh compile can take 20-250 s, so a cold boot costs minutes.
JAX's persistent compilation cache keys compiled executables by (HLO,
compile options, backend version) and serves them from disk, making the
SECOND and later boots hit serving speed immediately.

The cache directory comes from the standard ``JAX_COMPILATION_CACHE_DIR``
env (the Dockerfile bakes ``/var/cache/jax``); no directory -> no-op.
``jax_persistent_cache_min_compile_time_secs`` is dropped to 0 so every
warmup program persists — the serving image cares about boot latency,
not cache-dir size (a full warmup set is tens of MB).

The reference has no equivalent concern (its OpenVINO model compiles in
milliseconds on CPU); this is TPU-serving infrastructure.
"""

import logging
import os

logger = logging.getLogger(__name__)


def default_cache_dir() -> str:
    """JAX_COMPILATION_CACHE_DIR, or a stable per-machine fallback.

    Entry points that must survive cold remote-compile services (bench,
    driver entries, the test suite) pass this so compiled executables
    are paid for once per machine even when no env is configured."""
    return os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "dial_rag_tpu", "jax_cache"
    )


def init_compilation_cache(
    cache_dir: str | None = None, *, persist_everything: bool = True
) -> str | None:
    """Enable the persistent compile cache. Returns the directory in
    use, or None when disabled (no dir configured / not writable).

    ``persist_everything=True`` (serving/bench default) drops the
    min-compile-time/min-entry-size thresholds to 0 so every warmup
    program persists; pass False for long-lived shared dirs (e.g. the
    test suite's) where only genuinely slow compiles are worth disk.

    JAX's cache backend is a process singleton created lazily on first
    use; repointing ``jax_compilation_cache_dir`` after that would
    silently keep writing to the old dir, so we reset the singleton
    whenever the directory actually changes."""
    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:
        logger.warning(f"compile cache dir {path!r} not usable: {e}")
        return None
    import jax
    from jax._src import compilation_cache as _cc

    if jax.config.jax_compilation_cache_dir != path:
        _cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", path)
    if persist_everything:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logger.info(f"persistent XLA compilation cache at {path}")
    return path
