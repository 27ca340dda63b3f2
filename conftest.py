"""Root conftest: force JAX onto a virtual 8-device CPU mesh for hermetic tests.

Must run before any `import jax` elsewhere. NOTE: in this environment the
axon TPU plugin ignores the JAX_PLATFORMS env var, so we also set the
config programmatically. Benchmarks (`bench.py`) run in a separate process
and use the real TPU chip.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

# Persist the suite's CPU-mesh compiles across pytest sessions (the jit
# warmup otherwise dominates a cold run; test_compile_cache's fixture
# save/restores the config around its own temp dir).
from dial_rag_tpu.runtime.compile_cache import (  # noqa: E402
    default_cache_dir,
    init_compilation_cache,
)

# Keep JAX's default persistence thresholds here: the shared dir lives
# across sessions, so only genuinely slow compiles (the multi-minute
# ensemble kernels) are worth the disk; tiny CPU-mesh programs are not.
init_compilation_cache(default_cache_dir(), persist_everything=False)

# Minimal async-test support (pytest-asyncio is not in the image).
import asyncio  # noqa: E402
import inspect  # noqa: E402


def pytest_pyfunc_call(pyfuncitem):
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None
