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
