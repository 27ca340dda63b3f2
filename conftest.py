"""Root conftest: force JAX onto a virtual 8-device CPU mesh for hermetic tests.

Must run before any `import jax` anywhere in the test session. Benchmarks
(`bench.py`) run in a separate process and use the real TPU chip.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))
