"""Shared backend-selection helper for the eval entry points."""

import os


def honor_jax_platforms_env() -> None:
    """The axon TPU plugin ignores the JAX_PLATFORMS env var (and the
    axon site pre-imports jax); honor it programmatically so
    ``JAX_PLATFORMS=cpu python -m eval.<entry>`` runs hermetically on
    CPU. Call from main() ONLY — at import time it would hijack the
    backend of whoever imports the module (the test suite imports the
    eval modules under a forced 8-device CPU mesh while the ambient
    env says JAX_PLATFORMS=axon)."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
