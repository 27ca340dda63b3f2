"""Server entrypoint: ``python -m dial_rag_tpu.main`` (mirror of reference
main.py running uvicorn; here aiohttp's runner)."""

import os

from aiohttp import web

from dial_rag_tpu.log_config import init_logging_and_telemetry

init_logging_and_telemetry()

from dial_rag_tpu.runtime.compile_cache import (  # noqa: E402
    default_cache_dir,
    init_compilation_cache,
)
from dial_rag_tpu.service.app import create_app  # noqa: E402
from dial_rag_tpu.service.config import load_app_config  # noqa: E402


def main():
    # before any jit: warmup compiles then persist to disk, so the
    # second boot of this image skips the 20-250s-per-program remote
    # TPU compiles. JAX_COMPILATION_CACHE_DIR (baked in the Dockerfile)
    # wins; hosts without it still get the per-machine fallback dir,
    # consistent with bench.py and the driver entry points.
    init_compilation_cache(default_cache_dir())
    app_config = load_app_config()
    app = create_app(app_config)
    port = int(os.environ.get("PORT", "5000"))
    web.run_app(app, host="0.0.0.0", port=port)


if __name__ == "__main__":
    main()
