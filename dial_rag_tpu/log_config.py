"""Logging configuration (mirror of reference log_config.py): root level
from LOG_LEVEL, per-module overrides from LOG_LEVEL_OVERRIDE
("module=LEVEL,module2=LEVEL"), uvicorn-style formatter. Telemetry hooks
(OpenTelemetry) are optional and gated on the package being present."""

import logging
import os
import sys

LOG_FORMAT = "%(levelname)s:%(asctime)s:%(name)s:%(lineno)d: %(message)s"


def init_logging(level: str | None = None):
    level = level or os.environ.get("LOG_LEVEL", "INFO")
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(LOG_FORMAT))
    root = logging.getLogger()
    root.handlers[:] = [handler]
    try:
        root.setLevel(level.upper())
    except ValueError:
        root.setLevel(logging.INFO)
        root.warning(f"Unknown LOG_LEVEL {level!r}; defaulting to INFO")

    overrides = os.environ.get("LOG_LEVEL_OVERRIDE", "")
    for item in overrides.split(","):
        if "=" in item:
            name, mod_level = item.split("=", 1)
            try:
                logging.getLogger(name.strip()).setLevel(
                    mod_level.strip().upper()
                )
            except ValueError:
                root.warning(
                    f"Ignoring invalid LOG_LEVEL_OVERRIDE entry {item!r}"
                )


def init_telemetry_if_available():
    """OpenTelemetry init, before logging like the reference
    (log_config.py:65-75). The image ships only ``opentelemetry-api``,
    so the provider/exporters are the first-party SDK-lite in
    ``dial_rag_tpu.telemetry`` (spans for request -> stages -> encode
    dispatches, counters, OTLP/HTTP JSON export gated on the standard
    ``OTEL_*`` env). Third-party auto-instrumentation is attempted on
    top when those packages exist."""
    try:
        from dial_rag_tpu import telemetry
    except ImportError:
        return False
    active = telemetry.init_telemetry()
    try:
        from opentelemetry.instrumentation.aiohttp_server import (
            AioHttpServerInstrumentor,
        )

        AioHttpServerInstrumentor().instrument()
    except Exception:
        pass
    return active


def init_logging_and_telemetry():
    init_telemetry_if_available()
    init_logging()
