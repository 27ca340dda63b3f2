"""Logging + telemetry bootstrap (log_config.py): level parsing,
per-module overrides, and the OTel gating executed BOTH ways via stub
modules (the image ships no opentelemetry packages, so without stubs
the instrumentation branch would never run)."""

import logging
import sys
import types

import pytest

from dial_rag_tpu.log_config import (
    init_logging,
    init_telemetry_if_available,
)


@pytest.fixture(autouse=True)
def _restore_root_logger():
    root = logging.getLogger()
    saved_handlers = root.handlers[:]
    saved_level = root.level
    yield
    root.handlers[:] = saved_handlers
    root.setLevel(saved_level)


def test_level_from_arg():
    init_logging("debug")
    assert logging.getLogger().level == logging.DEBUG


def test_bad_level_falls_back_to_info():
    init_logging("chatty")
    assert logging.getLogger().level == logging.INFO


def test_module_overrides(monkeypatch):
    monkeypatch.setenv(
        "LOG_LEVEL_OVERRIDE", "noisy.module=ERROR, other=WARNING"
    )
    init_logging("INFO")
    assert logging.getLogger("noisy.module").level == logging.ERROR
    assert logging.getLogger("other").level == logging.WARNING


def test_bad_override_entry_ignored(monkeypatch):
    monkeypatch.setenv("LOG_LEVEL_OVERRIDE", "m=NOT_A_LEVEL,novalue")
    init_logging("INFO")  # must not raise
    assert logging.getLogger().level == logging.INFO


def test_telemetry_disabled_by_standard_env(monkeypatch):
    """OTEL_SDK_DISABLED=true (the standard kill switch) turns the
    first-party provider off."""
    monkeypatch.setenv("OTEL_SDK_DISABLED", "true")
    assert init_telemetry_if_available() is False


def _install_otel_stub(monkeypatch, instrument_raises=False):
    calls = []

    class Instrumentor:
        def instrument(self):
            if instrument_raises:
                raise RuntimeError("exporter unreachable")
            calls.append("instrumented")

    otel = types.ModuleType("opentelemetry")
    otel.trace = types.ModuleType("opentelemetry.trace")
    inst = types.ModuleType("opentelemetry.instrumentation")
    server = types.ModuleType(
        "opentelemetry.instrumentation.aiohttp_server"
    )
    server.AioHttpServerInstrumentor = Instrumentor
    for name, mod in {
        "opentelemetry": otel,
        "opentelemetry.trace": otel.trace,
        "opentelemetry.instrumentation": inst,
        "opentelemetry.instrumentation.aiohttp_server": server,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


def test_telemetry_present_instruments(monkeypatch):
    calls = _install_otel_stub(monkeypatch)
    assert init_telemetry_if_available() is True
    assert calls == ["instrumented"]


def test_telemetry_instrument_failure_is_contained(monkeypatch):
    """Third-party auto-instrumentation failing must not take down the
    first-party telemetry (which stays active)."""
    _install_otel_stub(monkeypatch, instrument_raises=True)
    assert init_telemetry_if_available() is True
