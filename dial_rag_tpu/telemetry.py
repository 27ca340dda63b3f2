"""First-party OpenTelemetry tracing + metrics (SDK-lite).

The reference initializes OpenTelemetry before anything else
(reference log_config.py:65-75 via aidial-sdk's init_telemetry, plus
FastAPI auto-instrumentation in main.py:19) and exports traces/metrics
through the standard OTLP exporters. This image ships only
``opentelemetry-api`` — no SDK, no exporters — so this module provides
the missing half as a small conforming implementation:

- ``_Span`` / ``_Tracer`` / ``_TracerProvider`` implement the
  ``opentelemetry.trace`` abstract API, so any library that picks up
  the global tracer provider joins the same traces;
- context propagation rides ``opentelemetry.context`` (contextvars),
  so parent/child linkage works across ``await`` boundaries for free;
- span export is pluggable: an in-memory collector (tests), a logging
  exporter, and an OTLP/HTTP JSON exporter gated on the standard
  ``OTEL_EXPORTER_OTLP_ENDPOINT`` env (posts protobuf-JSON to
  ``/v1/traces`` and ``/v1/metrics`` from a daemon flush thread);
- metrics are a first-party counter registry (``get_counter``) rather
  than a full MeterProvider: only the *trace* API is an interop
  surface for instrumented libraries; our counters are internal and
  export in OTLP shape alongside spans.

Configuration (standard env): ``OTEL_SDK_DISABLED=true`` disables
everything; ``OTEL_EXPORTER_OTLP_ENDPOINT`` (or
``OTEL_EXPORTER_OTLP_TRACES_ENDPOINT``) enables the OTLP exporter;
``OTEL_SERVICE_NAME`` names the resource (default ``dial-rag``);
``OTEL_EXPORTER_OTLP_HEADERS`` adds ``k=v,k2=v2`` request headers.
"""

from __future__ import annotations

import atexit
import json
import logging
import os
import random
import threading
import time
import urllib.request
from contextlib import contextmanager
from typing import Iterator, Mapping, Optional, Sequence

from opentelemetry import context as otel_context
from opentelemetry import trace as trace_api
from opentelemetry.trace import (
    NonRecordingSpan,
    SpanContext,
    SpanKind,
    Status,
    StatusCode,
    TraceFlags,
)

logger = logging.getLogger(__name__)

_IDS = random.Random()  # trace/span ids need no crypto strength


# --------------------------------------------------------------------------
# spans


class _Span(trace_api.Span):
    """A recording span: attributes, events, status, wall-clock ns."""

    def __init__(
        self,
        name: str,
        span_context: SpanContext,
        parent: Optional[SpanContext],
        kind: SpanKind,
        attributes: Optional[Mapping] = None,
        start_time: Optional[int] = None,
        on_end=None,
    ):
        self.name = name
        self._context = span_context
        self.parent = parent
        self.kind = kind
        self.attributes: dict = dict(attributes or {})
        self.events: list[tuple[str, dict, int]] = []
        self.links: list = []
        self.status = Status(StatusCode.UNSET)
        self.start_time = start_time or time.time_ns()
        self.end_time: Optional[int] = None
        self._on_end = on_end
        self._lock = threading.Lock()

    # -- trace_api.Span interface -------------------------------------

    def get_span_context(self) -> SpanContext:
        return self._context

    def is_recording(self) -> bool:
        return self.end_time is None

    def set_attribute(self, key: str, value) -> None:
        if self.is_recording():
            self.attributes[key] = value

    def set_attributes(self, attributes: Mapping) -> None:
        for k, v in attributes.items():
            self.set_attribute(k, v)

    def add_event(
        self, name: str, attributes: Optional[Mapping] = None, timestamp=None
    ) -> None:
        if self.is_recording():
            self.events.append(
                (name, dict(attributes or {}), timestamp or time.time_ns())
            )

    def add_link(
        self, context: SpanContext, attributes: Optional[Mapping] = None
    ) -> None:
        if self.is_recording():
            self.links.append((context, dict(attributes or {})))

    def update_name(self, name: str) -> None:
        if self.is_recording():
            self.name = name

    def set_status(self, status, description: Optional[str] = None) -> None:
        if not self.is_recording():
            return
        if isinstance(status, StatusCode):
            status = Status(status, description)
        self.status = status

    def record_exception(
        self,
        exception: BaseException,
        attributes: Optional[Mapping] = None,
        timestamp=None,
        escaped: bool = False,
    ) -> None:
        attrs = {
            "exception.type": type(exception).__qualname__,
            "exception.message": str(exception),
            "exception.escaped": str(escaped).lower(),
        }
        attrs.update(attributes or {})
        self.add_event("exception", attrs, timestamp)

    def end(self, end_time: Optional[int] = None) -> None:
        with self._lock:
            if self.end_time is not None:
                return
            self.end_time = end_time or time.time_ns()
        if self._on_end is not None:
            self._on_end(self)


class _Tracer(trace_api.Tracer):
    def __init__(self, provider: "TracerProvider", scope_name: str):
        self._provider = provider
        self._scope = scope_name

    def start_span(
        self,
        name: str,
        context: Optional[otel_context.Context] = None,
        kind: SpanKind = SpanKind.INTERNAL,
        attributes: Optional[Mapping] = None,
        links=None,
        start_time: Optional[int] = None,
        record_exception: bool = True,
        set_status_on_exception: bool = True,
    ) -> trace_api.Span:
        parent_span = trace_api.get_current_span(context)
        parent_ctx = parent_span.get_span_context()
        if parent_ctx.is_valid:
            trace_id = parent_ctx.trace_id
            parent = parent_ctx
        else:
            trace_id = _IDS.getrandbits(128)
            parent = None
        span_context = SpanContext(
            trace_id=trace_id,
            span_id=_IDS.getrandbits(64),
            is_remote=False,
            trace_flags=TraceFlags(TraceFlags.SAMPLED),
        )
        span = _Span(
            name,
            span_context,
            parent,
            kind,
            attributes,
            start_time,
            on_end=self._provider._on_span_end,
        )
        for link in links or []:
            span.links.append((link.context, dict(link.attributes or {})))
        return span

    @contextmanager
    def start_as_current_span(
        self,
        name: str,
        context: Optional[otel_context.Context] = None,
        kind: SpanKind = SpanKind.INTERNAL,
        attributes: Optional[Mapping] = None,
        links=None,
        start_time: Optional[int] = None,
        record_exception: bool = True,
        set_status_on_exception: bool = True,
        end_on_exit: bool = True,
    ) -> Iterator[trace_api.Span]:
        span = self.start_span(
            name, context, kind, attributes, links, start_time
        )
        token = otel_context.attach(
            trace_api.set_span_in_context(span)
        )
        try:
            yield span
        except BaseException as e:
            if record_exception:
                span.record_exception(e, escaped=True)
            if set_status_on_exception:
                span.set_status(Status(StatusCode.ERROR, str(e)))
            raise
        finally:
            otel_context.detach(token)
            if end_on_exit:
                span.end()


class TracerProvider(trace_api.TracerProvider):
    def __init__(self, exporters: Sequence["SpanExporter"] = ()):
        self._exporters = list(exporters)

    def get_tracer(
        self,
        instrumenting_module_name: str,
        instrumenting_library_version=None,
        schema_url=None,
        attributes=None,
    ) -> trace_api.Tracer:
        return _Tracer(self, instrumenting_module_name)

    def add_exporter(self, exporter: "SpanExporter") -> None:
        self._exporters.append(exporter)

    def _on_span_end(self, span: _Span) -> None:
        for exporter in self._exporters:
            try:
                exporter.export(span)
            except Exception:
                logger.exception("span exporter failed")

    def force_flush(self) -> None:
        for exporter in self._exporters:
            flush = getattr(exporter, "force_flush", None)
            if flush is not None:
                flush()


# --------------------------------------------------------------------------
# exporters


class SpanExporter:
    def export(self, span: _Span) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class InMemorySpanExporter(SpanExporter):
    """Test collector: keeps finished spans for assertions."""

    def __init__(self):
        self.spans: list[_Span] = []

    def export(self, span: _Span) -> None:
        self.spans.append(span)

    def find(self, name_substring: str) -> list[_Span]:
        return [s for s in self.spans if name_substring in s.name]

    def clear(self) -> None:
        self.spans.clear()


class LoggingSpanExporter(SpanExporter):
    """DEBUG-level one-liner per finished span."""

    def export(self, span: _Span) -> None:
        ms = (span.end_time - span.start_time) / 1e6
        logger.debug(
            "span %s [%.1fms] trace=%032x attrs=%s",
            span.name,
            ms,
            span.get_span_context().trace_id,
            span.attributes,
        )


def _otlp_value(v) -> dict:
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, (list, tuple)):
        return {"arrayValue": {"values": [_otlp_value(x) for x in v]}}
    return {"stringValue": str(v)}


def _otlp_attrs(attrs: Mapping) -> list[dict]:
    return [{"key": k, "value": _otlp_value(v)} for k, v in attrs.items()]


_STATUS_CODES = {
    StatusCode.UNSET: 0,
    StatusCode.OK: 1,
    StatusCode.ERROR: 2,
}


def span_to_otlp(span: _Span) -> dict:
    out = {
        "traceId": f"{span.get_span_context().trace_id:032x}",
        "spanId": f"{span.get_span_context().span_id:016x}",
        "name": span.name,
        "kind": int(span.kind.value) + 1,  # OTLP kinds are 1-based
        "startTimeUnixNano": str(span.start_time),
        "endTimeUnixNano": str(span.end_time),
        "attributes": _otlp_attrs(span.attributes),
        "status": {"code": _STATUS_CODES.get(span.status.status_code, 0)},
    }
    if span.parent is not None:
        out["parentSpanId"] = f"{span.parent.span_id:016x}"
    if span.events:
        out["events"] = [
            {
                "name": name,
                "timeUnixNano": str(ts),
                "attributes": _otlp_attrs(attrs),
            }
            for name, attrs, ts in span.events
        ]
    return out


class OtlpJsonHttpExporter(SpanExporter):
    """OTLP/HTTP with JSON encoding, buffered, flushed from a daemon
    thread (and at exit). Export failures are logged once and dropped —
    telemetry must never take the service down."""

    def __init__(
        self,
        endpoint: str,
        service_name: str,
        headers: Optional[Mapping[str, str]] = None,
        flush_interval: float = 5.0,
        max_buffer: int = 2048,
    ):
        self._endpoint = endpoint.rstrip("/")
        self._service_name = service_name
        self._headers = dict(headers or {})
        self._buffer: list[dict] = []
        self._lock = threading.Lock()
        self._max_buffer = max_buffer
        self._dropped = 0
        self._warned = False
        self._stopped = False
        self._flush_interval = flush_interval
        self._thread = threading.Thread(
            target=self._flush_loop, daemon=True, name="otlp-export"
        )
        self._thread.start()
        atexit.register(self.force_flush)

    def shutdown(self) -> None:
        """Stop the flush thread and the at-exit flush; idempotent.
        For exporters whose collector does not outlive the process
        (tests, short-lived tools) — otherwise the interpreter-exit
        flush posts the global metrics registry at a dead endpoint and
        logs a spurious connection error after the program's output."""
        self._stopped = True
        atexit.unregister(self.force_flush)

    def export(self, span: _Span) -> None:
        log_drop = False
        with self._lock:
            if len(self._buffer) < self._max_buffer:
                self._buffer.append(span_to_otlp(span))
            else:
                # overflow between flushes must not be silent: count it
                # (flush logs the episode total) so trace gaps have a
                # diagnostic instead of vanishing
                log_drop = self._dropped == 0
                self._dropped += 1
        if log_drop:
            logger.warning(
                f"OTLP span buffer full ({self._max_buffer}); dropping "
                "spans until the next flush"
            )

    def _resource(self) -> dict:
        return {
            "attributes": _otlp_attrs({"service.name": self._service_name})
        }

    def _post(self, path: str, payload: dict) -> None:
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            f"{self._endpoint}{path}",
            data=body,
            headers={"Content-Type": "application/json", **self._headers},
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=5).read()
            # a success re-arms the failure log: a LATER outage (e.g. a
            # permanent collector failure after one transient blip) must
            # be logged, not suppressed forever by the first warning
            self._warned = False
        except Exception as e:
            if not self._warned:
                self._warned = True
                logger.warning(f"OTLP export to {self._endpoint} failed: {e}")

    def _flush_loop(self) -> None:
        while not self._stopped:
            time.sleep(self._flush_interval)
            self.force_flush()

    def force_flush(self) -> None:
        if self._stopped:
            return
        with self._lock:
            spans, self._buffer = self._buffer, []
            dropped, self._dropped = self._dropped, 0
        if dropped:
            logger.warning(
                f"OTLP export dropped {dropped} spans (buffer overflow "
                "between flushes)"
            )
        if spans:
            self._post(
                "/v1/traces",
                {
                    "resourceSpans": [
                        {
                            "resource": self._resource(),
                            "scopeSpans": [
                                {
                                    "scope": {"name": "dial_rag_tpu"},
                                    "spans": spans,
                                }
                            ],
                        }
                    ]
                },
            )
        metrics = _REGISTRY.otlp_snapshot()
        if metrics:
            self._post(
                "/v1/metrics",
                {
                    "resourceMetrics": [
                        {
                            "resource": self._resource(),
                            "scopeMetrics": [
                                {
                                    "scope": {"name": "dial_rag_tpu"},
                                    "metrics": metrics,
                                }
                            ],
                        }
                    ]
                },
            )


# --------------------------------------------------------------------------
# metrics (first-party counter registry)


class Counter:
    def __init__(self, name: str, registry: "_MetricsRegistry"):
        self.name = name
        self._registry = registry

    def add(self, amount: int | float, attributes: Optional[Mapping] = None):
        self._registry._add(self.name, amount, attributes)


class _MetricsRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._start_ns = time.time_ns()
        # name -> {frozenset(attr items) -> cumulative value}
        self._counters: dict[str, dict[frozenset, float]] = {}

    def _add(self, name, amount, attributes):
        key = frozenset((attributes or {}).items())
        with self._lock:
            series = self._counters.setdefault(name, {})
            series[key] = series.get(key, 0) + amount

    def snapshot(self) -> dict[str, dict[frozenset, float]]:
        with self._lock:
            return {k: dict(v) for k, v in self._counters.items()}

    def value(self, name: str, attributes: Optional[Mapping] = None) -> float:
        key = frozenset((attributes or {}).items())
        with self._lock:
            return self._counters.get(name, {}).get(key, 0)

    def total(self, name: str) -> float:
        """Sum over all attribute series of one counter."""
        with self._lock:
            return sum(self._counters.get(name, {}).values())

    def otlp_snapshot(self) -> list[dict]:
        now = str(time.time_ns())
        out = []
        for name, series in self.snapshot().items():
            out.append(
                {
                    "name": name,
                    "sum": {
                        "aggregationTemporality": 2,  # cumulative
                        "isMonotonic": True,
                        "dataPoints": [
                            {
                                "attributes": _otlp_attrs(dict(key)),
                                "startTimeUnixNano": str(self._start_ns),
                                "timeUnixNano": now,
                                "asDouble": value,
                            }
                            for key, value in series.items()
                        ],
                    },
                }
            )
        return out

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()


_REGISTRY = _MetricsRegistry()


def get_counter(name: str) -> Counter:
    return Counter(name, _REGISTRY)


def metrics() -> _MetricsRegistry:
    return _REGISTRY


# --------------------------------------------------------------------------
# wiring


_PROVIDER: TracerProvider | None = None
_DISABLED_TRACER = trace_api.NoOpTracer()


def init_telemetry() -> bool:
    """Install the first-party provider (idempotent). Returns True when
    telemetry is active (not disabled via OTEL_SDK_DISABLED)."""
    global _PROVIDER
    if os.environ.get("OTEL_SDK_DISABLED", "").lower() == "true":
        return False
    if _PROVIDER is not None:
        return True
    exporters: list[SpanExporter] = [LoggingSpanExporter()]
    endpoint = os.environ.get(
        "OTEL_EXPORTER_OTLP_TRACES_ENDPOINT"
    ) or os.environ.get("OTEL_EXPORTER_OTLP_ENDPOINT")
    if endpoint:
        headers = {}
        for item in os.environ.get("OTEL_EXPORTER_OTLP_HEADERS", "").split(
            ","
        ):
            if "=" in item:
                k, v = item.split("=", 1)
                headers[k.strip()] = v.strip()
        exporters.append(
            OtlpJsonHttpExporter(
                endpoint,
                service_name=os.environ.get("OTEL_SERVICE_NAME", "dial-rag"),
                headers=headers,
            )
        )
    _PROVIDER = TracerProvider(exporters)
    # best effort: become the process-global provider so instrumented
    # third-party libraries join our traces (the API warns and keeps
    # the first provider if something else won the race)
    try:
        trace_api.set_tracer_provider(_PROVIDER)
    except Exception:  # pragma: no cover
        pass
    return True


def provider() -> TracerProvider | None:
    return _PROVIDER


def set_provider(p: TracerProvider | None) -> None:
    """Test hook: swap the module-level provider (the OTel global can be
    set only once per process)."""
    global _PROVIDER
    _PROVIDER = p


def tracer() -> trace_api.Tracer:
    if _PROVIDER is None:
        return _DISABLED_TRACER
    return _PROVIDER.get_tracer("dial_rag_tpu")


@contextmanager
def span(name: str, **attributes) -> Iterator[trace_api.Span]:
    """The one-liner the service code uses: no-op when telemetry is off."""
    with tracer().start_as_current_span(name, attributes=attributes) as s:
        yield s
