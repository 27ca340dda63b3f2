"""First-party OpenTelemetry SDK-lite: span semantics, context
propagation (threads + asyncio), OTLP JSON wire shape, counters, and
the OTLP/HTTP exporter against an in-process collector endpoint.

The reference gets this layer from aidial-sdk's init_telemetry
(reference log_config.py:65-75); this image ships only
opentelemetry-api, so dial_rag_tpu.telemetry implements the provider."""

import asyncio
import json

import pytest
from opentelemetry import trace as trace_api

from dial_rag_tpu import telemetry


@pytest.fixture
def collector():
    exporter = telemetry.InMemorySpanExporter()
    previous = telemetry.provider()
    telemetry.set_provider(telemetry.TracerProvider([exporter]))
    try:
        yield exporter
    finally:
        telemetry.set_provider(previous)


def test_span_parenting_and_trace_identity(collector):
    with telemetry.span("outer", kind="root") as outer:
        with telemetry.span("inner") as inner:
            inner.set_attribute("n", 3)
    assert [s.name for s in collector.spans] == ["inner", "outer"]
    inner, outer = collector.spans
    assert inner.parent.span_id == outer.get_span_context().span_id
    assert (
        inner.get_span_context().trace_id
        == outer.get_span_context().trace_id
    )
    assert outer.parent is None
    assert outer.attributes == {"kind": "root"}
    assert inner.end_time >= inner.start_time


def test_exception_sets_error_status_and_event(collector):
    with pytest.raises(ValueError):
        with telemetry.span("boom"):
            raise ValueError("bad input")
    (span,) = collector.spans
    assert span.status.status_code == trace_api.StatusCode.ERROR
    assert span.events and span.events[0][0] == "exception"
    assert span.events[0][1]["exception.type"] == "ValueError"


def test_context_propagates_across_await_and_tasks(collector):
    async def child(name):
        with telemetry.span(name):
            await asyncio.sleep(0)

    async def main():
        with telemetry.span("request"):
            await asyncio.gather(child("a"), child("b"))

    asyncio.run(main())
    request = collector.find("request")[0]
    for name in ("a", "b"):
        (span,) = collector.find(name)
        assert span.parent.span_id == request.get_span_context().span_id


def test_context_propagates_into_host_pools(collector):
    """The dispatch-pool helpers copy contextvars into the worker thread,
    so device-dispatch spans parent under the request span."""
    from dial_rag_tpu.runtime.host_pools import run_in_parse_pool

    def work():
        with telemetry.span("in-thread"):
            return 42

    async def main():
        with telemetry.span("request"):
            return await run_in_parse_pool(work)

    assert asyncio.run(main()) == 42
    request = collector.find("request")[0]
    (inner,) = collector.find("in-thread")
    assert inner.parent.span_id == request.get_span_context().span_id


def test_otlp_span_shape(collector):
    with telemetry.span("op", count=2, ratio=0.5, flag=True):
        pass
    otlp = telemetry.span_to_otlp(collector.spans[0])
    assert len(otlp["traceId"]) == 32 and len(otlp["spanId"]) == 16
    attrs = {a["key"]: a["value"] for a in otlp["attributes"]}
    assert attrs["count"] == {"intValue": "2"}
    assert attrs["ratio"] == {"doubleValue": 0.5}
    assert attrs["flag"] == {"boolValue": True}
    assert otlp["kind"] == 1  # INTERNAL
    assert int(otlp["endTimeUnixNano"]) >= int(otlp["startTimeUnixNano"])
    json.dumps(otlp)  # wire-serializable


def test_counters_aggregate_by_attributes():
    telemetry.metrics().reset()
    c = telemetry.get_counter("test.requests")
    c.add(1, {"route": "/chat"})
    c.add(2, {"route": "/chat"})
    c.add(5, {"route": "/health"})
    assert telemetry.metrics().value("test.requests", {"route": "/chat"}) == 3
    assert telemetry.metrics().total("test.requests") == 8
    (metric,) = [
        m
        for m in telemetry.metrics().otlp_snapshot()
        if m["name"] == "test.requests"
    ]
    assert metric["sum"]["isMonotonic"] is True
    points = metric["sum"]["dataPoints"]
    assert {p["asDouble"] for p in points} == {3, 5}
    telemetry.metrics().reset()


def test_otlp_http_exporter_posts_traces_and_metrics():
    """The exporter speaks OTLP/HTTP JSON to a live collector endpoint:
    spans land on /v1/traces, counters on /v1/metrics, with the
    service.name resource from the constructor."""
    from aiohttp import web
    from aiohttp.test_utils import TestServer

    received = {}

    async def main():
        async def collect(request):
            received[request.path] = await request.json()
            return web.Response()

        app = web.Application()
        app.router.add_post("/v1/traces", collect)
        app.router.add_post("/v1/metrics", collect)
        server = TestServer(app)
        await server.start_server()
        try:
            exporter = telemetry.OtlpJsonHttpExporter(
                f"http://127.0.0.1:{server.port}",
                service_name="dial-rag-test",
                flush_interval=3600,  # flush manually
            )
            previous = telemetry.provider()
            telemetry.set_provider(telemetry.TracerProvider([exporter]))
            try:
                telemetry.metrics().reset()
                with telemetry.span("exported-op", items=3):
                    pass
                telemetry.get_counter("test.exported").add(7)
                await asyncio.get_running_loop().run_in_executor(
                    None, exporter.force_flush
                )
            finally:
                telemetry.set_provider(previous)
                telemetry.metrics().reset()
                # the collector dies with this test: without shutdown,
                # the atexit flush would post the suite's accumulated
                # global counters at the dead port and log a connection
                # error AFTER the pytest summary
                exporter.shutdown()
        finally:
            await server.close()

    asyncio.run(main())

    traces = received["/v1/traces"]["resourceSpans"][0]
    resource_attrs = {
        a["key"]: a["value"]["stringValue"]
        for a in traces["resource"]["attributes"]
    }
    assert resource_attrs["service.name"] == "dial-rag-test"
    spans = traces["scopeSpans"][0]["spans"]
    assert any(s["name"] == "exported-op" for s in spans)

    metrics = received["/v1/metrics"]["resourceMetrics"][0]
    names = {m["name"] for m in metrics["scopeMetrics"][0]["metrics"]}
    assert "test.exported" in names


def test_init_telemetry_respects_disable_env(monkeypatch):
    monkeypatch.setenv("OTEL_SDK_DISABLED", "true")
    assert telemetry.init_telemetry() is False


def test_disabled_provider_is_noop():
    previous = telemetry.provider()
    telemetry.set_provider(None)
    try:
        with telemetry.span("ignored") as s:
            s.set_attribute("k", "v")  # must not raise
        assert not s.is_recording()
    finally:
        telemetry.set_provider(previous)
