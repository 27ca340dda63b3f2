"""The service-level latency bench (tools/bench_service.py) must keep
working — the driver's headline service numbers come from it. These run
it at toy scale on the CPU mesh purely for mechanics: real app, fake
Dial core, pre-persisted record, request round-trips return 200 with a
Retrieval response (the timing itself is only meaningful on the TPU)."""

import asyncio

from tools.bench_service import run_service_bench


def test_service_bench_mechanics():
    out = asyncio.run(run_service_bench(n_chunks=300, reps=2))
    assert out["n_chunks"] == 300
    assert out["p50_ms"] > 0
    assert out["p95_ms"] >= out["p50_ms"]
    assert out["with_li"] is False


def test_service_bench_concurrent_phase():
    """concurrency>1 adds a concurrent-load phase: reps in-flight
    requests bounded by a semaphore, reported as QPS + percentiles;
    the query micro-batcher coalesces the concurrent encodes."""
    out = asyncio.run(
        run_service_bench(n_chunks=300, reps=2, concurrency=3)
    )
    assert out["concurrency"] == 3
    assert out["concurrent_reps"] >= 3
    assert out["qps"] > 0
    assert out["concurrent_p95_ms"] >= out["concurrent_p50_ms"]


def test_service_bench_with_late_interaction_arm():
    """--with-li exercises the third local arm end to end: the record
    carries a late-interaction index (bf16 storage) and the request's
    MaxSim query path runs device-resident (embed_query_tokens_device ->
    LateInteractionIndex.find without a host round-trip)."""
    out = asyncio.run(
        run_service_bench(n_chunks=300, reps=2, with_li=True)
    )
    assert out["with_li"] is True
    assert out["p50_ms"] > 0
