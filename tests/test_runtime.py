"""ResourceCounter semantics + rate-limited map behavior."""

import asyncio

import pytest

from dial_rag_tpu.errors import DialRagError, NotEnoughDailyTokensError
from dial_rag_tpu.runtime import (
    AsyncGeneratorWithTotal,
    DialLimitedResources,
    ResourceCounter,
    map_with_resource_limits,
)
from dial_rag_tpu.runtime.limited import TokenStats, UserLimitsForModel
from dial_rag_tpu.utils.streams import NullStream


class TestResourceCounter:
    async def test_acquire_release(self):
        rc = ResourceCounter(10)
        await rc.acquire(7)
        assert rc.available == 3
        rc.release(7)
        assert rc.available == 10

    async def test_acquire_more_than_total_raises(self):
        rc = ResourceCounter(5)
        with pytest.raises(ValueError):
            await rc.acquire(6)

    async def test_over_release_raises(self):
        rc = ResourceCounter(5)
        with pytest.raises(ValueError):
            rc.release(1)

    async def test_fifo_large_waiter_blocks_small(self):
        rc = ResourceCounter(10)
        await rc.acquire(8)  # 2 left
        order = []

        async def waiter(name, n):
            await rc.acquire(n)
            order.append(name)

        big = asyncio.create_task(waiter("big", 6))
        await asyncio.sleep(0.01)
        small = asyncio.create_task(waiter("small", 1))
        await asyncio.sleep(0.01)
        assert order == []  # small must NOT jump the queue
        rc.release(8)
        await asyncio.gather(big, small)
        assert order == ["big", "small"]

    async def test_multiple_waiters_woken_in_one_release(self):
        rc = ResourceCounter(4)
        await rc.acquire(4)
        done = []

        async def waiter(n):
            await rc.acquire(n)
            done.append(n)

        t1 = asyncio.create_task(waiter(2))
        t2 = asyncio.create_task(waiter(2))
        await asyncio.sleep(0.01)
        rc.release(4)  # both fit
        await asyncio.gather(t1, t2)
        assert sorted(done) == [2, 2]

    async def test_acquire_and_create_task_releases_on_done(self):
        rc = ResourceCounter(3)

        async def work():
            await asyncio.sleep(0.01)

        task = await rc.acquire_and_create_task(work(), 3)
        assert rc.available == 0
        await task
        await asyncio.sleep(0)  # let the done callback run
        assert rc.available == 3


def _limits(minute=1000, day_total=10000, day_used=0):
    async def get(model_name):
        return UserLimitsForModel(
            minute_token_stats=TokenStats(total=minute, used=0),
            day_token_stats=TokenStats(total=day_total, used=day_used),
        )

    return DialLimitedResources(get)


def _agen(items):
    async def gen():
        for x in items:
            yield x

    return AsyncGeneratorWithTotal(gen(), len(items))


class TestMapWithResourceLimits:
    async def test_maps_all_items(self):
        res = _limits()

        async def work(x):
            await asyncio.sleep(0.001)
            return x * 2

        out = await map_with_resource_limits(
            res, _agen([1, 2, 3, 4]), work, 100, "model", NullStream()
        )
        assert out == [2, 4, 6, 8]

    async def test_concurrency_bounded_by_minute_limit(self):
        res = _limits(minute=250)  # 2 concurrent tasks at 100 tokens each
        active = 0
        peak = 0

        async def work(x):
            nonlocal active, peak
            active += 1
            peak = max(peak, active)
            await asyncio.sleep(0.01)
            active -= 1
            return x

        await map_with_resource_limits(
            res, _agen(list(range(6))), work, 100, "m", NullStream()
        )
        assert peak <= 2

    async def test_daily_token_reservation_fails_fast(self):
        res = _limits(day_total=500, day_used=200)
        with pytest.raises(NotEnoughDailyTokensError):
            await map_with_resource_limits(
                res, _agen([1, 2, 3, 4]), None, 100, "m", NullStream()
            )

    async def test_reservations_accumulate_across_maps(self):
        res = _limits(day_total=1000)

        async def work(x):
            return x

        await map_with_resource_limits(
            res, _agen(list(range(6))), work, 100, "m", NullStream()
        )
        with pytest.raises(NotEnoughDailyTokensError):
            await map_with_resource_limits(
                res, _agen(list(range(6))), work, 100, "m", NullStream()
            )

    async def test_timeout_raises(self):
        res = _limits()

        async def slow(x):
            await asyncio.sleep(10)

        with pytest.raises(DialRagError):
            await map_with_resource_limits(
                res,
                _agen([1]),
                slow,
                100,
                "m",
                NullStream(),
                min_time_limit_sec=0.05,
            )


def test_host_pools_sizing_and_warmup():
    import os

    from dial_rag_tpu.runtime.host_pools import get_pools, init_host_pools

    init_host_pools()
    pools = get_pools()
    assert pools["parse"]._max_workers == max(1, (os.cpu_count() or 1) - 2)
    assert pools["indexing_dispatch"]._max_workers == 1
    assert pools["query_dispatch"]._max_workers == 1
    # warmed: threads exist without any work submitted afterwards
    assert len(pools["parse"]._threads) >= 1


async def test_host_pool_helpers_run():
    from dial_rag_tpu.runtime.host_pools import (
        run_in_indexing_dispatch_pool,
        run_in_parse_pool,
        run_in_query_dispatch_pool,
    )

    assert await run_in_parse_pool(lambda: 1 + 1) == 2
    assert await run_in_indexing_dispatch_pool(len, "abc") == 3
    assert await run_in_query_dispatch_pool(str.upper, "x") == "X"


def test_get_text_chunks_postprocess():
    from dial_rag_tpu.documents.model import (
        FORMAT_VERSION,
        DocumentRecord,
        IndexSettings,
        build_chunks_list,
    )
    from dial_rag_tpu.index.records import RetrievalType, SearchHit
    from dial_rag_tpu.retrieval.postprocess import get_text_chunks

    rec = DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=build_chunks_list(
            [("first", {"page_number": 1}), ("second", {"page_number": 2})]
        ),
        text_index=None,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
    )
    hits = [SearchHit(0, 1, RetrievalType.TEXT)]
    out = get_text_chunks(hits, [rec])
    assert out[0].text == "second"
    assert out[0].metadata["page_number"] == 2
    assert out[0].metadata["chunk_id"] == 1
    assert out[0].metadata["retrieval_type"] == "text"


def test_format_chunk_stats():
    from dial_rag_tpu.documents.model import build_chunks_list
    from dial_rag_tpu.utils.print_stats import format_chunk_stats

    assert format_chunk_stats([]) == "Chunks: 0\n"
    chunks = build_chunks_list(
        [("abcd", {"page_number": 1}), ("x" * 10, {"page_number": 2})]
    )
    line = format_chunk_stats(chunks)
    assert "Chunks: 2" in line and "total 14 B" in line and "pages 2" in line


async def test_resource_counter_cancelled_waiter_wakes_next():
    """Regression: a cancelled waiter's refunded units must wake queued
    waiters, or capacity strands and the queue deadlocks."""
    from dial_rag_tpu.runtime.resource_counter import ResourceCounter

    counter = ResourceCounter(10)
    await counter.acquire(10)

    async def waiter(n):
        await counter.acquire(n)
        return n

    b = asyncio.create_task(waiter(10))
    await asyncio.sleep(0)
    c = asyncio.create_task(waiter(5))
    await asyncio.sleep(0)
    counter.release(10)  # wakes B (debits 10)
    b.cancel()  # B never resumes; refund must wake C
    await asyncio.sleep(0)
    assert await asyncio.wait_for(c, timeout=1.0) == 5


async def test_zero_limits_mean_unlimited():
    """Missing/zero token limits must not zero out the budget (regression:
    429 on every document / ZeroDivisionError)."""
    from dial_rag_tpu.runtime.limited import (
        AsyncGeneratorWithTotal,
        DialLimitedResources,
        TokenStats,
        UserLimitsForModel,
        map_with_resource_limits,
    )
    from dial_rag_tpu.utils.streams import NullStream

    async def limits(_model):
        return UserLimitsForModel(
            minute_token_stats=TokenStats(total=0, used=0),
            day_token_stats=TokenStats(total=0, used=0),
        )

    resources = DialLimitedResources(limits)

    async def gen():
        for i in range(3):
            yield i

    out = await map_with_resource_limits(
        resources,
        AsyncGeneratorWithTotal(gen(), 3),
        lambda i: asyncio.sleep(0, result=i * 2),
        estimated_task_tokens=4000,
        model_name="m",
        file=NullStream(),
    )
    assert out == [0, 2, 4]


async def test_estimate_above_minute_limit_serializes():
    """A per-task estimate above the minute budget must serialize, not
    raise ValueError (regression)."""
    from dial_rag_tpu.runtime.limited import (
        AsyncGeneratorWithTotal,
        DialLimitedResources,
        TokenStats,
        UserLimitsForModel,
        map_with_resource_limits,
    )
    from dial_rag_tpu.utils.streams import NullStream

    async def limits(_model):
        return UserLimitsForModel(
            minute_token_stats=TokenStats(total=2000, used=0),
            day_token_stats=TokenStats(total=100000, used=0),
        )

    resources = DialLimitedResources(limits)

    async def gen():
        for i in range(2):
            yield i

    out = await map_with_resource_limits(
        resources,
        AsyncGeneratorWithTotal(gen(), 2),
        lambda i: asyncio.sleep(0, result=i),
        estimated_task_tokens=4000,  # > minute limit
        model_name="m2",
        file=NullStream(),
    )
    assert out == [0, 1]


async def test_timeout_does_not_relabel_inner_timeouts():
    """An inner operation's TimeoutError keeps its identity; only the
    block's own expiry becomes the DialRagError (regression)."""
    import pytest

    from dial_rag_tpu.errors import DialRagError
    from dial_rag_tpu.utils.timing import timeout

    with pytest.raises(TimeoutError) as exc_info:
        async with timeout(30.0):
            raise TimeoutError("inner download timed out")
    assert not isinstance(exc_info.value, DialRagError)

    with pytest.raises(DialRagError):
        async with timeout(0.01):
            await asyncio.sleep(1.0)


def test_document_processing_error_redacts_foreign_exceptions():
    from dial_rag_tpu.errors import (
        DocumentProcessingError,
        InvalidDocumentError,
    )

    class Foreign(Exception):
        def __str__(self):
            return "GET https://dial/v1/files/secret/doc.pdf failed"

    err = DocumentProcessingError("doc.pdf", Foreign())
    assert "secret" not in str(err)
    assert "Foreign" in str(err)
    # our own error types keep their safe messages
    err2 = DocumentProcessingError(
        "doc.pdf", InvalidDocumentError("The document is empty")
    )
    assert "The document is empty" in str(err2)


async def test_profiler_concurrent_requests_do_not_crash():
    from dial_rag_tpu.service.profiler import profiler_if_enabled
    from dial_rag_tpu.service.protocol import Choice

    async def profiled():
        choice = Choice(0)
        async with profiler_if_enabled(choice, True):
            await asyncio.sleep(0.05)
        choice.close()

    await asyncio.gather(*(profiled() for _ in range(4)))


async def test_cancelled_waiters_leave_the_queue():
    """Cancelled tickets parked behind a blocked head must be removed
    immediately, not linger until the head is granted — under sustained
    timeouts a lingering queue grows without bound."""
    from dial_rag_tpu.runtime.resource_counter import ResourceCounter

    counter = ResourceCounter(10)
    await counter.acquire(6)  # 4 free

    async def waiter(n):
        await counter.acquire(n)

    head = asyncio.create_task(waiter(8))  # blocks (needs 8 > 4)
    await asyncio.sleep(0)
    stragglers = [asyncio.create_task(waiter(1)) for _ in range(20)]
    await asyncio.sleep(0)
    assert len(counter._tickets) == 21
    for t in stragglers:
        t.cancel()
    await asyncio.gather(*stragglers, return_exceptions=True)
    assert len(counter._tickets) == 1  # only the live head remains
    counter.release(6)
    await asyncio.wait_for(head, timeout=1.0)
    assert counter.available == 2


async def test_sampling_profiler_builds_wall_clock_tree():
    """The profiler stage attachment must be a timeline-shaped call
    tree with per-node wall/self times (the reference attaches a
    pyinstrument tree — utils.py:50-68), not just a flat table."""
    import time

    from dial_rag_tpu.utils.sampling_profiler import SamplingProfiler

    def inner_spin():
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 0.12:
            sum(range(200))

    def outer_work():
        inner_spin()

    p = SamplingProfiler(interval=0.002)
    p.start()
    outer_work()
    p.stop()
    text = p.render(min_fraction=0.02)
    assert "wall-clock call tree" in text
    assert "outer_work" in text and "inner_spin" in text
    # tree shape: inner is indented deeper than outer
    outer_line = next(l for l in text.splitlines() if "outer_work" in l)
    inner_line = next(l for l in text.splitlines() if "inner_spin" in l)
    indent = lambda l: len(l) - len(l.lstrip())
    assert indent(inner_line) > indent(outer_line)
    # the spin leaf accumulates self time
    assert "self" in inner_line or "self" in text


async def test_profiler_stage_attaches_tree_and_table():
    from dial_rag_tpu.service.profiler import profiler_if_enabled
    from dial_rag_tpu.service.protocol import Choice

    choice = Choice(0)
    async with profiler_if_enabled(choice, True):
        import time

        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 0.05:
            sum(range(100))
    choice.close()
    attachments = []
    while not choice._queue.empty():
        delta = choice._queue.get_nowait()
        if delta:
            for stage in (delta.get("custom_content") or {}).get(
                "stages", []
            ):
                attachments += stage.get("attachments", [])
    titles = [a.get("title") for a in attachments]
    assert "Profile-tree.txt" in titles and "Profiler.txt" in titles
    tree = next(
        a["data"] for a in attachments if a["title"] == "Profile-tree.txt"
    )
    assert "wall-clock call tree" in tree
