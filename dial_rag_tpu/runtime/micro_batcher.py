"""Micro-batching of concurrent single-item requests into one dispatch.

TPU-first serving pattern with no reference counterpart: the reference
runs one OpenVINO encode per query (embeddings.py:72-97); on TPU a
single [Q, S] encode dispatch costs nearly the same as [1, S], so
concurrent requests' query encodes (and batched index scans — see
DenseIndex.find_batch) should share a dispatch. The batcher collects
items arriving within a short window (or up to ``max_batch``) and runs
one batch call; per-item results resolve each caller's future.

Latency math: the window only delays a query when the service is
concurrent enough for batching to pay — the first item schedules a
flush at ``window_s``; a full batch flushes immediately. With zero
concurrency the added latency is exactly ``window_s`` (default 2 ms,
the same order as the encode itself).

Backpressure alignment: while a wave is IN FLIGHT, new arrivals
accumulate with NO timer and flush the moment the wave completes.
Behind a high-latency device link the in-flight wave occupies the
very resource the next wave needs (~100 ms round-trip through the
remote tunnel), so waiting for it costs nothing — and it makes wave
sizes self-align to the arrival rate instead of fragmenting into
per-request waves: a 2 ms window can only coalesce requests that
arrive within 2 ms of each other, while the natural alignment point
is the whole round-trip. Measured on the service bench (16 in-flight
requests, 100k chunks): avg wave size 1.8 -> ~7 (the residual QPS
bound is per-row eager unbatching of the wave output, tracked in
tools/bench_service.py).
"""

import asyncio
import weakref
from typing import Awaitable, Callable, Generic, TypeVar

T = TypeVar("T")
R = TypeVar("R")


class MicroBatcher(Generic[T, R]):
    def __init__(
        self,
        batch_fn: Callable[[list[T]], Awaitable[list[R]]],
        max_batch: int = 64,
        window_s: float = 0.002,
    ):
        self._batch_fn = batch_fn
        self.max_batch = max_batch
        self.window_s = window_s
        self._pending: list[tuple[T, asyncio.Future]] = []
        self._flush_handle: asyncio.TimerHandle | None = None
        self._inflight = 0
        # strong refs: the loop keeps only weak refs to tasks, and a
        # GC-collected flush task would strand every waiter in its batch
        self._tasks: set[asyncio.Task] = set()

    async def submit(self, item: T) -> R:
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self._pending.append((item, fut))
        if len(self._pending) >= self.max_batch:
            self._start_flush()
        elif self._inflight == 0 and self._flush_handle is None:
            self._flush_handle = loop.call_later(
                self.window_s, self._start_flush
            )
        # else: a wave is in flight — accumulate; its completion flushes
        return await fut

    def _start_flush(self) -> None:
        if self._flush_handle is not None:
            self._flush_handle.cancel()
            self._flush_handle = None
        if not self._pending:
            return
        batch = self._pending
        self._pending = []
        # wave-size telemetry: avg items/wave is THE coalescing health
        # number under concurrent load (waves of 1 = paying one device
        # round-trip per request; see tools/bench_service.py)
        from dial_rag_tpu import telemetry

        telemetry.get_counter("microbatch_waves").add(1)
        telemetry.get_counter("microbatch_items").add(len(batch))
        task = asyncio.get_event_loop().create_task(self._run(batch))
        self._tasks.add(task)
        task.add_done_callback(self._tasks.discard)

    async def _run(self, batch: list[tuple[T, asyncio.Future]]) -> None:
        items = [item for item, _ in batch]
        self._inflight += 1
        try:
            try:
                results = await self._batch_fn(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"batch_fn returned {len(results)} results for "
                        f"{len(items)} items"
                    )
            except BaseException as e:  # incl. CancelledError: never strand
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
                if not isinstance(e, Exception):
                    raise  # propagate cancellation to the task machinery
                return
            for (_, fut), result in zip(batch, results):
                if not fut.done():
                    fut.set_result(result)
        finally:
            self._inflight -= 1
            if self._inflight == 0 and self._pending:
                self._start_flush()


class PerLoopBatcher(Generic[T, R]):
    """One MicroBatcher per event loop (tests and services each run their
    own loops; futures cannot cross loops)."""

    def __init__(self, make: Callable[[], MicroBatcher[T, R]]):
        self._make = make
        self._by_loop: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()

    async def submit(self, item: T) -> R:
        loop = asyncio.get_running_loop()
        batcher = self._by_loop.get(loop)
        if batcher is None:
            batcher = self._make()
            self._by_loop[loop] = batcher
        return await batcher.submit(item)
