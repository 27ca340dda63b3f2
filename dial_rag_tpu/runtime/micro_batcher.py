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
        # strong refs: the loop keeps only weak refs to tasks, and a
        # GC-collected flush task would strand every waiter in its batch
        self._tasks: set[asyncio.Task] = set()

    async def submit(self, item: T) -> R:
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self._pending.append((item, fut))
        if len(self._pending) >= self.max_batch:
            self._start_flush()
        elif self._flush_handle is None:
            self._flush_handle = loop.call_later(
                self.window_s, self._start_flush
            )
        return await fut

    def _start_flush(self) -> None:
        if self._flush_handle is not None:
            self._flush_handle.cancel()
            self._flush_handle = None
        if not self._pending:
            return
        batch = self._pending
        self._pending = []
        task = asyncio.get_event_loop().create_task(self._run(batch))
        self._tasks.add(task)
        task.add_done_callback(self._tasks.discard)

    async def _run(self, batch: list[tuple[T, asyncio.Future]]) -> None:
        items = [item for item, _ in batch]
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
