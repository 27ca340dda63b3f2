"""Token-weighted counting semaphore with FIFO multi-waiter wakeup.

Same contract as the reference's ResourceCounter (resource_counter.py):
``acquire(n)`` takes n units at once; ``release`` wakes as many queued
waiters as fit, in FIFO order (so one large waiter blocks later small
ones — intentional fairness); ``acquire_and_create_task`` ties the units'
lifetime to a spawned task. Used to bound concurrent remote-model calls
by the user's minute token limit."""

import asyncio
from collections import deque
from contextlib import asynccontextmanager
from dataclasses import dataclass
from typing import Coroutine


class ResourceCounter:
    @dataclass
    class _WaitItem:
        future: asyncio.Future
        count: int

    def __init__(self, total: int):
        if total <= 0:
            raise ValueError("ResourceCounter total value must be > 0")
        self._waiters: deque[ResourceCounter._WaitItem] = deque()
        self._total = total
        self._value = total

    @property
    def total(self) -> int:
        return self._total

    @property
    def available(self) -> int:
        return self._value

    def locked(self, count: int = 1) -> bool:
        # Pending waiters get priority over new acquirers (FIFO fairness).
        return self._value < count or any(
            not w.future.cancelled() for w in self._waiters
        )

    async def acquire(self, count: int):
        if count > self._total:
            raise ValueError("Requested count is more than total")
        if not self.locked(count):
            self._value -= count
            return
        loop = asyncio.get_running_loop()
        wait_item = ResourceCounter._WaitItem(loop.create_future(), count)
        self._waiters.append(wait_item)
        try:
            try:
                await wait_item.future
            finally:
                self._waiters.remove(wait_item)
        except asyncio.CancelledError:
            # The wakeup may have already debited the units before the
            # cancellation landed; return them AND wake the next waiter,
            # or the refunded capacity is stranded and queued waiters
            # deadlock (asyncio.Semaphore does the same here).
            if not wait_item.future.cancelled():
                self._value += count
                self._wake_up_next()
            raise

    def release(self, count: int):
        if self._value + count > self._total:
            raise ValueError("ResourceCounter released more than total")
        self._value += count
        self._wake_up_next()

    def _wake_up_next(self):
        for wait_item in self._waiters:
            if wait_item.future.done():
                continue
            if wait_item.count > self._value:
                break  # FIFO: don't skip over a large waiter
            self._value -= wait_item.count
            wait_item.future.set_result(None)

    @asynccontextmanager
    async def acquire_context(self, count: int):
        await self.acquire(count)
        try:
            yield
        finally:
            self.release(count)

    async def acquire_and_create_task(
        self,
        coro: Coroutine,
        count: int,
        task_group: asyncio.TaskGroup | None = None,
    ) -> asyncio.Task:
        create_task = (
            task_group.create_task if task_group else asyncio.create_task
        )
        await self.acquire(count)
        try:
            task = create_task(coro)
        except BaseException:
            self.release(count)
            raise
        task.add_done_callback(lambda _: self.release(count))
        return task
