"""Named host-side thread pools (the reference's CPU-pool policy).

The reference runs parsing and the two embedding paths in three
deliberately-sized ThreadPoolExecutors (reference resources/
cpu_pools.py:17-34): parse pool ``max(1, CPU-2)``, indexing-embeddings
pool 1, query-embeddings pool 1, warmed at app startup, threads rather
than processes so worker death cannot orphan zombies.

On TPU the sizing rationale shifts but the shape survives:

- ``parse_pool`` (``max(1, CPU-2)``) — genuinely CPU-bound host work
  (PDF/HTML parsing, chunking, BM25 keyword preprocessing) that should
  never starve the event loop or the device-dispatch threads;
- ``indexing_dispatch_pool`` (1 worker) — bulk encode dispatches are
  serialized so concurrent indexing requests interleave at batch
  granularity (the reference's fairness decision, batched.py:42-45) and
  host tokenization for one stream overlaps device compute;
- ``query_dispatch_pool`` (1 worker) — query encodes take a separate
  lane so a user's 2-ms query never queues behind a bulk indexing
  stream's host tokenization.

All three are warmed at startup (reference app.py:376-382) so first
requests do not pay thread-spawn latency.
"""

import asyncio
import contextvars
import os
from concurrent.futures import ThreadPoolExecutor

_pools: dict[str, ThreadPoolExecutor] | None = None


def _create() -> dict[str, ThreadPoolExecutor]:
    cpu = os.cpu_count() or 1
    return {
        "parse": ThreadPoolExecutor(
            max_workers=max(1, cpu - 2), thread_name_prefix="parse"
        ),
        "indexing_dispatch": ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="indexing-dispatch"
        ),
        "query_dispatch": ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="query-dispatch"
        ),
    }


def get_pools() -> dict[str, ThreadPoolExecutor]:
    global _pools
    if _pools is None:
        _pools = _create()
    return _pools


def init_host_pools() -> None:
    """Create and warm every pool (submit a no-op to spawn the threads)."""
    for pool in get_pools().values():
        for _ in range(pool._max_workers):
            pool.submit(lambda: None)


async def _run_in(pool_name: str, fn, *args):
    # carry contextvars (incl. the OpenTelemetry current-span context)
    # into the worker thread so device-dispatch spans parent under the
    # request/stage span instead of starting orphan traces
    ctx = contextvars.copy_context()
    return await asyncio.get_running_loop().run_in_executor(
        get_pools()[pool_name], lambda: ctx.run(fn, *args)
    )


async def run_in_parse_pool(fn, *args):
    return await _run_in("parse", fn, *args)


async def run_in_indexing_dispatch_pool(fn, *args):
    return await _run_in("indexing_dispatch", fn, *args)


async def run_in_query_dispatch_pool(fn, *args):
    return await _run_in("query_dispatch", fn, *args)
