"""Micro-batcher: coalescing, windows, error propagation, embedder wiring."""

import asyncio

import numpy as np

from dial_rag_tpu.runtime.micro_batcher import MicroBatcher, PerLoopBatcher


async def test_concurrent_submits_coalesce():
    calls = []

    async def batch_fn(items):
        calls.append(list(items))
        return [i * 2 for i in items]

    b = MicroBatcher(batch_fn, max_batch=16, window_s=0.01)
    results = await asyncio.gather(*(b.submit(i) for i in range(5)))
    assert results == [0, 2, 4, 6, 8]
    assert len(calls) == 1 and sorted(calls[0]) == [0, 1, 2, 3, 4]


async def test_full_batch_flushes_immediately():
    calls = []

    async def batch_fn(items):
        calls.append(list(items))
        return items

    b = MicroBatcher(batch_fn, max_batch=3, window_s=10.0)  # huge window
    results = await asyncio.wait_for(
        asyncio.gather(*(b.submit(i) for i in range(3))), timeout=1.0
    )
    assert results == [0, 1, 2]
    assert len(calls) == 1


async def test_sequential_submits_get_separate_batches():
    calls = []

    async def batch_fn(items):
        calls.append(list(items))
        return items

    b = MicroBatcher(batch_fn, window_s=0.001)
    assert await b.submit("a") == "a"
    assert await b.submit("b") == "b"
    assert len(calls) == 2


async def test_inflight_wave_accumulates_arrivals_into_one_followup():
    """Backpressure alignment: arrivals during an in-flight wave form
    ONE follow-up wave that flushes the moment the wave completes —
    not per-arrival waves gated by the 2 ms timer (the device path the
    wave occupies is the resource the next wave needs)."""
    calls = []
    release = asyncio.Event()

    async def batch_fn(items):
        calls.append(list(items))
        if len(calls) == 1:
            await release.wait()
        return items

    b = MicroBatcher(batch_fn, max_batch=16, window_s=0.001)
    first = asyncio.ensure_future(b.submit("w0"))
    await asyncio.sleep(0.01)  # wave 1 in flight, blocked on release
    late = [asyncio.ensure_future(b.submit(f"l{i}")) for i in range(5)]
    # well past the window: accumulation must NOT have flushed them
    await asyncio.sleep(0.02)
    assert len(calls) == 1
    release.set()
    results = await asyncio.wait_for(
        asyncio.gather(first, *late), timeout=1.0
    )
    assert results == ["w0", "l0", "l1", "l2", "l3", "l4"]
    assert len(calls) == 2 and sorted(calls[1]) == [
        "l0", "l1", "l2", "l3", "l4",
    ]


async def test_errors_propagate_to_all_waiters():
    async def batch_fn(items):
        raise ValueError("boom")

    b = MicroBatcher(batch_fn, window_s=0.001)
    results = await asyncio.gather(
        b.submit(1), b.submit(2), return_exceptions=True
    )
    assert all(isinstance(r, ValueError) for r in results)


async def test_wrong_result_count_is_an_error():
    async def batch_fn(items):
        return items[:-1]

    b = MicroBatcher(batch_fn, window_s=0.001)
    results = await asyncio.gather(
        b.submit(1), b.submit(2), return_exceptions=True
    )
    assert all(isinstance(r, RuntimeError) for r in results)


async def test_per_loop_batcher_in_one_loop():
    made = []

    def make():
        async def batch_fn(items):
            return items

        b = MicroBatcher(batch_fn, window_s=0.001)
        made.append(b)
        return b

    p = PerLoopBatcher(make)
    await asyncio.gather(p.submit(1), p.submit(2))
    assert len(made) == 1


async def test_embedder_batched_query_encodes_match_single():
    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.models.tokenizer import build_test_vocab

    embedder = BgeEmbedder.from_random(
        vocab=build_test_vocab([chr(c) for c in range(97, 123)]),
        batch_size=8,
    )
    queries = ["abc", "def ghi", "jkl mno pqr"]
    batched = await asyncio.gather(
        *(embedder.aembed_query(q) for q in queries)
    )
    for q, emb in zip(queries, batched):
        np.testing.assert_allclose(
            emb, embedder.embed_query(q), rtol=1e-5, atol=1e-6
        )
