"""Device-index LRU cache: token keying, eviction, service wiring."""

import json

from dial_rag_tpu.index.device_cache import DeviceIndexCache


class FakeIndex:
    def __init__(self, nbytes=100):
        self.nbytes = nbytes


class Rec:
    def __init__(self, token):
        self.cache_token = token


def test_hit_on_same_tokens():
    cache = DeviceIndexCache()
    records = [Rec(("u1", "sha1")), Rec(("u2", "sha2"))]
    a = cache.get_or_build(records, ("semantic", 7), FakeIndex)
    same_content = [Rec(("u1", "sha1")), Rec(("u2", "sha2"))]
    b = cache.get_or_build(same_content, ("semantic", 7), FakeIndex)
    assert a is b
    assert cache.hits == 1 and cache.misses == 1


def test_miss_on_different_config_or_content():
    cache = DeviceIndexCache()
    records = [Rec(("u1", "sha1"))]
    a = cache.get_or_build(records, ("semantic", 7), FakeIndex)
    b = cache.get_or_build(records, ("semantic", 3), FakeIndex)
    c = cache.get_or_build([Rec(("u1", "OTHER"))], ("semantic", 7), FakeIndex)
    assert a is not b and a is not c
    assert cache.misses == 3


def test_unpersisted_records_bypass_cache():
    cache = DeviceIndexCache()
    records = [Rec(None)]
    a = cache.get_or_build(records, ("semantic", 7), FakeIndex)
    b = cache.get_or_build(records, ("semantic", 7), FakeIndex)
    assert a is not b
    assert len(cache) == 0


def test_lru_eviction_by_bytes():
    cache = DeviceIndexCache(capacity_bytes=250)
    for i in range(4):
        cache.get_or_build(
            [Rec((f"u{i}", "s"))], ("c",), lambda: FakeIndex(100)
        )
    assert len(cache) <= 3
    assert cache.size_bytes <= 250 + 100  # at most one entry over


def test_storage_stamps_cache_token(tmp_path):
    import asyncio

    from dial_rag_tpu.documents.model import (
        FORMAT_VERSION,
        DocumentRecord,
        IndexSettings,
        build_chunks_list,
    )
    from dial_rag_tpu.storage.storage import (
        IndexStorageHolder,
        LocalFileStorage,
    )

    async def run():
        holder = IndexStorageHolder()
        storage = holder.get_storage(LocalFileStorage(str(tmp_path)))
        rec = DocumentRecord(
            format_version=FORMAT_VERSION,
            index_settings=IndexSettings(),
            chunks=build_chunks_list([("text", {"source": "s"})]),
            text_index=[["text"]],
            embeddings_index=None,
            multimodal_embeddings_index=None,
            description_embeddings_index=None,
            mime_type="text/plain",
            document_bytes=b"",
        )
        assert rec.cache_token is None
        await storage.store("files/b/x/index.bin", rec)
        assert rec.cache_token is not None
        loaded = await storage.load("files/b/x/index.bin", IndexSettings())
        assert loaded.cache_token == rec.cache_token
        return True

    assert asyncio.run(run())


def test_single_flight_concurrent_builds():
    import threading
    import time

    cache = DeviceIndexCache()
    records = [Rec(("u", "s"))]
    builds = []

    def slow_builder():
        builds.append(1)
        time.sleep(0.05)
        return FakeIndex()

    results = []
    threads = [
        threading.Thread(
            target=lambda: results.append(
                cache.get_or_build(records, ("c",), slow_builder)
            )
        )
        for _ in range(5)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1  # only one thread built
    assert all(r is results[0] for r in results)
    assert cache.hits == 4 and cache.misses == 1


def test_duplicate_insert_replaces_and_subtracts_bytes():
    """If a racer's entry lands between the build-lock re-check and this
    build's insert (the old single-flight window), the replacement must
    subtract the replaced entry's bytes — otherwise _size inflates
    permanently and causes premature eviction."""
    cache = DeviceIndexCache()
    records = [Rec(("u", "s"))]
    key = ((("u", "s"),), ("c",))

    def builder():
        # simulate the racer's duplicate insert mid-build
        with cache._lock:
            cache._entries[key] = FakeIndex(300)
            cache._size += 300
        return FakeIndex(100)

    out = cache.get_or_build(records, ("c",), builder)
    assert out.nbytes == 100
    assert cache.size_bytes == 100  # 300-byte racer entry was replaced
    assert not cache._building  # build lock released after insert


def test_failed_build_can_retry():
    cache = DeviceIndexCache()
    records = [Rec(("u2", "s"))]
    calls = []

    def failing_then_ok():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("boom")
        return FakeIndex()

    import pytest

    with pytest.raises(RuntimeError):
        cache.get_or_build(records, ("c",), failing_then_ok)
    out = cache.get_or_build(records, ("c",), failing_then_ok)
    assert isinstance(out, FakeIndex) and len(calls) == 2


def test_warm_runs_once_on_miss_not_on_hits():
    """Compile-ahead (warm=) must fire exactly once per build — on the
    inserting miss, off the hot path — and never on cache hits."""
    import time

    cache = DeviceIndexCache()
    records = [Rec(("u1", "sha1"))]
    warmed = []

    def warm(index):
        warmed.append(index)

    a = cache.get_or_build(records, ("semantic", 7), FakeIndex, warm=warm)
    cache.wait_warm(5)
    assert warmed == [a]
    b = cache.get_or_build(records, ("semantic", 7), FakeIndex, warm=warm)
    cache.wait_warm(5)
    assert b is a and warmed == [a]  # hit: no second warm


def test_warm_failure_does_not_break_serving():
    cache = DeviceIndexCache()
    records = [Rec(("u1", "sha1"))]

    def warm(index):
        raise RuntimeError("compile exploded")

    a = cache.get_or_build(records, ("k",), FakeIndex, warm=warm)
    cache.wait_warm(5)
    # the index is cached and serving continues
    assert cache.get_or_build(records, ("k",), FakeIndex) is a


def test_dense_index_warm_compiles_wave_buckets():
    """warm_query_buckets must leave the batched kernels compiled for
    every wave bucket find_batch can produce (verified by timing-free
    behavior: the calls simply succeed and results stay correct)."""
    import numpy as np

    from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
    from dial_rag_tpu.index.records import RetrievalType

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((600, 16)).astype(np.float32)
    idx = DenseIndex(
        RetrievalType.TEXT,
        [DocEmbeddings(chunk_ids=np.arange(600), embeddings=emb)],
        limit=7,
    )
    idx.warm_query_buckets(max_q=16)
    # post-warm queries at every bucket are correct
    target = 123
    q = emb[target]
    assert idx.find(q)[0].chunk_id == target
    for nq in (2, 8, 16):
        hits = idx.find_batch(np.tile(q, (nq, 1)))
        assert all(h[0].chunk_id == target for h in hits)


def test_bm25_warm_compiles_wave_buckets():
    from dial_rag_tpu.index.bm25 import Bm25Index

    items = [[f"w{i % 17}", "common"] for i in range(300)]
    idx = Bm25Index.build(items)
    idx.warm_query_buckets(k=5, max_q=8)
    top = idx.top_n(["w3"], 5)
    assert len(top) == 5


def test_late_interaction_warm_compiles_buckets():
    import numpy as np

    from dial_rag_tpu.index.late_interaction import LateInteractionIndex
    from dial_rag_tpu.index.records import RetrievalType

    rng = np.random.default_rng(1)
    chunks = [
        rng.standard_normal((3, 16)).astype(np.float32) for _ in range(50)
    ]
    idx = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=4, limit=3
    )
    idx.warm_query_buckets(max_q=8)
    hits = idx.find(chunks[7])
    assert hits and hits[0].chunk_id == 7
