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
