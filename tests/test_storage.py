"""Serialization round-trip + storage invalidation + LRU bounds."""

import numpy as np
import pytest

from dial_rag_tpu.documents.model import (
    FORMAT_VERSION,
    Chunk,
    DocumentRecord,
    IndexSettings,
)
from dial_rag_tpu.storage import (
    IndexStorage,
    IndexStorageHolder,
    LocalFileStorage,
    LRUCacheStorage,
    deserialize_record,
    serialize_record,
)
from dial_rag_tpu.storage.storage import link_to_index_url


def make_record(**overrides) -> DocumentRecord:
    base = dict(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(
            indexes={"parser": {"chunk_size": 1000}}
        ),
        chunks=[
            Chunk(text="alpha", metadata={"chunk_id": 0, "page_number": 1}),
            Chunk(text="beta", metadata={"chunk_id": 1, "source": "u"}),
        ],
        text_index=[["alpha"], ["beta"]],
        embeddings_index=[
            np.ones((1, 4), np.float32),
            np.arange(4, dtype=np.float32).reshape(1, 4),
        ],
        multimodal_embeddings_index=None,
        description_embeddings_index=[
            np.zeros((0, 4), np.float32),
            np.full((2, 4), 0.5, np.float32),
        ],
        mime_type="application/pdf",
        document_bytes=b"%PDF-1.4 fake",
    )
    base.update(overrides)
    return DocumentRecord(**base)


def test_roundtrip():
    rec = make_record()
    out = deserialize_record(serialize_record(rec))
    assert out.format_version == rec.format_version
    assert out.index_settings == rec.index_settings
    assert [c.text for c in out.chunks] == ["alpha", "beta"]
    assert out.chunks[0].metadata == {"chunk_id": 0, "page_number": 1}
    assert out.text_index == rec.text_index
    np.testing.assert_array_equal(
        out.embeddings_index[1], rec.embeddings_index[1]
    )
    assert out.multimodal_embeddings_index is None
    assert out.description_embeddings_index[0].shape == (0, 4)
    assert out.document_bytes == rec.document_bytes
    assert out.mime_type == "application/pdf"


def test_no_pickle_involved():
    data = serialize_record(make_record())
    assert b"pickle" not in data
    import gzip

    raw = gzip.decompress(data)
    assert not raw.startswith(b"\x80")  # not a pickle stream


async def test_index_storage_load_store_and_invalidation(tmp_path):
    storage = IndexStorage(LocalFileStorage(str(tmp_path)))
    settings = IndexSettings(indexes={"parser": {"chunk_size": 1000}})
    rec = make_record(index_settings=settings)
    url = link_to_index_url("files/bucket/doc.pdf", "rag-bucket")

    assert await storage.load(url, settings) is None  # miss
    await storage.store(url, rec)
    loaded = await storage.load(url, settings)
    assert loaded is not None and [c.text for c in loaded.chunks] == [
        "alpha",
        "beta",
    ]

    # settings change invalidates
    other = IndexSettings(indexes={"parser": {"chunk_size": 500}})
    assert await storage.load(url, other) is None

    # format version mismatch invalidates
    stale = make_record(format_version=FORMAT_VERSION - 1, index_settings=settings)
    await storage.store(url, stale)
    assert await storage.load(url, settings) is None

    # corrupted data is a miss, not an exception
    path = tmp_path / url
    path.write_bytes(b"garbage")
    assert await storage.load(url, settings) is None


def test_link_to_index_url_layout():
    url = link_to_index_url("files/bucket/doc.pdf", "rag-bucket")
    assert url.startswith("files/rag-bucket/dial-rag-index/")
    assert url.endswith("/index.bin")
    parts = url.split("/")[3:-1]
    assert len(parts) == 8 and all(len(p) == 8 for p in parts)
    # deterministic
    assert url == link_to_index_url("files/bucket/doc.pdf", "rag-bucket")
    assert url != link_to_index_url("files/bucket/doc2.pdf", "rag-bucket")


async def test_lru_eviction_by_bytes():
    cache = LRUCacheStorage(capacity=100)
    await cache.store("a", b"x" * 40)
    await cache.store("b", b"y" * 40)
    assert await cache.load("a") is not None  # touch a -> b becomes LRU
    await cache.store("c", b"z" * 40)  # evicts b
    assert await cache.load("b") is None
    assert await cache.load("a") is not None
    assert await cache.load("c") is not None
    assert cache.size <= 100

    # oversized item is not cached and does not evict others
    await cache.store("huge", b"h" * 1000)
    assert await cache.load("huge") is None
    assert await cache.load("a") is not None


async def test_holder_shares_cache_across_storages(tmp_path):
    holder = IndexStorageHolder()
    remote = LocalFileStorage(str(tmp_path))
    settings = IndexSettings()
    rec = make_record(index_settings=settings)

    s1 = holder.get_storage(remote)
    await s1.store("files/b/x/index.bin", rec)

    # new storage instance, same holder: hits the shared cache even if the
    # remote file disappears
    (tmp_path / "files/b/x/index.bin").unlink()
    s2 = holder.get_storage(remote)
    assert await s2.load("files/b/x/index.bin", settings) is not None


def test_local_storage_rejects_path_traversal(tmp_path):
    import asyncio

    import pytest

    from dial_rag_tpu.errors import InvalidAttachmentError
    from dial_rag_tpu.storage.storage import LocalFileStorage

    storage = LocalFileStorage(str(tmp_path / "root"))
    for url in (
        "files/../../../../etc/evil",
        "../outside",
        "files/b/../../../x",
    ):
        with pytest.raises(InvalidAttachmentError):
            asyncio.run(storage.store(url, b"x"))
        with pytest.raises(InvalidAttachmentError):
            asyncio.run(storage.load(url))
    # normal paths still work
    asyncio.run(storage.store("files/b/ok/index.bin", b"data"))
    assert asyncio.run(storage.load("files/b/ok/index.bin")) == b"data"


async def test_record_memo_skips_decode_but_not_invalidation(
    tmp_path, monkeypatch
):
    """The holder-level RecordMemo serves repeat loads without
    re-deserializing (the dominant per-request cost at corpus scale),
    while version/settings invalidation still runs on memo hits and a
    re-minted index at the same URL misses the memo. The backend's
    validator is disabled and the writes bypass the holder, so this
    exercises the content-sha decode memo in isolation (the validated
    fast path and store-time priming have their own test below)."""
    import dial_rag_tpu.storage.storage as storage_mod

    class NoValidatorStorage(LocalFileStorage):
        async def validator(self, url):
            return None

    holder = IndexStorageHolder()
    remote = NoValidatorStorage(str(tmp_path))
    settings = IndexSettings(indexes={"parser": {"chunk_size": 1000}})
    rec = make_record(index_settings=settings)

    # store WITHOUT the holder's memo: a fresh-process first load must
    # pay exactly one decode
    await IndexStorage(remote).store("files/b/m/index.bin", rec)

    calls = []
    real = storage_mod.deserialize_record
    monkeypatch.setattr(
        storage_mod,
        "deserialize_record",
        lambda data: calls.append(1) or real(data),
    )

    s2 = holder.get_storage(remote)
    first = await s2.load("files/b/m/index.bin", settings)
    assert first is not None and len(calls) == 1
    second = await holder.get_storage(remote).load(
        "files/b/m/index.bin", settings
    )
    assert second is first  # the memo'd object, no second decode
    assert len(calls) == 1
    assert second.cache_token == first.cache_token

    # memo hit must NOT bypass settings invalidation (embedder change)
    other = IndexSettings(indexes={"embedder": {"model_id": "other"}})
    assert (
        await holder.get_storage(remote).load("files/b/m/index.bin", other)
        is None
    )

    # re-minted bytes at the same URL: memo key includes the content
    # sha, so the stale record is not served
    rec2 = make_record(
        index_settings=settings,
        chunks=[
            Chunk(text="reminted", metadata={"chunk_id": 0, "page_number": 1})
        ],
    )
    # write-through via the holder so the byte LRU sees the new bytes
    # (the validator is disabled here, so the LRU is trusted as-is)
    await holder.get_storage(remote).store("files/b/m/index.bin", rec2)
    reloaded = await holder.get_storage(remote).load(
        "files/b/m/index.bin", settings
    )
    assert reloaded.chunks[0].text == "reminted"


def test_dial_client_rejects_absolute_urls():
    import asyncio

    import pytest

    from dial_rag_tpu.errors import InvalidDocumentError
    from dial_rag_tpu.service.dial_client import DialApiClient

    client = DialApiClient("http://dial/v1/", {}, "bkt")
    for url in (
        "https://attacker.example/x",
        "http://attacker.example/x",
        "//attacker.example/x",
    ):
        with pytest.raises(InvalidDocumentError):
            asyncio.run(client.get_file(url))
        with pytest.raises(InvalidDocumentError):
            asyncio.run(client.put_file(url, b"d", "t"))


def test_record_memo_sha_pins_bounded_bytes():
    """The identity-based sha memo pins the byte blobs it references;
    pinned BYTES are budgeted (not just entry count), and a blob larger
    than the budget — which the byte LRU would never cache, so it can
    never identity-hit again — is hashed but not memoized at all."""
    from dial_rag_tpu.storage.storage import RecordMemo, _sha256

    memo = RecordMemo(max_sha_entries=64, max_sha_bytes=1000)

    big = b"x" * 2000  # over budget: correct digest, nothing pinned
    assert memo.sha("u0", big) == _sha256(big)
    assert memo._sha_bytes == 0 and "u0" not in memo._sha_by_url

    blobs = {f"u{i}": bytes([i]) * 300 for i in range(1, 8)}
    for url, data in blobs.items():
        assert memo.sha(url, data) == _sha256(data)
        assert memo._sha_bytes <= 1000
        assert memo._sha_bytes == sum(
            len(d) for d, _ in memo._sha_by_url.values()
        )

    # the most recent entry still identity-hits
    assert memo.sha("u7", blobs["u7"]) == _sha256(blobs["u7"])
    assert "u7" in memo._sha_by_url

    # same-URL replacement swaps the pinned blob, no double counting
    replacement = b"y" * 300
    memo.sha("u7", replacement)
    assert memo._sha_bytes <= 1000
    assert memo._sha_by_url["u7"][0] is replacement


async def test_validated_memo_skips_byte_reads(tmp_path):
    """With a backend that provides a cheap content-change validator
    (LocalFileStorage stat token), repeat loads — and the FIRST load
    after a store — serve the memo'd record without reading the bytes
    at all; an out-of-band content change flips the token and forces
    the full read+sha+decode path; settings invalidation still runs on
    validated hits."""

    class CountingLocalStorage(LocalFileStorage):
        def __init__(self, root):
            super().__init__(root)
            self.byte_loads = 0

        async def load(self, url):
            self.byte_loads += 1
            return await super().load(url)

    holder = IndexStorageHolder()
    remote = CountingLocalStorage(str(tmp_path))
    settings = IndexSettings(indexes={"parser": {"chunk_size": 1000}})
    rec = make_record(index_settings=settings)
    url = "files/b/v/index.bin"

    await holder.get_storage(remote).store(url, rec)

    # store primed the memo + validator: zero byte reads to serve
    got = await holder.get_storage(remote).load(url, settings)
    assert got is rec and remote.byte_loads == 0
    got = await holder.get_storage(remote).load(url, settings)
    assert got is rec and remote.byte_loads == 0

    # validated hits never bypass settings invalidation
    other = IndexSettings(indexes={"embedder": {"model_id": "other"}})
    assert (
        await holder.get_storage(remote).load(url, other) is None
    ) and remote.byte_loads == 0

    # out-of-band rewrite (not via store): the stat token flips, the
    # next load takes the full read path and serves the NEW record
    rec2 = make_record(
        index_settings=settings,
        chunks=[Chunk(text="gamma", metadata={"chunk_id": 0})],
    )
    import asyncio as _aio

    await _aio.sleep(0.01)  # ensure a distinct mtime_ns tick
    (tmp_path / url).write_bytes(serialize_record(rec2))
    got = await holder.get_storage(remote).load(url, settings)
    assert got is not rec and remote.byte_loads == 1
    assert [c.text for c in got.chunks] == ["gamma"]

    # and the re-read result is re-memoized under the new token
    again = await holder.get_storage(remote).load(url, settings)
    assert again is got and remote.byte_loads == 1


async def test_dial_file_storage_validator_from_head_metadata():
    """DialFileStorage.validator derives a content-change token from
    HEAD metadata (one RTT vs re-downloading a multi-GB index), and
    returns None — disabling the validated fast path, never faking
    freshness — when the server lacks HEAD, errors, or serves neither
    an ETag nor Last-Modified (Content-Length alone can't attest
    unchanged content)."""
    import aiohttp

    from dial_rag_tpu.service.dial_client import DialApiClient, DialFileStorage

    class StubClient(DialApiClient):
        def __init__(self, headers_by_url):
            self._headers_by_url = headers_by_url

        async def head_file(self, relative_url):
            result = self._headers_by_url.get(relative_url)
            if isinstance(result, Exception):
                raise result
            return result

    ok = {"etag": '"abc"', "content-length": "12345"}
    client = StubClient(
        {
            "files/b/ok.bin": ok,
            "files/b/nohead.bin": None,
            "files/b/len-only.bin": {"content-length": "7"},
            "files/b/err.bin": aiohttp.ClientError("boom"),
        }
    )
    storage = DialFileStorage(client)

    token = await storage.validator("files/b/ok.bin")
    assert token == ("head", '"abc"', None, "12345")
    # stable across calls, distinct when the etag changes
    assert token == await storage.validator("files/b/ok.bin")
    ok["etag"] = '"def"'
    assert token != await storage.validator("files/b/ok.bin")

    assert await storage.validator("files/b/nohead.bin") is None
    assert await storage.validator("files/b/len-only.bin") is None
    assert await storage.validator("files/b/err.bin") is None
