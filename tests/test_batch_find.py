"""Batched multi-query dense scan matches per-query results exactly."""

import numpy as np
import pytest

from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
from dial_rag_tpu.index.records import RetrievalType
from dial_rag_tpu.ops.metrics import (
    Metric,
    pairwise_distances,
    pairwise_distances_batch,
)


@pytest.mark.parametrize("metric", list(Metric))
def test_batch_metrics_match_single(metric):
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((50, 16)).astype(np.float32)
    queries = rng.standard_normal((9, 16)).astype(np.float32)
    queries[3] = 0.0  # zero-vector guard row
    batch = np.asarray(pairwise_distances_batch(queries, docs, metric))
    for i, q in enumerate(queries):
        single = np.asarray(pairwise_distances(q, docs, metric))
        np.testing.assert_allclose(batch[i], single, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("metric", list(Metric))
def test_find_batch_matches_find(metric):
    rng = np.random.default_rng(1)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(n),
            embeddings=rng.standard_normal((n, 8)).astype(np.float32),
        )
        for n in (17, 3, 40)
    ]
    index = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=7)
    queries = rng.standard_normal((5, 8)).astype(np.float32)
    batched = index.find_batch(queries)
    for q, hits in zip(queries, batched):
        assert hits == index.find(q)


def test_find_batch_tie_stability():
    emb = np.tile(np.ones(8, dtype=np.float32), (100, 1))
    index = DenseIndex(
        RetrievalType.TEXT,
        [DocEmbeddings(chunk_ids=np.arange(100), embeddings=emb)],
        metric=Metric.SQEUCLIDEAN_DIST,
        limit=4,
    )
    out = index.find_batch(np.ones((3, 8), dtype=np.float32))
    for hits in out:
        assert [h.chunk_id for h in hits] == [0, 1, 2, 3]


def test_find_batch_empty_cases():
    index = DenseIndex(RetrievalType.TEXT, [], limit=3)
    assert index.find_batch(np.zeros((2, 8), dtype=np.float32)) == [[], []]
    rng = np.random.default_rng(2)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(2),
            embeddings=rng.standard_normal((2, 8)).astype(np.float32),
        )
    ]
    index = DenseIndex(RetrievalType.TEXT, docs, limit=7)
    out = index.find_batch(rng.standard_normal((1, 8)).astype(np.float32))
    assert len(out) == 1 and len(out[0]) == 2  # fewer rows than limit


def test_semantic_retrieve_batch_matches_single():
    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.models.tokenizer import build_test_vocab
    from dial_rag_tpu.retrieval.semantic import SemanticRetriever

    embedder = BgeEmbedder.from_random(
        vocab=build_test_vocab([chr(c) for c in range(97, 123)]),
        batch_size=8,
    )
    rng = np.random.default_rng(3)
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    embs = embedder.embed_documents(texts)
    docs = [DocEmbeddings(chunk_ids=np.arange(len(texts)), embeddings=embs)]
    index = DenseIndex(RetrievalType.TEXT, docs, limit=2)
    r = SemanticRetriever(embedder, index)
    queries = ["beta", "eta theta", "missing words"]
    batched = r.retrieve_batch(queries)
    assert batched == [r.retrieve(q) for q in queries]


def test_bm25_top_n_batch_matches_single():
    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(9)
    words = ["alps", "climate", "glacier", "peak", "valley", "snow"]
    items = [
        list(rng.choice(words, size=int(rng.integers(3, 10))))
        for _ in range(40)
    ]
    index = Bm25Index.build(items)
    queries = [["alps"], ["climate", "glacier"], ["peak", "missing"], []]
    batched = index.top_n_batch(queries, 5)
    for q, got in zip(queries, batched):
        np.testing.assert_array_equal(got, index.top_n(q, 5))


async def test_ensemble_batch_matches_single():
    from dial_rag_tpu.retrieval.ensemble import EnsembleRetriever

    class Fixed:
        def __init__(self, by_query):
            self.by_query = by_query

        async def aretrieve(self, query):
            return self.by_query[query]

    from dial_rag_tpu.index.records import RetrievalType, SearchHit

    h = lambda d, c: SearchHit(d, c, RetrievalType.TEXT)
    r1 = Fixed({"a": [h(0, 0), h(0, 1)], "b": [h(1, 0)]})
    r2 = Fixed({"a": [h(0, 1)], "b": [h(0, 0), h(1, 0)]})
    ens = EnsembleRetriever([r1, r2])
    batched = await ens.aretrieve_batch(["a", "b"])
    singles = [await ens.aretrieve(q) for q in ["a", "b"]]
    assert batched == singles


def test_afind_coalesces_concurrent_queries_and_matches_find():
    """Concurrent ``afind`` calls coalesce into find_batch waves (one
    device dispatch + one host sync per wave) with results identical to
    per-query ``find`` — the cross-request serving coalescing the
    micro-batcher gives the encode side, applied to the scan side."""
    import asyncio

    rng = np.random.default_rng(7)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(n),
            embeddings=rng.standard_normal((n, 8)).astype(np.float32),
        )
        for n in (23, 41)
    ]
    for storage in ("float32", "two_pass"):
        index = DenseIndex(
            RetrievalType.TEXT,
            docs,
            metric=Metric.SQEUCLIDEAN_DIST,
            limit=5,
            storage_dtype=storage,
        )
        waves: list[int] = []
        orig = index._scan_wave

        def spy(queries, _orig=orig):
            waves.append(len(queries))
            return _orig(queries)

        index._scan_wave = spy
        queries = rng.standard_normal((11, 8)).astype(np.float32)

        async def run_all():
            return await asyncio.gather(
                *(index.afind(q) for q in queries)
            )

        results = asyncio.run(run_all())
        for q, hits in zip(queries, results):
            assert hits == index.find(q)
        # everything submitted inside one loop tick lands in one wave
        # (max_batch permitting)
        assert sum(waves) == len(queries)
        assert max(waves) > 1, waves


def _no_resolve(self):  # pragma: no cover - fails the test if reached
    raise AssertionError(
        "DeviceRow.resolve() dispatched a per-row slice on the wave path"
    )


def test_device_row_wave_scans_parent_without_row_slices(monkeypatch):
    """A scan wave whose queries are DeviceRow views of ONE encode
    output must consume the parent array directly (identity layout) or
    via one gather (subset/scrambled) — never per-row slices, which
    cost one eager dispatch each (and one compile per distinct offset
    through the remote tunnel)."""
    import jax.numpy as jnp

    from dial_rag_tpu.utils.device_rows import DeviceRow

    rng = np.random.default_rng(11)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(n),
            embeddings=rng.standard_normal((n, 8)).astype(np.float32),
        )
        for n in (23, 41)
    ]
    # parent mimics an encode-bucket wave output: 8 rows, 5 real
    parent_np = rng.standard_normal((8, 8)).astype(np.float32)
    parent = jnp.asarray(parent_np)
    for storage in ("float32", "two_pass"):
        index = DenseIndex(
            RetrievalType.TEXT,
            docs,
            metric=Metric.SQEUCLIDEAN_DIST,
            limit=5,
            storage_dtype=storage,
        )
        monkeypatch.setattr(DeviceRow, "resolve", _no_resolve)
        # identity layout: rows 0..q-1 of the padded parent
        rows = [DeviceRow(parent, i) for i in range(5)]
        got = index._scan_wave(rows)
        # subset/scrambled layout: one gather dispatch, no slices
        scrambled = [DeviceRow(parent, i) for i in (3, 0, 4)]
        got_scrambled = index._scan_wave(scrambled)
        monkeypatch.undo()
        for i, hits in enumerate(got):
            assert hits == index.find(parent_np[i])
        for j, hits in zip((3, 0, 4), got_scrambled):
            assert hits == index.find(parent_np[j])


def test_device_row_mixed_parents_fall_back_and_match():
    """Rows from different encode waves in one scan wave resolve
    individually (the rare fallback) with identical results."""
    import jax.numpy as jnp

    from dial_rag_tpu.utils.device_rows import DeviceRow

    rng = np.random.default_rng(12)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(17),
            embeddings=rng.standard_normal((17, 8)).astype(np.float32),
        )
    ]
    index = DenseIndex(RetrievalType.TEXT, docs, limit=4)
    a = rng.standard_normal((8, 8)).astype(np.float32)
    b = rng.standard_normal((8, 8)).astype(np.float32)
    rows = [DeviceRow(jnp.asarray(a), 1), DeviceRow(jnp.asarray(b), 2)]
    got = index._scan_wave(rows)
    assert got[0] == index.find(a[1])
    assert got[1] == index.find(b[2])


def test_device_row_np_coercion_and_single_find():
    """A lone DeviceRow (serial path) materializes once and matches the
    plain-array query; np.asarray coercion yields the parent row."""
    import jax.numpy as jnp

    from dial_rag_tpu.utils.device_rows import DeviceRow

    rng = np.random.default_rng(13)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(17),
            embeddings=rng.standard_normal((17, 8)).astype(np.float32),
        )
    ]
    index = DenseIndex(RetrievalType.TEXT, docs, limit=4)
    parent_np = rng.standard_normal((8, 8)).astype(np.float32)
    row = DeviceRow(jnp.asarray(parent_np), 2)
    np.testing.assert_allclose(np.asarray(row), parent_np[2], rtol=1e-6)
    assert index.find(row) == index.find(parent_np[2])
