"""Sharded dense index on an 8-device virtual CPU mesh.

Asserts exact equivalence with the single-chip DenseIndex (which in turn
carries the reference-equivalence proof for aidial_rag/retrievers/
embeddings_index.py:51-89), including the stable tie-break by global row
order across shard boundaries.
"""

import jax
import numpy as np
import pytest

from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
from dial_rag_tpu.index.records import RetrievalType
from dial_rag_tpu.ops.metrics import Metric
from dial_rag_tpu.parallel.mesh import create_mesh
from dial_rag_tpu.parallel.sharded_index import ShardedDenseIndex


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return create_mesh(8)


def _random_docs(rng, n_docs, rows_per_doc, dim=16):
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(1, rows_per_doc + 1))
        docs.append(
            DocEmbeddings(
                chunk_ids=np.arange(n),
                embeddings=rng.standard_normal((n, dim)).astype(np.float32),
            )
        )
    return docs


@pytest.mark.parametrize("metric", list(Metric))
def test_matches_single_chip(mesh, metric):
    rng = np.random.default_rng(0)
    docs = _random_docs(rng, n_docs=5, rows_per_doc=40)
    query = rng.standard_normal(16).astype(np.float32)

    single = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=7)
    sharded = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, metric=metric, limit=7
    )
    s_hits, s_dists = single.find_with_distances(query)
    m_hits, m_dists = sharded.find_with_distances(query)
    assert m_hits == s_hits
    np.testing.assert_allclose(m_dists, s_dists, rtol=1e-6, atol=1e-6)


def test_tie_break_across_shards(mesh):
    # All-identical rows: every distance ties; winners must be the first
    # `limit` global rows in order, regardless of shard boundaries.
    n = 3000  # > one 512-row shard block, spans several shards
    emb = np.tile(np.ones(8, dtype=np.float32), (n, 1))
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    sharded = ShardedDenseIndex(
        RetrievalType.TEXT,
        docs,
        mesh,
        metric=Metric.SQEUCLIDEAN_DIST,
        limit=5,
    )
    hits = sharded.find(np.ones(8, dtype=np.float32))
    assert [h.chunk_id for h in hits] == [0, 1, 2, 3, 4]


def test_fewer_rows_than_limit(mesh):
    rng = np.random.default_rng(1)
    docs = [
        DocEmbeddings(
            chunk_ids=np.arange(3),
            embeddings=rng.standard_normal((3, 8)).astype(np.float32),
        )
    ]
    sharded = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, metric=Metric.COSINE_SIM, limit=7
    )
    hits = sharded.find(rng.standard_normal(8).astype(np.float32))
    assert len(hits) == 3


def test_empty_index(mesh):
    sharded = ShardedDenseIndex(RetrievalType.TEXT, [], mesh, limit=7)
    assert sharded.find(np.ones(8, dtype=np.float32)) == []


def test_rows_spread_across_all_shards(mesh):
    # Enough rows that every shard holds real data; nearest row is found
    # no matter which shard it landed on.
    rng = np.random.default_rng(2)
    n = 8 * 512 + 17
    emb = rng.standard_normal((n, 8)).astype(np.float32)
    target = int(rng.integers(0, n))
    query = emb[target] * 1.0
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    sharded = ShardedDenseIndex(
        RetrievalType.TEXT,
        docs,
        mesh,
        metric=Metric.SQEUCLIDEAN_DIST,
        limit=1,
    )
    hits = sharded.find(query)
    assert hits[0].chunk_id == target


def test_multihost_helpers_single_process():
    """Single-process behavior of the DCN helpers (a real pod exercises
    the same code path with env-driven discovery)."""
    from dial_rag_tpu.parallel.multihost import (
        create_global_mesh,
        initialize_multihost,
    )

    assert initialize_multihost() is False  # no coordinator here
    m = create_global_mesh(tp=2)
    assert dict(m.shape) == {"dp": 4, "tp": 2}
    import pytest

    with pytest.raises(ValueError):
        create_global_mesh(tp=3)


def test_find_batch_matches_single_chip_batch(mesh):
    rng = np.random.default_rng(5)
    docs = _random_docs(rng, n_docs=4, rows_per_doc=50)
    queries = rng.standard_normal((6, 16)).astype(np.float32)
    single = DenseIndex(RetrievalType.TEXT, docs, limit=7)
    sharded = ShardedDenseIndex(RetrievalType.TEXT, docs, mesh, limit=7)
    assert sharded.find_batch(queries) == single.find_batch(queries)


def test_sharded_bfloat16_storage(mesh):
    rng = np.random.default_rng(6)
    n = 1200
    emb = rng.standard_normal((n, 16)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    idx = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=3, storage_dtype="bfloat16"
    )
    f32 = ShardedDenseIndex(RetrievalType.TEXT, docs, mesh, limit=3)
    assert idx.nbytes * 2 == f32.nbytes
    target = 321
    q = emb[target] + 0.01 * rng.standard_normal(16).astype(np.float32)
    assert idx.find(q)[0].chunk_id == target


def test_sharded_bm25_matches_single_chip(mesh):
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25Index

    rng = np.random.default_rng(8)
    words = ["alps", "climate", "glacier", "peak", "valley", "snow",
             "river", "pass"]
    items = [
        list(rng.choice(words, size=int(rng.integers(3, 10))))
        for _ in range(60)
    ]
    single = Bm25Index.build(items)
    sharded = ShardedBm25Index(
        Bm25Index.build(items, device=False), mesh, limit=7
    )
    for q in (["alps"], ["climate", "glacier"], ["peak", "missing"],
              ["snow", "snow", "river"]):
        np.testing.assert_array_equal(
            sharded.top_n(q, 7), single.top_n(q, 7)
        )


def test_sharded_bm25_tiebreak_later_item_wins(mesh):
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25Index

    # identical items: all scores tie; reference order is reversed-index
    items = [["alps", "peak"]] * 40
    sharded = ShardedBm25Index(
        Bm25Index.build(items, device=False), mesh, limit=5
    )
    np.testing.assert_array_equal(
        sharded.top_n(["alps"], 5), np.array([39, 38, 37, 36, 35])
    )


def test_sharded_sparse_bm25_matches_single_chip(mesh):
    """Row-sharded CSC postings must reproduce the single-device sparse
    path exactly: scores AND the later-item-wins top-n order."""
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25SparseIndex

    rng = np.random.default_rng(11)
    words = ["alps", "climate", "glacier", "peak", "valley", "snow",
             "river", "pass", "boundary", "cadibona"]
    items = [
        list(rng.choice(words, size=int(rng.integers(3, 12))))
        for _ in range(75)
    ]
    single = Bm25Index.build(items, max_dense_bytes=0)
    sharded = ShardedBm25SparseIndex(
        Bm25Index.build(items, max_dense_bytes=0, device=False),
        mesh,
        limit=7,
    )
    for q in (["alps"], ["climate", "glacier"], ["peak", "missing"],
              ["snow", "snow", "river"], ["missing-only"]):
        np.testing.assert_allclose(
            sharded.get_scores(q),
            single.get_scores(q),
            rtol=1e-6,
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            sharded.top_n(q, 7), single.top_n(q, 7)
        )


def test_sharded_sparse_bm25_tiebreak_later_item_wins(mesh):
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25SparseIndex

    # identical items tie everywhere, INCLUDING across shard boundaries:
    # the two-key merge must order ties by reversed global row
    items = [["alps", "peak"]] * 40
    sharded = ShardedBm25SparseIndex(
        Bm25Index.build(items, max_dense_bytes=0, device=False),
        mesh,
        limit=12,
    )
    np.testing.assert_array_equal(
        sharded.top_n(["alps"], 12), np.arange(39, 27, -1)
    )


def test_sharded_sparse_bm25_retriever_wiring(mesh, monkeypatch):
    """The retriever picks the sharded sparse index when the dense
    weights would exceed the byte cap on a mesh."""
    from dial_rag_tpu.documents.model import (
        FORMAT_VERSION,
        DocumentRecord,
        IndexSettings,
        build_chunks_list,
    )
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25SparseIndex
    from dial_rag_tpu.retrieval import Bm25Retriever

    texts = [
        ("alps climate glacier", {"source": "s"}),
        ("cadibona boundary pass", {"source": "s"}),
        ("river valley snow", {"source": "s"}),
    ]
    record = DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=build_chunks_list(texts),
        text_index=[t[0].split() for t in texts],
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
    )

    real_build = Bm25Index.build.__func__
    monkeypatch.setattr(
        Bm25Index,
        "build",
        classmethod(
            lambda cls, items, **kw: real_build(
                cls, items, **{**kw, "max_dense_bytes": 0}
            )
        ),
    )
    retriever = Bm25Retriever.from_doc_records([record], k=2, mesh=mesh)
    assert isinstance(retriever._index, ShardedBm25SparseIndex)
    hits = retriever.retrieve("cadibona boundary")
    assert hits and hits[0].chunk_id == 1


def test_sharded_sparse_bm25_batch_matches_sequential(mesh):
    """top_n_batch (one vmapped sharded dispatch) must equal per-query
    top_n, including cross-shard tie order and out-of-vocab queries."""
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25SparseIndex

    rng = np.random.default_rng(13)
    words = ["alps", "climate", "glacier", "peak", "valley", "snow",
             "river", "pass", "boundary", "cadibona"]
    items = [
        list(rng.choice(words, size=int(rng.integers(3, 12))))
        for _ in range(50)
    ]
    sharded = ShardedBm25SparseIndex(
        Bm25Index.build(items, max_dense_bytes=0, device=False),
        mesh,
        limit=7,
    )
    # 9 queries: q_pad (16) must differ from the mesh size (8) so a
    # query-axis/shard-axis mixup cannot cancel out in the reshape
    queries = [["alps"], ["climate", "glacier", "climate"],
               ["missing-word"], ["snow", "river", "pass"],
               ["cadibona", "boundary"], ["valley"],
               ["peak", "peak"], ["glacier", "snow"],
               ["river", "cadibona", "alps"]]
    batched = sharded.top_n_batch(queries, 7)
    assert len(batched) == len(queries)
    for got, toks in zip(batched, queries):
        np.testing.assert_array_equal(got, sharded.top_n(toks, 7))


def _random_ragged_chunks(rng, n, d=16, t_max=9):
    return [
        rng.standard_normal((int(rng.integers(1, t_max)), d)).astype(
            np.float32
        )
        for _ in range(n)
    ]


def test_sharded_maxsim_matches_single_chip(mesh):
    """Row-sharded MaxSim == single-chip LateInteractionIndex: same hits
    in the same order with the same scores, across shard boundaries."""
    from dial_rag_tpu.index.late_interaction import LateInteractionIndex
    from dial_rag_tpu.parallel.sharded_index import (
        ShardedLateInteractionIndex,
    )

    rng = np.random.default_rng(0)
    doc_a = _random_ragged_chunks(rng, 700)
    doc_b = _random_ragged_chunks(rng, 650)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    single = LateInteractionIndex(
        RetrievalType.TEXT, [doc_a, doc_b], max_chunk_tokens=16, limit=9
    )
    sharded = ShardedLateInteractionIndex(
        RetrievalType.TEXT, [doc_a, doc_b], mesh,
        max_chunk_tokens=16, limit=9,
    )
    h1, s1 = single.find_with_scores(q)
    h2, s2 = sharded.find_with_scores(q)
    assert [(h.doc_id, h.chunk_id) for h in h1] == [
        (h.doc_id, h.chunk_id) for h in h2
    ]
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-5)


def test_sharded_maxsim_stable_ties_across_shards(mesh):
    """Identical chunks landing on different shards must still rank by
    global row order."""
    from dial_rag_tpu.parallel.sharded_index import (
        ShardedLateInteractionIndex,
    )

    d = 8
    tok = np.zeros((1, d), dtype=np.float32)
    tok[0, 0] = 1.0
    # enough rows that the copies straddle several shards
    rng = np.random.default_rng(1)
    filler = [
        (rng.standard_normal((2, d)) * 0.01).astype(np.float32)
        for _ in range(2000)
    ]
    chunks = list(filler)
    copy_positions = [3, 700, 1500, 1999]
    for pos in copy_positions:
        chunks[pos] = tok.copy()
    index = ShardedLateInteractionIndex(
        RetrievalType.TEXT, [chunks], mesh, max_chunk_tokens=4, limit=4
    )
    hits = index.find(tok)
    assert [h.chunk_id for h in hits] == copy_positions


def test_sharded_maxsim_empty_and_zero_token(mesh):
    from dial_rag_tpu.parallel.sharded_index import (
        ShardedLateInteractionIndex,
    )

    empty = np.zeros((0, 8), dtype=np.float32)
    q = np.ones((2, 8), dtype=np.float32)
    none_at_all = ShardedLateInteractionIndex(
        RetrievalType.TEXT, [[]], mesh, limit=3
    )
    assert none_at_all.find(q) == []
    all_zero = ShardedLateInteractionIndex(
        RetrievalType.TEXT, [[empty, empty]], mesh, limit=3
    )
    assert all_zero.find(q) == []
    assert all_zero.nbytes == 0


def test_sharded_maxsim_find_batch_matches_single(mesh):
    from dial_rag_tpu.index.late_interaction import LateInteractionIndex
    from dial_rag_tpu.parallel.sharded_index import (
        ShardedLateInteractionIndex,
    )

    rng = np.random.default_rng(2)
    chunks = _random_ragged_chunks(rng, 900)
    single = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=16, limit=5
    )
    sharded = ShardedLateInteractionIndex(
        RetrievalType.TEXT, [chunks], mesh, max_chunk_tokens=16, limit=5
    )
    queries = [
        rng.standard_normal((int(rng.integers(1, 6)), 16)).astype(
            np.float32
        )
        for _ in range(4)
    ] + [np.ones(16, np.float32)]  # malformed -> []
    got = sharded.find_batch(queries)
    want = single.find_batch(queries)
    assert got[-1] == [] and want[-1] == []
    for g, w in zip(got, want):
        assert [(h.doc_id, h.chunk_id) for h in g] == [
            (h.doc_id, h.chunk_id) for h in w
        ]


def test_sharded_sparse_band_activates_and_stays_exact():
    """High-df terms in the sharded CSC layout ride a row-sharded dense
    band (shard-local MXU matvec); scores + later-wins rankings must be
    exact vs the bandless sharded layout and the host reference."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.parallel.mesh import create_mesh
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25SparseIndex

    rng = np.random.default_rng(17)
    items = [
        (["common"] if i % 7 else [])
        + [f"w{int(x)}" for x in rng.integers(0, 200, size=6)]
        for i in range(500)
    ]
    mesh = create_mesh(8)
    banded = ShardedBm25SparseIndex(
        Bm25Index.build(items, max_dense_bytes=0, device=False),
        mesh,
        limit=5,
    )
    plain = ShardedBm25SparseIndex(
        Bm25Index.build(items, max_dense_bytes=0, device=False),
        mesh,
        limit=5,
        max_band_bytes=0,
    )
    assert banded._band_sh is not None and plain._band_sh is None
    queries = [["common", "w3"], ["common"], ["w7", "w9"], ["zz-oov"]]
    for q in queries:
        np.testing.assert_allclose(
            banded.get_scores(q), plain.get_scores(q), rtol=1e-6
        )
        np.testing.assert_array_equal(
            banded.top_n(q, 5), plain.top_n(q, 5)
        )
    got = banded.top_n_batch(queries, 5)
    want = plain.top_n_batch(queries, 5)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


# ---------------------------------------------------------------------------
# capacity / exactness storage layouts on the mesh (round-5: int8 and
# two_pass previously existed only single-chip — ShardedDenseIndex
# silently mapped int8 -> bf16 and two_pass -> f32)


def _assert_hits_identical(a_index, b_index, queries, rtol=1e-5):
    for q in queries:
        ha, da = a_index.find_with_distances(q)
        hb, db = b_index.find_with_distances(q)
        assert hb == ha
        np.testing.assert_allclose(
            np.asarray(db, dtype=np.float32),
            np.asarray(da, dtype=np.float32),
            rtol=rtol,
            atol=1e-6,
        )


@pytest.mark.parametrize(
    "metric",
    [Metric.SQEUCLIDEAN_DIST, Metric.EUCLIDEAN_DIST, Metric.INNER_PRODUCT],
)
def test_sharded_two_pass_exactness_random(mesh, metric):
    """Sharded two_pass must reproduce the sharded f32 scan identically
    (values AND stable tie order) on random corpora — the per-shard
    certificates compose into the global exactness claim."""
    rng = np.random.default_rng(70)
    n, d = 8 * 512 + 300, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    f32 = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, metric=metric, limit=7
    )
    tp = ShardedDenseIndex(
        RetrievalType.TEXT,
        docs,
        mesh,
        metric=metric,
        limit=7,
        storage_dtype="two_pass",
    )
    queries = [
        (emb[i] + 0.05 * rng.standard_normal(d)).astype(np.float32)
        for i in range(0, 4000, 512)
    ] + [rng.standard_normal(d).astype(np.float32) for _ in range(4)]
    _assert_hits_identical(f32, tp, queries)
    # and the single-chip two_pass agrees (same global result)
    single_tp = DenseIndex(
        RetrievalType.TEXT,
        docs,
        metric=metric,
        limit=7,
        storage_dtype="two_pass",
    )
    _assert_hits_identical(single_tp, tp, queries[:3])


def test_sharded_two_pass_adversarial_ties(mesh):
    """Duplicate/near-tied rows scattered across shard boundaries: the
    per-shard containment check must detect the unseparable window and
    fall back, keeping the exact stable global order."""
    rng = np.random.default_rng(71)
    d = 32
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    dup = np.tile(base, (600, 1))
    near = base + 1e-7 * rng.standard_normal((600, d)).astype(np.float32)
    noise = rng.standard_normal((3000, d)).astype(np.float32)
    emb = np.concatenate([noise[:1500], dup, near, noise[1500:]]).astype(
        np.float32
    )
    perm = rng.permutation(emb.shape[0])
    emb = emb[perm]
    docs = [
        DocEmbeddings(chunk_ids=np.arange(emb.shape[0]), embeddings=emb)
    ]
    f32 = ShardedDenseIndex(RetrievalType.TEXT, docs, mesh, limit=7)
    tp = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=7, storage_dtype="two_pass"
    )
    _assert_hits_identical(
        f32, tp, [base, (base + 1e-8).astype(np.float32)]
    )


def test_sharded_two_pass_fast_path_engages(mesh):
    """On separated data every shard's certificate must hold (ok=True)
    — otherwise sharded two_pass would always pay the fallback scan."""
    import jax.numpy as jnp

    from dial_rag_tpu.parallel.sharded_index import (
        _sharded_find_two_pass_kernel,
    )

    rng = np.random.default_rng(72)
    # enough rows that each shard's block count exceeds the candidate
    # budget (_TP_CBLK): with every block selected, the certificate
    # compares against the worst block-min and may honestly decline
    n, d = 8 * 8192 + 100, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    tp = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=7, storage_dtype="two_pass"
    )
    q = rng.standard_normal(d).astype(np.float32)
    ok, _, _ = _sharded_find_two_pass_kernel(
        tp._emb,
        tp._emb_f32,
        jnp.asarray(q),
        jnp.int32(tp.n_rows),
        *tp._err,
        mesh=tp._mesh,
        metric=tp.metric,
        k=7,
    )
    assert bool(ok)


def test_sharded_two_pass_batch_matches_single_queries(mesh):
    rng = np.random.default_rng(73)
    n, d = 2200, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    tp = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=5, storage_dtype="two_pass"
    )
    queries = rng.standard_normal((6, d)).astype(np.float32)
    batch = tp.find_batch(queries)
    for qi in range(6):
        assert batch[qi] == tp.find(queries[qi])


def test_sharded_two_pass_rejects_cosine(mesh):
    with pytest.raises(ValueError, match="two_pass"):
        ShardedDenseIndex(
            RetrievalType.TEXT,
            [],
            mesh,
            metric=Metric.COSINE_SIM,
            storage_dtype="two_pass",
        )


def test_sharded_int8_matches_single_chip_int8(mesh):
    """The sharded int8 scan quantizes identically to the single-chip
    layout and merges stably, so results must be IDENTICAL to the
    single-chip int8 index (both are the same approximation of f32)."""
    rng = np.random.default_rng(74)
    n, d = 8 * 512 + 123, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    for metric in (
        Metric.SQEUCLIDEAN_DIST,
        Metric.EUCLIDEAN_DIST,
        Metric.INNER_PRODUCT,
    ):
        single = DenseIndex(
            RetrievalType.TEXT,
            docs,
            metric=metric,
            limit=7,
            storage_dtype="int8",
        )
        sharded = ShardedDenseIndex(
            RetrievalType.TEXT,
            docs,
            mesh,
            metric=metric,
            limit=7,
            storage_dtype="int8",
        )
        for i in (0, 1000, 4000):
            q = (emb[i] + 0.05 * rng.standard_normal(d)).astype(
                np.float32
            )
            hs, ds = single.find_with_distances(q)
            hm, dm = sharded.find_with_distances(q)
            assert hm == hs, metric
            np.testing.assert_allclose(dm, ds, rtol=1e-5, atol=1e-6)


def test_sharded_int8_tie_break_across_shards(mesh):
    """Identical rows quantize identically, so every score ties exactly:
    winners must be the first `limit` global rows in order even when the
    ties span shard boundaries (same contract as the f32 layout)."""
    n = 3000
    emb = np.tile(np.ones(16, dtype=np.float32), (n, 1))
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    sharded = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=5, storage_dtype="int8"
    )
    hits = sharded.find(np.ones(16, dtype=np.float32))
    assert [h.chunk_id for h in hits] == [0, 1, 2, 3, 4]


def test_sharded_int8_batch_matches_single_queries(mesh):
    rng = np.random.default_rng(75)
    n, d = 1500, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    idx = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=5, storage_dtype="int8"
    )
    queries = rng.standard_normal((5, d)).astype(np.float32)
    batch = idx.find_batch(queries)
    for qi in range(5):
        assert batch[qi] == idx.find(queries[qi])


def test_sharded_int8_nbytes_quarter_of_f32(mesh):
    rng = np.random.default_rng(76)
    n, d = 4096, 64
    emb = rng.standard_normal((n, d)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    f32 = ShardedDenseIndex(RetrievalType.TEXT, docs, mesh, limit=3)
    i8 = ShardedDenseIndex(
        RetrievalType.TEXT, docs, mesh, limit=3, storage_dtype="int8"
    )
    # int8 rows + 8 bytes/row of scale+norm metadata
    assert i8.nbytes == f32.nbytes // 4 + n * 8


def test_sharded_maxsim_int8_matches_single_chip_int8(mesh):
    """Sharded LI int8 (per-token scales sharded with their rows) must
    agree with the single-chip int8 LateInteractionIndex."""
    from dial_rag_tpu.index.late_interaction import LateInteractionIndex
    from dial_rag_tpu.parallel.sharded_index import (
        ShardedLateInteractionIndex,
    )

    rng = np.random.default_rng(77)
    d = 16
    per_doc = []
    for _ in range(3):
        chunks = []
        for _ in range(40):
            t = int(rng.integers(1, 6))
            rows = rng.standard_normal((t, d)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            chunks.append(rows)
        per_doc.append(chunks)
    single = LateInteractionIndex(
        RetrievalType.TEXT,
        per_doc,
        max_chunk_tokens=8,
        limit=5,
        storage_dtype="int8",
    )
    sharded = ShardedLateInteractionIndex(
        RetrievalType.TEXT,
        per_doc,
        mesh,
        max_chunk_tokens=8,
        limit=5,
        storage_dtype="int8",
    )
    assert sharded._x.dtype == np.int8
    for _ in range(4):
        q = rng.standard_normal((5, d)).astype(np.float32)
        hs, ss = single.find_with_scores(q)
        hm, sm = sharded.find_with_scores(q)
        assert hm == hs
        np.testing.assert_allclose(sm, ss, rtol=1e-4, atol=1e-5)


def test_sharded_warm_query_buckets_compile_ahead(mesh):
    """Every sharded index type exposes warm_query_buckets (mesh
    deployments get the same compile-ahead the single-chip serving path
    gets via DeviceIndexCache warm=); post-warm queries stay correct."""
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.index.late_interaction import LateInteractionIndex
    from dial_rag_tpu.parallel.sharded_index import (
        ShardedBm25Index,
        ShardedBm25SparseIndex,
        ShardedLateInteractionIndex,
    )

    rng = np.random.default_rng(80)
    emb = rng.standard_normal((900, 16)).astype(np.float32)
    dense = ShardedDenseIndex(
        RetrievalType.TEXT,
        [DocEmbeddings(chunk_ids=np.arange(900), embeddings=emb)],
        mesh,
        limit=5,
    )
    dense.warm_query_buckets(max_q=16)
    assert dense.find(emb[123])[0].chunk_id == 123

    items = [[f"w{i % 40}", "common"] for i in range(300)]
    bm = ShardedBm25Index(
        Bm25Index.build(items, device=False), mesh, limit=5
    )
    bm.warm_query_buckets(k=5, max_q=8)
    assert len(bm.top_n(["w3"], 5)) == 5
    sparse = ShardedBm25SparseIndex(
        Bm25Index.build(items, max_dense_bytes=0, device=False),
        mesh,
        limit=5,
    )
    sparse.warm_query_buckets(k=5, max_q=8)
    assert len(sparse.top_n(["w3"], 5)) == 5

    chunks = [
        rng.standard_normal((3, 16)).astype(np.float32) for _ in range(60)
    ]
    li = ShardedLateInteractionIndex(
        RetrievalType.TEXT, [chunks], mesh, max_chunk_tokens=4, limit=3
    )
    li.warm_query_buckets(max_q=8)
    assert li.find(chunks[7])[0].chunk_id == 7
