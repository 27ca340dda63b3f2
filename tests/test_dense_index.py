"""DenseIndex behavioral parity with the reference EmbeddingsIndex.

Cases mirror tests/test_embeddings_index.py in the reference: stability
across document order, limits, empty indexes — plus a randomized
equivalence test against a numpy transcription of the reference's
per-document scan + global stable merge (embeddings_index.py:51-89).
"""

import numpy as np
import pytest

from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.ops.metrics import Metric

DOC1 = DocEmbeddings(
    chunk_ids=np.array([0, 1]),
    embeddings=np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=np.float32),
)
DOC2 = DocEmbeddings(
    chunk_ids=np.array([0]),
    embeddings=np.array([[1.0, 0.0, 0.0]], dtype=np.float32),
)
DOC3 = DocEmbeddings(chunk_ids=np.array([]), embeddings=np.array([]))


def hit(doc_id, chunk_id):
    return SearchHit(doc_id, chunk_id, RetrievalType.TEXT)


@pytest.mark.parametrize("metric", list(Metric))
def test_search_stability(metric):
    docs = [DOC1, DOC2, DOC3]
    index = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=1)
    assert index.find(np.array([1.0, 0.0, 0.0])) == [hit(0, 0)]

    index_reversed = DenseIndex(
        RetrievalType.TEXT, docs[::-1], metric=metric, limit=1
    )
    assert index_reversed.find(np.array([1.0, 0.0, 0.0])) == [hit(1, 0)]


@pytest.mark.parametrize("metric", list(Metric))
@pytest.mark.parametrize("limit", [1, 2, 3, 10])
def test_different_limits(metric, limit):
    index = DenseIndex(
        RetrievalType.TEXT, [DOC1, DOC2, DOC3], metric=metric, limit=limit
    )
    expected = [hit(0, 0), hit(1, 0), hit(0, 1)][:limit]
    assert index.find(np.array([1.0, 0.0, 0.0])) == expected


@pytest.mark.parametrize("metric", list(Metric))
def test_empty_index(metric):
    query = np.array([0.0, 0.0, 0.0])
    assert DenseIndex(RetrievalType.TEXT, [], metric=metric).find(query) == []
    assert (
        DenseIndex(RetrievalType.TEXT, [DOC3], metric=metric).find(query) == []
    )


def _reference_find(doc_list, query, metric, limit):
    """Numpy transcription of the reference two-stage scan for equivalence."""

    def distances(docs):
        dot = docs @ query
        if metric == Metric.INNER_PRODUCT:
            return -dot
        if metric == Metric.COSINE_SIM:
            return -dot / np.maximum(
                np.linalg.norm(docs, axis=1) * np.linalg.norm(query), 1e-8
            )
        d = (docs**2).sum(1) - 2 * dot + (query**2).sum()
        return np.sqrt(np.maximum(d, 0)) if metric == Metric.EUCLIDEAN_DIST else d

    all_doc_ids, all_chunk_ids, all_d = [], [], []
    for i, doc in enumerate(doc_list):
        if doc.num_rows == 0:
            continue
        d = distances(doc.embeddings.astype(np.float32))
        top = np.argsort(d, kind="stable")[:limit]
        all_doc_ids.extend([i] * len(top))
        all_chunk_ids.extend(doc.chunk_ids[top])
        all_d.extend(d[top])
    order = np.argsort(np.array(all_d), kind="stable")[:limit]
    return [
        (all_doc_ids[j], int(all_chunk_ids[j])) for j in order
    ]


@pytest.mark.parametrize("metric", list(Metric))
@pytest.mark.parametrize("limit", [1, 7, 23])
def test_randomized_equivalence_with_reference_scan(metric, limit):
    rng = np.random.default_rng(7)
    docs = []
    for n in [3, 0, 17, 129, 1]:
        # quantize to force distance ties across and within documents
        emb = rng.integers(-2, 3, size=(n, 8)).astype(np.float32)
        docs.append(DocEmbeddings(chunk_ids=np.arange(n) * 2, embeddings=emb))
    query = rng.integers(-2, 3, size=(8,)).astype(np.float32)

    index = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=limit)
    got = [(h.doc_id, h.chunk_id) for h in index.find(query)]
    assert got == _reference_find(docs, query, metric, limit)


def test_multi_embedding_chunks():
    # several rows may map to the same chunk (per-page multi embeddings)
    doc = DocEmbeddings(
        chunk_ids=np.array([5, 5, 9]),
        embeddings=np.array(
            [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]], dtype=np.float32
        ),
    )
    index = DenseIndex(
        RetrievalType.IMAGE, [doc], metric=Metric.COSINE_SIM, limit=2
    )
    hits = index.find(np.array([1.0, 0.0]))
    assert [(h.chunk_id, h.retrieval_type) for h in hits] == [
        (5, RetrievalType.IMAGE),
        (5, RetrievalType.IMAGE),
    ]


def test_bfloat16_storage_ranking():
    """bf16 index: half the HBM bytes, same top-k on separated data,
    distances within bf16 tolerance."""
    import numpy as np

    from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
    from dial_rag_tpu.index.records import RetrievalType
    from dial_rag_tpu.ops.metrics import Metric

    rng = np.random.default_rng(11)
    n, d = 300, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, limit=5)
    bf16 = DenseIndex(
        RetrievalType.TEXT, docs, limit=5, storage_dtype="bfloat16"
    )
    assert bf16.nbytes * 2 == f32.nbytes
    q = emb[42] + 0.01 * rng.standard_normal(d).astype(np.float32)
    assert bf16.find(q)[0].chunk_id == 42
    _, d32 = f32.find_with_distances(q)
    _, d16 = bf16.find_with_distances(q)
    np.testing.assert_allclose(d16, d32, atol=0.5, rtol=0.05)


_TWO_PASS_METRICS = [
    Metric.SQEUCLIDEAN_DIST,
    Metric.EUCLIDEAN_DIST,
    Metric.INNER_PRODUCT,
]


def _assert_identical(f32_index, tp_index, queries):
    """two_pass must return the IDENTICAL stable hit sequence as the
    f32 path (including tie order — exact ties are bitwise-equal in
    both computations, so stability transfers), with distances equal up
    to XLA fusion-order rounding (a few ulp — the same ambiguity the
    f32 kernel itself has vs a numpy scan on non-integer data)."""
    for q in queries:
        h32, d32 = f32_index.find_with_distances(q)
        htp, dtp = tp_index.find_with_distances(q)
        assert htp == h32
        np.testing.assert_allclose(
            np.asarray(dtp, dtype=np.float32),
            np.asarray(d32, dtype=np.float32),
            rtol=4e-6,
            atol=1e-6,
        )
    b32 = f32_index.find_batch(np.stack(queries))
    btp = tp_index.find_batch(np.stack(queries))
    assert btp == b32


@pytest.mark.parametrize("metric", _TWO_PASS_METRICS)
def test_two_pass_exactness_random(metric):
    """Random corpora: the bf16-prefilter + f32-rescore path returns
    the identical (values, stable indices) result as the exact scan."""
    rng = np.random.default_rng(7)
    n, d = 3000, 48
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=7)
    tp = DenseIndex(
        RetrievalType.TEXT, docs, metric=metric, limit=7,
        storage_dtype="two_pass",
    )
    queries = [
        (emb[i] + 0.05 * rng.standard_normal(d)).astype(np.float32)
        for i in range(0, 40, 5)
    ] + [rng.standard_normal(d).astype(np.float32) for _ in range(8)]
    _assert_identical(f32, tp, queries)


@pytest.mark.parametrize("metric", _TWO_PASS_METRICS)
def test_two_pass_exactness_adversarial_ties(metric):
    """Tie-stress corpora where the bf16 prefilter CANNOT separate
    candidates: hundreds of exactly-duplicated rows (exact ties — the
    stable earliest-row order is the whole answer) and wide bands of
    rows whose differences vanish at bf16 resolution (the f32 order is
    invisible to pass 1). The window check must detect both and fall
    back to the exact scan."""
    rng = np.random.default_rng(13)
    d = 48
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    # 300 exact duplicates + 300 rows perturbed below bf16 resolution
    # (~2^-9 relative) + noise rows
    dup = np.tile(base, (300, 1))
    near = base + 1e-7 * rng.standard_normal((300, d)).astype(np.float32)
    noise = rng.standard_normal((400, d)).astype(np.float32)
    emb = np.concatenate([noise[:200], dup, near, noise[200:]]).astype(
        np.float32
    )
    n = emb.shape[0]
    # shuffle so ties are scattered across row order
    perm = rng.permutation(n)
    emb = emb[perm]
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=7)
    tp = DenseIndex(
        RetrievalType.TEXT, docs, metric=metric, limit=7,
        storage_dtype="two_pass",
    )
    queries = [
        base,  # lands in the middle of 600 near-tied rows
        (base + 1e-8).astype(np.float32),
        rng.standard_normal(d).astype(np.float32),
    ]
    _assert_identical(f32, tp, queries)


def test_two_pass_fast_path_engages_on_separated_data():
    """On well-separated data the certified window must be contained in
    the candidate budget (ok=True) — otherwise every query would pay
    the fallback scan and the mode would be pointless."""
    import jax.numpy as jnp

    from dial_rag_tpu.index.dense_index import _find_two_pass_kernel

    rng = np.random.default_rng(3)
    n, d = 3000, 48
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    docs = [DocEmbeddings(chunk_ids=np.arange(n), embeddings=emb)]
    tp = DenseIndex(
        RetrievalType.TEXT, docs, limit=7, storage_dtype="two_pass"
    )
    q = rng.standard_normal(d).astype(np.float32)
    ok, _, _ = _find_two_pass_kernel(
        tp._emb,
        tp._emb_f32,
        jnp.asarray(q),
        jnp.int32(tp.n_rows),
        *tp._err,
        metric=tp.metric,
        k=7,
    )
    assert bool(ok)


def test_two_pass_small_corpus_and_padding():
    """n_valid <= candidate budget: every row is a candidate, results
    exact, padding rows never surface."""
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((10, 16)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(10), embeddings=emb)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, limit=7)
    tp = DenseIndex(
        RetrievalType.TEXT, docs, limit=7, storage_dtype="two_pass"
    )
    _assert_identical(
        f32, tp, [rng.standard_normal(16).astype(np.float32)]
    )
    assert len(tp.find(rng.standard_normal(16).astype(np.float32))) == 7


def test_two_pass_rejects_cosine():
    with pytest.raises(ValueError, match="two_pass"):
        DenseIndex(
            RetrievalType.TEXT,
            [DOC1],
            metric=Metric.COSINE_SIM,
            storage_dtype="two_pass",
        )


def test_two_pass_nbytes_accounts_both_matrices():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((600, 32)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(600), embeddings=emb)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, limit=5)
    tp = DenseIndex(
        RetrievalType.TEXT, docs, limit=5, storage_dtype="two_pass"
    )
    assert tp.nbytes == f32.nbytes * 3 // 2


@pytest.mark.parametrize("storage_dtype", ["float32", "two_pass"])
def test_device_resident_query_parity(storage_dtype):
    """A jax-array query (the serving fast path: embed_queries_device
    rows handed straight to find, no intermediate D2H) returns results
    identical to the same query as a host numpy array, on both the
    plain f32 layout and the two-pass layout, for find, batch finds,
    and find_with_distances."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(300), embeddings=emb)]
    index = DenseIndex(
        RetrievalType.TEXT, docs, limit=7, storage_dtype=storage_dtype
    )
    queries = rng.standard_normal((3, 16)).astype(np.float32)

    for q in queries:
        assert index.find(jnp.asarray(q)) == index.find(q)
        hits_d, dists_d = index.find_with_distances(jnp.asarray(q))
        hits_h, dists_h = index.find_with_distances(q)
        assert hits_d == hits_h
        np.testing.assert_array_equal(
            np.asarray(dists_d), np.asarray(dists_h)
        )
    assert index.find_batch(jnp.asarray(queries)) == index.find_batch(
        queries
    )
    # [1, D]-shaped device rows (an unsliced single-query encode batch)
    assert index.find(jnp.asarray(queries[:1])) == index.find(queries[0])


# --- int8 storage (quarter-byte capacity layout) ---------------------------


def _clustered(n_clusters=16, per=32, d=64, seed=5):
    """Well-separated clusters. Quantization error at these magnitudes
    (absmax ~30 -> step ~0.25) EXCEEDS the intra-cluster spread by
    design, so the guarantee under test is cluster-level agreement (the
    serving-relevant property), not within-cluster ordering."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 10.0
    rows = np.concatenate(
        [
            c + rng.normal(size=(per, d)).astype(np.float32) * 0.05
            for c in centers
        ]
    )
    return rows, centers


@pytest.mark.parametrize(
    "metric",
    [Metric.SQEUCLIDEAN_DIST, Metric.EUCLIDEAN_DIST],
)
def test_int8_matches_f32_cluster_on_separated_data(metric):
    rows, centers = _clustered()
    per = 32
    docs = [DocEmbeddings(np.arange(len(rows)), rows)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, metric=metric, limit=7)
    i8 = DenseIndex(
        RetrievalType.TEXT, docs, metric=metric, limit=7,
        storage_dtype="int8",
    )
    assert i8.nbytes < f32.nbytes / 3
    for ci, q in enumerate(centers):
        f32_clusters = {h.chunk_id // per for h in f32.find(q)}
        i8_clusters = {h.chunk_id // per for h in i8.find(q)}
        assert f32_clusters == {ci}
        assert i8_clusters == {ci}


def test_int8_exact_when_rows_are_representable():
    """Rows whose values are exact multiples of their scale quantize
    losslessly, so distances must match the f32 scan to float
    tolerance (validates the reconstruction arithmetic itself)."""
    rng = np.random.default_rng(11)
    q_int = rng.integers(-127, 128, size=(256, 32)).astype(np.float32)
    # pin absmax to exactly 127 so the QUERY quantization (absmax/127
    # scale) is also lossless when a row is used as the query
    q_int[:, 0] = 127.0
    scales = rng.uniform(0.01, 0.1, size=(256, 1)).astype(np.float32)
    rows = q_int * scales
    docs = [DocEmbeddings(np.arange(256), rows)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, limit=5)
    i8 = DenseIndex(RetrievalType.TEXT, docs, limit=5, storage_dtype="int8")
    for qi in range(8):
        # queries that are themselves representable: zero quantization
        # error anywhere in the pipeline
        q = rows[qi * 3]
        h32, d32 = f32.find_with_distances(q)
        h8, d8 = i8.find_with_distances(q)
        assert [x.chunk_id for x in h8] == [x.chunk_id for x in h32]
        # atol 1e-3: the f32 expansion can give a slightly NEGATIVE
        # self-distance (d^2-2qd+q^2 cancellation) where int8 clamps at 0
        np.testing.assert_allclose(d8, d32, rtol=1e-4, atol=1e-3)


def test_int8_batch_matches_single():
    rows, centers = _clustered(seed=7)
    docs = [DocEmbeddings(np.arange(len(rows)), rows)]
    i8 = DenseIndex(RetrievalType.TEXT, docs, limit=4, storage_dtype="int8")
    singles = [i8.find(c) for c in centers]
    batched = i8.find_batch(np.stack(centers))
    assert batched == singles


def test_int8_topk_overlap_on_normalized_embeddings():
    """On L2-normalized random vectors (the serving distribution) the
    int8 top-7 must agree with f32 on the vast majority of entries."""
    rng = np.random.default_rng(3)
    rows = rng.normal(size=(4096, 384)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    docs = [DocEmbeddings(np.arange(len(rows)), rows)]
    f32 = DenseIndex(RetrievalType.TEXT, docs, limit=7)
    i8 = DenseIndex(RetrievalType.TEXT, docs, limit=7, storage_dtype="int8")
    overlaps = []
    for qi in range(32):
        q = rows[qi] + rng.normal(size=384).astype(np.float32) * 0.05
        a = {h.chunk_id for h in f32.find(q)}
        b = {h.chunk_id for h in i8.find(q)}
        overlaps.append(len(a & b) / 7)
    assert np.mean(overlaps) >= 0.85, overlaps


def test_int8_rejects_cosine():
    with pytest.raises(ValueError, match="int8"):
        DenseIndex(
            RetrievalType.TEXT,
            [DOC1],
            metric=Metric.COSINE_SIM,
            storage_dtype="int8",
        )


def test_int8_zero_rows_and_padding():
    docs = [DOC1, DOC2, DOC3]
    i8 = DenseIndex(RetrievalType.TEXT, docs, limit=3, storage_dtype="int8")
    assert i8.find(np.array([1.0, 0.0, 0.0]))[0] == hit(0, 0)
    # all-zero query hits the zero-scale guard, still returns k hits
    assert len(i8.find(np.array([0.0, 0.0, 0.0]))) == 3


@pytest.mark.parametrize("storage", ["float32", "bfloat16"])
@pytest.mark.parametrize("metric", _TWO_PASS_METRICS)
def test_blockselect_identical_to_full_topk(storage, metric):
    """The block-select single-query path (round 5: replaces the
    [N]-wide stable top-k that costs more than the roofline distance
    pass at corpus scale) must return the IDENTICAL hits and distances
    as the full-scan kernel on the same stored matrix — random corpora
    AND adversarial tie corpora (where the certificate must fall back)."""
    import jax.numpy as jnp

    from dial_rag_tpu.index.dense_index import _find_kernel

    rng = np.random.default_rng(21)
    d = 48
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    dup = np.tile(base, (300, 1))
    near = base + 1e-7 * rng.standard_normal((300, d)).astype(np.float32)
    noise = rng.standard_normal((2400, d)).astype(np.float32)
    emb = np.concatenate([noise[:1200], dup, near, noise[1200:]]).astype(
        np.float32
    )
    emb = emb[rng.permutation(emb.shape[0])]
    docs = [DocEmbeddings(chunk_ids=np.arange(emb.shape[0]), embeddings=emb)]
    idx = DenseIndex(
        RetrievalType.TEXT, docs, metric=metric, limit=7,
        storage_dtype=storage,
    )
    assert idx._norm_max is not None
    queries = [
        base,
        (base + 1e-8).astype(np.float32),
        rng.standard_normal(d).astype(np.float32),
        (emb[77] + 0.02 * rng.standard_normal(d)).astype(np.float32),
    ]
    for q in queries:
        hits, dists = idx.find_with_distances(q)
        ref_vals, ref_idx = _find_kernel(
            idx._emb,
            jnp.asarray(q),
            jnp.int32(idx.n_rows),
            metric=idx.metric,
            k=7,
            use_sort=False,
        )
        assert [h.chunk_id for h in hits] == [
            int(idx._chunk_ids[i]) for i in np.asarray(ref_idx)
        ]
        np.testing.assert_allclose(
            np.asarray(dists, dtype=np.float32),
            np.asarray(ref_vals),
            rtol=2e-6,
            atol=2e-6,
        )


def test_blockselect_cosine_keeps_full_scan(monkeypatch):
    """Cosine has no query-independent rounding bound — it must stay on
    the full-scan path (block-select never invoked), though it still
    uses the cached row norms for its denominator."""
    import dial_rag_tpu.index.dense_index as di

    rng = np.random.default_rng(22)
    emb = rng.standard_normal((600, 16)).astype(np.float32)
    docs = [DocEmbeddings(chunk_ids=np.arange(600), embeddings=emb)]
    idx = DenseIndex(
        RetrievalType.TEXT, docs, metric=Metric.COSINE_SIM, limit=5
    )

    def boom(*a, **k):
        raise AssertionError("block-select must not run for cosine")

    monkeypatch.setattr(di, "_find_blockselect_kernel", boom)
    assert len(idx.find(rng.standard_normal(16).astype(np.float32))) == 5
