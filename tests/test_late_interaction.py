"""Late-interaction (MaxSim) index + retriever.

Tier-1 parity: the device kernel must match a plain numpy MaxSim
reference exactly (f32), keep the stable earliest-row tie-break of the
dense index contract, and be invariant to every padding axis (rows,
chunk tokens, query-token bucket). Retriever-level: identical text is a
perfect MaxSim match (per-token cosine 1.0 for every query token), so
self-retrieval is deterministic even with random encoder weights.
"""

import numpy as np
import pytest

from dial_rag_tpu.documents.model import DocumentRecord, build_chunks_list
from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.index.late_interaction import LateInteractionIndex
from dial_rag_tpu.index.records import RetrievalType
from dial_rag_tpu.retrieval.late_interaction import LateInteractionRetriever


def numpy_maxsim(chunks: list[np.ndarray], q: np.ndarray) -> np.ndarray:
    """Reference scorer: sum over query tokens of max over chunk tokens."""
    scores = []
    for arr in chunks:
        if arr.size == 0:
            scores.append(-np.inf)
        else:
            scores.append(float((arr @ q.T).max(axis=0).sum()))
    return np.asarray(scores)


def random_ragged(rng, n, d=16, t_max=9):
    return [
        rng.standard_normal((int(rng.integers(1, t_max)), d)).astype(
            np.float32
        )
        for _ in range(n)
    ]


def test_matches_numpy_maxsim_exactly():
    rng = np.random.default_rng(0)
    chunks = random_ragged(rng, 37)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=16, limit=10
    )
    hits, scores = index.find_with_scores(q)
    ref = numpy_maxsim(chunks, q)
    order = np.argsort(-ref, kind="stable")[:10]
    assert [h.chunk_id for h in hits] == list(order)
    np.testing.assert_allclose(scores, ref[order], rtol=1e-6, atol=1e-5)


def test_stable_tie_break_earliest_row():
    d = 8
    tok = np.zeros((1, d), dtype=np.float32)
    tok[0, 0] = 1.0
    # three identical chunks -> identical scores -> earliest row wins
    index = LateInteractionIndex(
        RetrievalType.TEXT, [[tok.copy(), tok.copy(), tok.copy()]],
        max_chunk_tokens=4, limit=3,
    )
    hits = index.find(tok)
    assert [h.chunk_id for h in hits] == [0, 1, 2]


def test_multi_document_ids_and_order():
    rng = np.random.default_rng(1)
    doc_a = random_ragged(rng, 4)
    doc_b = random_ragged(rng, 6)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [doc_a, doc_b], max_chunk_tokens=16, limit=10
    )
    hits, scores = index.find_with_scores(q)
    ref = numpy_maxsim(doc_a + doc_b, q)
    order = np.argsort(-ref, kind="stable")
    expected = [
        (0, i) if i < 4 else (1, i - 4) for i in order
    ]
    assert [(h.doc_id, h.chunk_id) for h in hits] == expected


def test_padding_invariance():
    """Scores and ranking must not depend on the row bucket, the token
    padding, or the query-token bucket."""
    rng = np.random.default_rng(2)
    chunks = random_ragged(rng, 5)
    base_q = rng.standard_normal((2, 16)).astype(np.float32)
    small = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=10, limit=5
    )
    # different max_chunk_tokens (more padding), many more rows (row
    # bucket changes), longer query (different q bucket)
    big = LateInteractionIndex(
        RetrievalType.TEXT,
        [chunks + random_ragged(rng, 600)],
        max_chunk_tokens=32,
        limit=5,
    )
    h_small, s_small = small.find_with_scores(base_q)
    ref = numpy_maxsim(chunks, base_q)
    np.testing.assert_allclose(
        sorted(s_small, reverse=True), np.sort(ref)[::-1][:5], rtol=1e-6,
        atol=1e-5,
    )
    # the 5 original chunks keep their exact scores inside the big index
    h_big, s_big = big.find_with_scores(base_q)
    big_by_chunk = {h.chunk_id: s for h, s in zip(h_big, s_big)}
    for h, s in zip(h_small, s_small):
        if h.chunk_id in big_by_chunk:
            np.testing.assert_allclose(
                big_by_chunk[h.chunk_id], s, rtol=1e-6, atol=1e-5
            )


def test_truncation_to_max_chunk_tokens():
    rng = np.random.default_rng(3)
    long_chunk = rng.standard_normal((20, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [[long_chunk]], max_chunk_tokens=6, limit=1
    )
    _, scores = index.find_with_scores(q)
    ref = numpy_maxsim([long_chunk[:6]], q)
    np.testing.assert_allclose(scores, ref, rtol=1e-6, atol=1e-5)


def test_zero_token_chunks_never_surface():
    d = 8
    tok = np.ones((2, d), dtype=np.float32)
    empty = np.zeros((0, d), dtype=np.float32)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [[empty, tok, empty]], max_chunk_tokens=4,
        limit=3,
    )
    hits = index.find(tok[:1])
    assert [h.chunk_id for h in hits] == [1]


def test_empty_index_and_empty_query():
    index = LateInteractionIndex(RetrievalType.TEXT, [[]], limit=3)
    assert index.find(np.ones((2, 8), np.float32)) == []
    rng = np.random.default_rng(4)
    index2 = LateInteractionIndex(
        RetrievalType.TEXT, [random_ragged(rng, 3)], limit=3
    )
    assert index2.find(np.zeros((0, 16), np.float32)) == []


def test_bfloat16_storage_same_ranking_on_separated_data():
    rng = np.random.default_rng(5)
    d = 16
    target = np.ones((3, d), dtype=np.float32) / np.sqrt(d)
    noise = [
        (rng.standard_normal((4, d)) * 0.01).astype(np.float32)
        for _ in range(20)
    ]
    chunks = noise[:10] + [target] + noise[10:]
    f32 = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], limit=1
    )
    bf16 = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], limit=1, storage_dtype="bfloat16"
    )
    q = target[:1]
    assert f32.find(q)[0].chunk_id == 10
    assert bf16.find(q)[0].chunk_id == 10
    assert bf16.nbytes < f32.nbytes


def _make_embedder():
    from dial_rag_tpu.models.tokenizer import build_test_vocab

    vocab = build_test_vocab([chr(c) for c in range(97, 123)])
    return BgeEmbedder.from_random(vocab=vocab, batch_size=4)


def _record(chunks, li_index):
    return DocumentRecord(
        format_version=2,
        index_settings=None,
        chunks=chunks,
        text_index=None,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        late_interaction_index=li_index,
        mime_type="text/plain",
        document_bytes=b"",
    )


async def test_retriever_self_retrieval_end_to_end():
    """Identical text is a perfect MaxSim match (cosine 1.0 per token),
    so querying with a chunk's own text must rank that chunk first —
    deterministic even with random encoder weights."""
    embedder = _make_embedder()
    texts = ["aba cad abc", "dede fefe gege", "zzz yyy xyx", "kak lol mnm"]
    chunks = build_chunks_list([(t, {}) for t in texts])
    li = await LateInteractionRetriever.build_index(embedder, chunks)
    assert len(li) == len(texts)
    record = _record(chunks, li)
    assert LateInteractionRetriever.has_index([record])
    retriever = LateInteractionRetriever.from_doc_records(
        embedder, [record], k=2
    )
    for i, text in enumerate(texts):
        hits = await retriever.aretrieve(text)
        assert hits and hits[0].chunk_id == i, (text, hits)


async def test_retriever_absent_without_index():
    embedder = _make_embedder()
    chunks = build_chunks_list([("abc", {})])
    record = _record(chunks, None)
    assert not LateInteractionRetriever.has_index([record])


def test_storage_round_trip_preserves_token_embeddings():
    from dial_rag_tpu.storage.serialization import (
        deserialize_record,
        serialize_record,
    )
    from dial_rag_tpu.documents.model import IndexSettings

    rng = np.random.default_rng(6)
    li = random_ragged(rng, 3, d=8)
    chunks = build_chunks_list([("a", {}), ("b", {}), ("c", {})])
    record = DocumentRecord(
        format_version=2,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=None,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        late_interaction_index=li,
        mime_type="text/plain",
        document_bytes=b"doc",
    )
    loaded = deserialize_record(serialize_record(record))
    assert loaded.late_interaction_index is not None
    for a, b in zip(loaded.late_interaction_index, li, strict=True):
        np.testing.assert_array_equal(a, b)


def test_config_rebuild_trigger():
    """Changing max_chunk_tokens must invalidate persisted indexes."""
    from dial_rag_tpu.service.config import (
        IndexingConfig,
        LateInteractionIndexConfig,
    )

    on = IndexingConfig(
        late_interaction_index=LateInteractionIndexConfig()
    ).collect_fields_that_rebuild_index()
    changed = IndexingConfig(
        late_interaction_index=LateInteractionIndexConfig(
            max_chunk_tokens=64
        )
    ).collect_fields_that_rebuild_index()
    off = IndexingConfig().collect_fields_that_rebuild_index()
    assert on != changed
    assert on != off
    assert "late_interaction_index" in on.indexes


def test_find_batch_matches_single_queries():
    rng = np.random.default_rng(7)
    chunks = random_ragged(rng, 40)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=16, limit=5
    )
    queries = [
        rng.standard_normal((int(rng.integers(1, 7)), 16)).astype(
            np.float32
        )
        for _ in range(5)
    ]
    batched = index.find_batch(queries)
    for q, hits in zip(queries, batched):
        single = index.find(q)
        assert [(h.doc_id, h.chunk_id) for h in hits] == [
            (h.doc_id, h.chunk_id) for h in single
        ]


def test_find_batch_empty_inputs():
    rng = np.random.default_rng(8)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [random_ragged(rng, 3)], limit=2
    )
    assert index.find_batch([]) == []
    out = index.find_batch([np.zeros((0, 16), np.float32)])
    assert out == [[]]


async def test_retriever_batch_matches_per_query():
    embedder = _make_embedder()
    texts = ["aba cad abc", "dede fefe gege", "zzz yyy xyx", "kak lol mnm"]
    chunks = build_chunks_list([(t, {}) for t in texts])
    li = await LateInteractionRetriever.build_index(embedder, chunks)
    retriever = LateInteractionRetriever.from_doc_records(
        embedder, [_record(chunks, li)], k=3
    )
    queries = [texts[2], texts[0], "abc zzz"]
    batched = retriever.retrieve_batch(queries)
    for q, hits in zip(queries, batched):
        single = await retriever.aretrieve(q)
        assert [(h.doc_id, h.chunk_id) for h in hits] == [
            (h.doc_id, h.chunk_id) for h in single
        ]


def test_all_zero_token_index_returns_no_hits():
    """An index whose every chunk has zero tokens (dim resolves to 0)
    must behave like an empty index, not crash at query time."""
    empty = np.zeros((0, 8), dtype=np.float32)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [[empty, empty]], limit=3
    )
    q = np.ones((2, 8), dtype=np.float32)
    assert index.find(q) == []
    assert index.find_batch([q]) == [[]]
    assert index.nbytes == 0


def test_find_batch_sanitizes_malformed_queries():
    """A non-2-D or wrong-dim query in a batch yields [] for that query
    (matching the single-query path) instead of a broadcast error."""
    rng = np.random.default_rng(9)
    chunks = random_ragged(rng, 5)
    index = LateInteractionIndex(RetrievalType.TEXT, [chunks], limit=2)
    good = rng.standard_normal((3, 16)).astype(np.float32)
    out = index.find_batch(
        [np.ones(16, np.float32), good, np.ones((2, 4), np.float32)]
    )
    assert out[0] == [] and out[2] == []
    assert [(h.doc_id, h.chunk_id) for h in out[1]] == [
        (h.doc_id, h.chunk_id) for h in index.find(good)
    ]


def test_small_index_memory_is_bounded():
    """A typical one-document index (30 chunks) must not pad to the
    dense index's 512-row quantum (x 256 tokens x D floats of zeros)."""
    rng = np.random.default_rng(10)
    chunks = random_ragged(rng, 30, d=16)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=256, limit=3
    )
    # 64-row bucket: 64 * 256 * 16 * 4 bytes, not 512 rows' worth
    assert index._x.shape[0] == 64
    q = rng.standard_normal((2, 16)).astype(np.float32)
    ref = numpy_maxsim([c[:256] for c in chunks], q)
    _, scores = index.find_with_scores(q)
    np.testing.assert_allclose(
        scores, np.sort(ref)[::-1][:3], rtol=1e-6, atol=1e-5
    )


def test_find_batch_splits_into_memory_bounded_groups():
    """A batch whose (queries x token-bucket) lanes exceed _MAX_Q_LANES
    must split into several dispatches and still match per-query finds."""
    from dial_rag_tpu.index.late_interaction import _MAX_Q_LANES

    rng = np.random.default_rng(11)
    chunks = random_ragged(rng, 30)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=16, limit=4
    )
    # 40 tokens -> qp bucket 64; 9 queries -> nq_pad 16; group = 2
    queries = [
        rng.standard_normal((40, 16)).astype(np.float32) for _ in range(9)
    ]
    assert 16 * 64 > _MAX_Q_LANES  # the premise: grouping must kick in
    batched = index.find_batch(queries)
    for q, hits in zip(queries, batched):
        single = index.find(q)
        assert [(h.doc_id, h.chunk_id) for h in hits] == [
            (h.doc_id, h.chunk_id) for h in single
        ]


def test_maxsim_fuzz_vs_numpy():
    """Property check across random shapes/dtypes of everything at once:
    ragged chunks, empty chunks, multiple docs, truncation, odd query
    lengths — scores and order must match the numpy reference."""
    rng = np.random.default_rng(12)
    for trial in range(15):
        d = int(rng.choice([4, 8, 16, 24]))
        t_cap = int(rng.integers(2, 12))
        n_docs = int(rng.integers(1, 4))
        docs = []
        for _ in range(n_docs):
            n = int(rng.integers(1, 25))
            docs.append(
                [
                    rng.standard_normal(
                        (int(rng.integers(0, 14)), d)
                    ).astype(np.float32)
                    for _ in range(n)
                ]
            )
        q = rng.standard_normal((int(rng.integers(1, 9)), d)).astype(
            np.float32
        )
        limit = int(rng.integers(1, 6))
        index = LateInteractionIndex(
            RetrievalType.TEXT, docs, max_chunk_tokens=t_cap, limit=limit
        )
        hits, scores = index.find_with_scores(q)
        flat = [c for doc in docs for c in doc]
        ref = numpy_maxsim([c[:t_cap] for c in flat], q)
        finite = np.isfinite(ref)
        order = [
            i for i in np.argsort(-ref, kind="stable") if finite[i]
        ][:limit]
        row_of = {}
        r = 0
        for doc_id, doc in enumerate(docs):
            for chunk_id in range(len(doc)):
                row_of[r] = (doc_id, chunk_id)
                r += 1
        assert [(h.doc_id, h.chunk_id) for h in hits] == [
            row_of[i] for i in order
        ], trial
        np.testing.assert_allclose(
            scores, ref[order], rtol=1e-5, atol=1e-4, err_msg=str(trial)
        )


def test_single_query_sanitizes_wrong_dim():
    """Single-query path agrees with the batch path on malformed input:
    a wrong-dim query returns ([], []) instead of an opaque jit shape
    error (advisor round-2 finding)."""
    rng = np.random.default_rng(11)
    chunks = random_ragged(rng, 5)
    index = LateInteractionIndex(RetrievalType.TEXT, [chunks], limit=2)
    bad = rng.standard_normal((3, 8)).astype(np.float32)  # dim 8 != 16
    assert index.find_with_scores(bad) == ([], [])
    assert index.find(bad) == []


def test_single_query_lane_cap_truncates_long_queries():
    """Queries beyond _MAX_Q_LANES tokens truncate (like the document
    side truncates to max_chunk_tokens) instead of scaling the sim
    transient without bound; results equal explicit truncation."""
    from dial_rag_tpu.index.late_interaction import _MAX_Q_LANES

    rng = np.random.default_rng(12)
    chunks = random_ragged(rng, 6)
    index = LateInteractionIndex(RetrievalType.TEXT, [chunks], limit=3)
    long_q = rng.standard_normal((_MAX_Q_LANES + 37, 16)).astype(
        np.float32
    )
    hits_long, scores_long = index.find_with_scores(long_q)
    hits_cap, scores_cap = index.find_with_scores(long_q[:_MAX_Q_LANES])
    assert [(h.doc_id, h.chunk_id) for h in hits_long] == [
        (h.doc_id, h.chunk_id) for h in hits_cap
    ]
    np.testing.assert_allclose(scores_long, scores_cap)


def test_mixed_width_chunks_are_skipped_not_fatal():
    """Chunks whose embedding width disagrees with the index dim (e.g.
    records from different encoder configs merged into one request) are
    skipped (count 0, never retrieved) instead of raising a raw numpy
    broadcast error at build."""
    rng = np.random.default_rng(13)
    wide = [rng.standard_normal((4, 16)).astype(np.float32)]
    narrow = [rng.standard_normal((4, 8)).astype(np.float32)]
    index = LateInteractionIndex(
        RetrievalType.TEXT, [wide, narrow], limit=4
    )
    q = rng.standard_normal((3, 16)).astype(np.float32)
    hits, _ = index.find_with_scores(q)
    assert [(h.doc_id, h.chunk_id) for h in hits] == [(0, 0)]


def test_device_resident_query_parity():
    """A jax-array query (the serving fast path: the embedder's
    zero-padded device rows handed straight to find, no host
    round-trip) scores identically to the same real tokens as a host
    numpy array: zero padding tokens contribute exactly 0 to every
    chunk's MaxSim score, so passing the full padded length as the
    token count is equivalent to the host path's real-count masking."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    chunks = random_ragged(rng, 41)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=16, limit=9
    )
    q = rng.standard_normal((6, 16)).astype(np.float32)
    hits_h, scores_h = index.find_with_scores(q)
    # at the host path's own lane bucket (8 for 6 tokens): BIT-identical
    dev = jnp.asarray(np.pad(q, ((0, 8 - q.shape[0]), (0, 0))))
    hits_d, scores_d = index.find_with_scores(dev)
    assert hits_d == hits_h
    np.testing.assert_array_equal(scores_d, scores_h)
    # other device widths keep exact MaxSim semantics (zero tokens are
    # score-inert) but a different matmul tiling may move the last ulp
    for pad_to in (16, 64, 96):
        dev = jnp.asarray(
            np.pad(q, ((0, pad_to - q.shape[0]), (0, 0)))
        )
        hits_w, scores_w = index.find_with_scores(dev)
        assert [h.chunk_id for h in hits_w] == [
            h.chunk_id for h in hits_h
        ], pad_to
        np.testing.assert_allclose(
            scores_w, scores_h, rtol=1e-6, atol=1e-5
        )
    # over-long device queries fall back to the host path's lane cap
    long_dev = jnp.asarray(
        np.pad(q, ((0, 200 - q.shape[0]), (0, 0)))
    )
    assert index.find(long_dev) == index.find(q)


def test_embedder_device_query_tokens_match_host():
    """embed_query_tokens_device returns one device [S, D] row set whose
    real-token prefix is byte-identical to embed_query_tokens and whose
    padded positions are exactly zero (the property the MaxSim kernels
    rely on), and the retriever's async path built on it returns the
    same hits as the sync host path."""
    import asyncio

    import jax

    emb = _make_embedder()
    text = "alpine glaciers retreat under warming summers"
    dev = emb.embed_query_tokens_device(text)
    host = emb.embed_query_tokens(text)
    assert isinstance(dev, jax.Array) and dev.ndim == 2
    t = host.shape[0]
    assert dev.shape[0] >= t and dev.shape[0] & (dev.shape[0] - 1) == 0
    np.testing.assert_array_equal(np.asarray(dev)[:t], host)
    assert not np.asarray(dev)[t:].any()

    docs = ["glaciers retreat", "limestone ridges", "valley meadows"]
    records = [
        _record(None, emb.embed_documents_tokens([d])) for d in docs
    ]
    retriever = LateInteractionRetriever.from_doc_records(
        emb, records, k=2
    )
    async_hits = asyncio.run(retriever.aretrieve(text))
    sync_hits = retriever.retrieve(text)
    assert [(h.doc_id, h.chunk_id) for h in async_hits] == [
        (h.doc_id, h.chunk_id) for h in sync_hits
    ]


def test_afind_coalesces_same_bucket_device_queries():
    """Concurrent ``afind`` calls with device-resident queries at the
    same power-of-two lane bucket share one batched MaxSim dispatch
    with hits identical to per-query ``find``; odd-width/host queries
    fall back to the single path inside the same wave."""
    import asyncio

    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    chunks = random_ragged(rng, 29)
    index = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], max_chunk_tokens=16, limit=5
    )
    # device rows at bucket width 8 (zero-padded like the embedder's
    # device path produces), one odd host query in the same wave
    dev_queries = []
    for _ in range(6):
        q = np.zeros((8, 16), dtype=np.float32)
        t = int(rng.integers(2, 8))
        q[:t] = rng.standard_normal((t, 16)).astype(np.float32)
        dev_queries.append(jnp.asarray(q))
    host_q = rng.standard_normal((3, 16)).astype(np.float32)

    waves: list[int] = []
    orig = index._scan_wave

    def spy(items, _orig=orig):
        waves.append(len(items))
        return _orig(items)

    index._scan_wave = spy

    async def run_all():
        return await asyncio.gather(
            *(index.afind(q) for q in dev_queries),
            index.afind(host_q),
        )

    results = asyncio.run(run_all())
    for q, hits in zip(dev_queries, results[:-1]):
        assert hits == index.find(q)
    assert results[-1] == index.find(host_q)
    assert sum(waves) == 7
    assert max(waves) > 1, waves


# --- int8 storage (quarter-byte capacity layout) ---------------------------


def test_int8_storage_same_ranking_on_separated_data():
    rng = np.random.default_rng(5)
    d = 16
    target = np.ones((3, d), dtype=np.float32) / np.sqrt(d)
    noise = [
        (rng.standard_normal((4, d)) * 0.01).astype(np.float32)
        for _ in range(20)
    ]
    chunks = noise[:10] + [target] + noise[10:]
    f32 = LateInteractionIndex(RetrievalType.TEXT, [chunks], limit=1)
    i8 = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], limit=1, storage_dtype="int8"
    )
    q = target[:1]
    assert f32.find(q)[0].chunk_id == 10
    assert i8.find(q)[0].chunk_id == 10
    assert i8.nbytes < f32.nbytes / 2


def test_int8_exact_on_representable_tokens():
    """Token vectors that are exact multiples of their absmax/127 scale
    quantize losslessly — scores must match the f32 index to float
    tolerance (validates the dequant-before-max arithmetic)."""
    rng = np.random.default_rng(9)
    chunks = []
    for _ in range(12):
        q_int = rng.integers(-127, 128, size=(5, 8)).astype(np.float32)
        q_int[:, 0] = 127.0  # pin absmax so query quantization is lossless
        chunks.append(q_int * 0.01)
    f32 = LateInteractionIndex(RetrievalType.TEXT, [chunks], limit=4)
    i8 = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], limit=4, storage_dtype="int8"
    )
    for qi in (0, 5, 11):
        q = chunks[qi][:3]
        h32, s32 = f32.find_with_scores(q)
        h8, s8 = i8.find_with_scores(q)
        assert [x.chunk_id for x in h8] == [x.chunk_id for x in h32]
        np.testing.assert_allclose(s8, s32, rtol=1e-4, atol=1e-3)


def test_int8_batch_matches_single():
    rng = np.random.default_rng(3)
    chunks = [
        (rng.standard_normal((6, 16)) * 2).astype(np.float32)
        for _ in range(30)
    ]
    i8 = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], limit=3, storage_dtype="int8"
    )
    queries = [c[:2] for c in chunks[:6]]
    singles = [i8.find(q) for q in queries]
    assert i8.find_batch(queries) == singles


def test_int8_zero_token_chunks_never_surface():
    chunks = [
        np.ones((2, 8), dtype=np.float32),
        np.zeros((0, 8), dtype=np.float32),
        np.ones((1, 8), dtype=np.float32) * 0.5,
    ]
    i8 = LateInteractionIndex(
        RetrievalType.TEXT, [chunks], limit=3, storage_dtype="int8"
    )
    hits = i8.find(np.ones((2, 8), dtype=np.float32))
    assert [h.chunk_id for h in hits] == [0, 2]


def test_odd_row_count_blocked_path_matches_small():
    """Row counts past 512 that are NOT 512-multiples stream in
    overlapped blocks; scores must equal a brute-force numpy MaxSim."""
    rng = np.random.default_rng(21)
    n, t, d = 700, 3, 8  # > 512, not a multiple of 512
    chunks = [
        rng.standard_normal((t, d)).astype(np.float32) for _ in range(n)
    ]
    idx = LateInteractionIndex(
        RetrievalType.TEXT,
        [chunks],
        max_chunk_tokens=t,
        limit=5,
        # force the unpadded odd shape: bucket function rounds to 64s,
        # so pick n where the bucket itself is odd vs 512 (704 % 512 != 0)
    )
    q = rng.standard_normal((4, d)).astype(np.float32)
    hits, scores = idx.find_with_scores(q)
    ref = np.array(
        [(q @ np.asarray(c).T).max(axis=1).sum() for c in chunks]
    )
    order = np.argsort(-ref, kind="stable")[:5]
    assert [h.chunk_id for h in hits] == list(order)
    np.testing.assert_allclose(scores, ref[order], rtol=1e-5, atol=1e-5)
    # int8 storage through the same odd-shape path
    i8 = LateInteractionIndex(
        RetrievalType.TEXT,
        [chunks],
        max_chunk_tokens=t,
        limit=5,
        storage_dtype="int8",
    )
    hits8, _ = i8.find_with_scores(q)
    assert len(hits8) == 5
