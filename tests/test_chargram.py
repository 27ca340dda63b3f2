"""Char-n-gram fuzzy-lexical index/retriever tests.

Parity target is a pure-numpy TF-IDF cosine reference (the exact
formulation measured in eval/tune_chargram.py); the serving index
delegates to the Bm25Index machinery via from_term_weights, so these
tests also pin the explicit-weight assembly path across all three
layouts (dense matmul, band+CSC, sharded)."""

import math

import numpy as np
import pytest

from dial_rag_tpu.documents.model import (
    DocumentRecord,
    IndexSettings,
    build_chunks_list,
)
from dial_rag_tpu.index.bm25 import Bm25Index
from dial_rag_tpu.index.chargram import (
    ChargramIndex,
    chargram_words,
    gram_counts,
)
from dial_rag_tpu.retrieval.chargram_retriever import ChargramRetriever

TEXTS = [
    "The Alps are the highest mountain range entirely in Europe.",
    "Glaciers shaped the valleys over millions of years.",
    "Glaciation carved deep U-shaped alpine valleys.",
    "The climate varies with elevation and latitude.",
    "Monte Rosa and Mont Blanc are the highest peaks.",
    "Winter tourism brings skiers to mountainous regions.",
]


def numpy_reference_scores(chunk_texts, query, n_lo=2, n_hi=4):
    """Independent TF-IDF cosine implementation (dict/numpy only)."""
    counts = [gram_counts(chargram_words(t), n_lo, n_hi) for t in chunk_texts]
    df = {}
    for c in counts:
        for g in c:
            df[g] = df.get(g, 0) + 1
    n = len(chunk_texts)
    idf = {g: math.log((n + 1) / (d + 1)) + 1.0 for g, d in df.items()}

    def vec(c):
        v = {g: (1.0 + math.log(tf)) * idf[g] for g, tf in c.items() if g in idf}
        norm = math.sqrt(sum(x * x for x in v.values()))
        return {g: x / norm for g, x in v.items()} if norm > 0 else v

    chunk_vecs = [vec(c) for c in counts]
    qv = vec(gram_counts(chargram_words(query), n_lo, n_hi))
    return np.array(
        [
            sum(w * cv.get(g, 0.0) for g, w in qv.items())
            for cv in chunk_vecs
        ],
        dtype=np.float64,
    )


WORD_LISTS = [chargram_words(t) for t in TEXTS]
QUERIES = [
    "glacier valleys",
    "mountainous climate",
    "highest peak in europe",
    "the",
    "zzz qqq",  # all grams OOV except maybe sub-grams
]


@pytest.mark.parametrize("dense", [True, False], ids=["dense", "csc"])
def test_scores_match_numpy_reference(dense):
    index = ChargramIndex.build(
        WORD_LISTS, max_dense_bytes=(1 << 30) if dense else 0
    )
    if dense:
        assert index.inner._weights_dev is not None
    else:
        assert index.inner._postings is not None
    for q in QUERIES:
        ref = numpy_reference_scores(TEXTS, q)
        got = index.get_scores(q)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_scores_are_cosine_bounded_and_self_similar():
    index = ChargramIndex.build(WORD_LISTS)
    for i, t in enumerate(TEXTS):
        s = index.get_scores(t)
        assert s.max() <= 1.0 + 1e-5
        assert int(np.argmax(s)) == i  # a chunk's own text is its best hit
        assert s[i] == pytest.approx(1.0, abs=1e-5)


def test_morphological_variant_matches():
    """The arm's reason to exist: derivational variants Porter2 splits
    (glacier vs glaciation) still share most char grams."""
    index = ChargramIndex.build(WORD_LISTS)
    s = index.get_scores("glaciation of the alps")
    # chunk 2 contains 'glaciation'; chunk 1 only 'glaciers' — both must
    # score well above the no-overlap chunk 3
    assert s[2] > s[3]
    assert s[1] > s[3]
    assert s[1] > 0.05


def test_topn_tiebreak_latest_wins():
    """Exact-duplicate chunks produce exact score ties; the inherited
    BM25 kernel contract (later item wins) must hold on both layouts."""
    dup = [chargram_words("alpha beta gamma")] * 3 + [
        chargram_words("delta epsilon")
    ]
    for max_dense in ((1 << 30), 0):
        index = ChargramIndex.build(dup, max_dense_bytes=max_dense)
        top = index.top_n("alpha beta", 3)
        assert list(top) == [2, 1, 0]


def test_batch_and_async_paths_match_single():
    index = ChargramIndex.build(WORD_LISTS)
    singles = [index.top_n_with_scores(q, 4) for q in QUERIES]
    batched = index.top_n_batch_with_scores(QUERIES, 4)
    for (si, sv), (bi, bv) in zip(singles, batched):
        np.testing.assert_array_equal(si, bi)
        np.testing.assert_allclose(sv, bv, rtol=1e-5, atol=1e-7)

    import asyncio

    async def roundtrip():
        return await asyncio.gather(
            *(index.atop_n_with_scores(q, 4) for q in QUERIES)
        )

    for (si, sv), (ai, av) in zip(singles, asyncio.run(roundtrip())):
        np.testing.assert_array_equal(si, ai)
        np.testing.assert_allclose(sv, av, rtol=1e-5, atol=1e-7)


def test_sharded_matches_single_chip():
    import jax
    from jax.sharding import Mesh

    from dial_rag_tpu.parallel.sharded_index import (
        ShardedBm25Index,
        ShardedBm25SparseIndex,
    )

    mesh = Mesh(np.array(jax.devices()), ("idx",))
    single = ChargramIndex.build(WORD_LISTS)
    host_dense = ChargramIndex.build(WORD_LISTS, device=False)
    sharded_dense = host_dense.with_inner(
        ShardedBm25Index(host_dense.inner, mesh, limit=4)
    )
    host_sparse = ChargramIndex.build(
        WORD_LISTS, device=False, max_dense_bytes=0
    )
    sharded_sparse = host_sparse.with_inner(
        ShardedBm25SparseIndex(host_sparse.inner, mesh, limit=4)
    )
    for q in QUERIES:
        ref_idx, ref_vals = single.top_n_with_scores(q, 4)
        for sharded in (sharded_dense, sharded_sparse):
            idx, vals = sharded.top_n_with_scores(q, 4)
            np.testing.assert_array_equal(idx, ref_idx)
            np.testing.assert_allclose(vals, ref_vals, rtol=2e-5, atol=2e-6)


def _record(texts, with_chargram=True):
    chunks = build_chunks_list([(t, {"page_number": 1}) for t in texts])
    return DocumentRecord(
        format_version=3,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=None,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
        chargram_index=(
            [chargram_words(t) for t in texts] if with_chargram else None
        ),
    )


def test_retriever_maps_hits_across_documents():
    recs = [
        _record(TEXTS[:3]),
        _record(TEXTS[3:], with_chargram=False),  # no index: skipped
        _record(TEXTS[3:]),
    ]
    assert ChargramRetriever.has_index(recs)
    r = ChargramRetriever.from_doc_records(recs, k=3)
    hits = r.retrieve("glaciation carved the valleys")
    assert hits, "expected hits"
    # flat item 2 (doc 0 chunk 2) is the glaciation chunk
    assert (hits[0].doc_id, hits[0].chunk_id) == (0, 2)
    assert hits[0].score > 0
    # a query matching only the second record's chunks maps to doc_id 2
    hits2 = r.retrieve("winter tourism skiers")
    assert (hits2[0].doc_id, hits2[0].chunk_id) == (2, 2)
    # batch path agrees with singles
    batched = r.retrieve_batch(["glaciation carved the valleys"])
    assert [(h.doc_id, h.chunk_id) for h in batched[0]] == [
        (h.doc_id, h.chunk_id) for h in hits
    ]


def test_retriever_has_index_false_without_field():
    recs = [_record(TEXTS[:2], with_chargram=False)]
    assert not ChargramRetriever.has_index(recs)


def test_serialization_roundtrip_with_chargram():
    from dial_rag_tpu.storage.serialization import (
        deserialize_record,
        serialize_record,
    )

    rec = _record(TEXTS[:2])
    back = deserialize_record(serialize_record(rec))
    assert back.chargram_index == rec.chargram_index
    # records without the field deserialize to None (old persisted data)
    rec2 = _record(TEXTS[:2], with_chargram=False)
    back2 = deserialize_record(serialize_record(rec2))
    assert back2.chargram_index is None


def test_from_term_weights_rejects_empty():
    with pytest.raises(ValueError):
        Bm25Index.from_term_weights({}, np.zeros(0), [{}, {}])


def test_oov_query_returns_zero_scores():
    index = ChargramIndex.build(WORD_LISTS)
    s = index.get_scores("")
    np.testing.assert_array_equal(s, np.zeros(len(TEXTS), dtype=np.float32))


def test_native_numpy_triples_parity_fuzz():
    """The C++ core and the numpy fallback must emit the SAME aggregated
    (chunk, key, count) set — same packed-uint64 key space incl. the
    FNV|topbit long-word branch (repo rule: native cores byte-exact with
    their Python fallbacks)."""
    import random

    from dial_rag_tpu.index.chargram import (
        _triples_native,
        _triples_numpy,
    )
    from dial_rag_tpu.native.build import load_native

    if load_native("chargram") is None:
        pytest.skip("native core unavailable")
    rng = random.Random(13)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    for trial in range(10):
        word_lists = []
        for _ in range(rng.randrange(0, 12)):
            words = [
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randrange(1, 15))  # incl. >6 (FNV)
                )
                for _ in range(rng.randrange(0, 40))
            ]
            word_lists.append(words)
        n_lo, n_hi = sorted(
            (rng.randrange(1, 6), rng.randrange(2, 9))
        )
        if n_lo == n_hi:
            n_hi += 1
        nat = _triples_native(word_lists, n_lo, n_hi)
        ref = _triples_numpy(word_lists, n_lo, n_hi)
        assert nat is not None
        nat_set = {
            (int(c), int(k), int(n)) for c, k, n in zip(*nat)
        }
        ref_set = {
            (int(c), int(k), int(n)) for c, k, n in zip(*ref)
        }
        assert nat_set == ref_set, (trial, n_lo, n_hi)


def test_untrusted_words_are_sanitized_not_crashing():
    """Crafted persisted records (non-ascii, uppercase, absurd lengths,
    empty strings) must not crash the index build — invalid words drop
    deterministically."""
    from dial_rag_tpu.index.chargram import ChargramIndex

    word_lists = [
        ["alps", "Zürich", "GLACIER", "x" * 2000, "", "valley"],
        ["климат", "mountain"],
    ]
    index = ChargramIndex.build(word_lists)
    assert index.n_items == 2
    s = index.get_scores("alps valley")
    assert s[0] > 0
    # the invalid words contributed nothing: a query for them scores 0
    assert index.get_scores("zürich климат").max() == 0.0


def test_all_invalid_words_record_yields_no_arm_not_500():
    """has_index applies the same sanitize filter as the build, so a
    crafted record whose chargram words are ALL invalid is skipped
    instead of raising mid-request."""
    rec = _record(["placeholder"])
    rec.chargram_index = [["Zürich", "КЛИМАТ", "x" * 2000]]
    assert not ChargramRetriever.has_index([rec])
    ok = _record(["alps climate"])
    assert ChargramRetriever.has_index([rec, ok])
    r = ChargramRetriever.from_doc_records([rec, ok], k=2)
    hits = r.retrieve("alps")
    assert hits and hits[0].doc_id == 1
