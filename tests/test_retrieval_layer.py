"""Retriever layer: semantic + BM25 + all-documents + RRF ensemble."""

import numpy as np
import pytest

from dial_rag_tpu.documents.model import (
    FORMAT_VERSION,
    DocumentRecord,
    IndexSettings,
    build_chunks_list,
)
from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.models.tokenizer import build_test_vocab
from dial_rag_tpu.retrieval import (
    AllDocumentsRetriever,
    Bm25Retriever,
    EnsembleRetriever,
    SemanticRetriever,
)
from dial_rag_tpu.retrieval.ensemble import weighted_reciprocal_rank

DOC1_TEXTS = [
    "the alps stretch across eight alpine countries",
    "colle di cadibona marks the southern boundary of the alps",
    "climate in the alps varies with elevation",
]
DOC2_TEXTS = [
    "mont blanc is the highest peak",
    "glaciers shaped the alpine valleys",
]


@pytest.fixture(scope="module")
def embedder():
    words = sorted(set(" ".join(DOC1_TEXTS + DOC2_TEXTS).split()))
    vocab = build_test_vocab(words + ["what", "is", "question", "?"])
    return BgeEmbedder.from_random(vocab=vocab, batch_size=4)


async def make_records(embedder):
    records = []
    for texts in (DOC1_TEXTS, DOC2_TEXTS):
        chunks = build_chunks_list([(t, {"source": "s"}) for t in texts])
        records.append(
            DocumentRecord(
                format_version=FORMAT_VERSION,
                index_settings=IndexSettings(),
                chunks=chunks,
                text_index=await Bm25Retriever.build_index(chunks),
                embeddings_index=await SemanticRetriever.build_index(
                    embedder, chunks
                ),
                multimodal_embeddings_index=None,
                description_embeddings_index=None,
                mime_type="text/plain",
                document_bytes=b"",
            )
        )
    return records


@pytest.fixture(scope="module")
def records(embedder):
    import asyncio

    return asyncio.run(make_records(embedder))


def test_bm25_retrieves_exact_chunk(records):
    r = Bm25Retriever.from_doc_records(records, k=2)
    hits = r.retrieve("cadibona")
    assert hits[0] == SearchHit(0, 1, RetrievalType.TEXT)


def test_bm25_has_index(records):
    assert Bm25Retriever.has_index(records)
    empty = DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=[],
        text_index=[],
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
    )
    assert not Bm25Retriever.has_index([empty])


def test_semantic_retriever_self_similarity(records, embedder):
    r = SemanticRetriever.from_doc_records(embedder, records, k=1)
    # embedding of a chunk's own text (as document) should be its nearest
    # neighbor; query instruction changes the query embedding, so query
    # with a document-embedded vector directly:
    emb = embedder.embed_documents([DOC2_TEXTS[1]])[0]
    hits = r.index.find(emb)
    assert hits[0] == SearchHit(1, 1, RetrievalType.TEXT)


async def test_ensemble_rrf_matches_langchain_semantics():
    class Fixed:
        def __init__(self, hits):
            self._hits = hits

        async def aretrieve(self, query):
            return self._hits

    h = lambda d, c: SearchHit(d, c, RetrievalType.TEXT)
    list1 = [h(0, 0), h(0, 1), h(0, 2)]
    list2 = [h(0, 1), h(1, 0), h(0, 0)]

    ens = EnsembleRetriever([Fixed(list1), Fixed(list2)])
    got = await ens.aretrieve("q")

    # langchain weighted_reciprocal_rank transcription
    c = 60
    score = {}
    for lst in (list1, list2):
        for rank, hit in enumerate(lst, start=1):
            score[hit.key] = score.get(hit.key, 0.0) + 1.0 / (rank + c)
    unique, seen = [], set()
    for lst in (list1, list2):
        for hit in lst:
            if hit.key not in seen:
                seen.add(hit.key)
                unique.append(hit)
    expected = sorted(unique, key=lambda x: score[x.key], reverse=True)
    assert got == expected
    # sanity: 0_0 (ranks 1+3) and 0_1 (ranks 2+1) both beat 0_2 and 1_0
    assert got[0] == h(0, 1) and got[1] == h(0, 0)


def test_rrf_tie_order_first_appearance():
    h = lambda d, c: SearchHit(d, c, RetrievalType.TEXT)
    # two disjoint single-hit lists: equal scores, first list's hit first
    out = weighted_reciprocal_rank([[h(0, 0)], [h(1, 0)]], [1.0, 1.0])
    assert out == [h(0, 0), h(1, 0)]


def test_all_documents_limit(records):
    assert AllDocumentsRetriever.is_within_limit(records)
    r = AllDocumentsRetriever.from_doc_records(records)
    hits = r.retrieve("anything")
    assert len(hits) == 5
    assert hits[0] == SearchHit(0, 0, RetrievalType.TEXT)
    assert hits[-1] == SearchHit(1, 1, RetrievalType.TEXT)

    big_chunks = build_chunks_list([("x" * 13000, {"source": "s"})])
    big = DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=big_chunks,
        text_index=None,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
    )
    assert not AllDocumentsRetriever.is_within_limit([big])


# --- weighted ensemble wiring (service create_retriever) ------------------


class _Stage:
    def __init__(self, retriever, name):
        self.retriever = retriever
        self.name = name

    async def aretrieve(self, query):
        return await self.retriever.aretrieve(query)


@pytest.fixture(scope="module")
def big_records(embedder):
    """Records past the AllDocuments 12000-byte short-circuit, with
    BM25 + embeddings indexes (the two arms the unit fixtures build)."""
    import asyncio

    async def build():
        texts = DOC1_TEXTS + ["padding words " * 1200]
        chunks = build_chunks_list([(t, {"source": "s"}) for t in texts])
        return [
            DocumentRecord(
                format_version=FORMAT_VERSION,
                index_settings=IndexSettings(),
                chunks=chunks,
                text_index=await Bm25Retriever.build_index(chunks),
                embeddings_index=await SemanticRetriever.build_index(
                    embedder, chunks
                ),
                multimodal_embeddings_index=None,
                description_embeddings_index=None,
                mime_type="text/plain",
                document_bytes=b"",
            )
        ]

    return asyncio.run(build())


def _build_ensemble(embedder, big_records, weights=None):
    from dial_rag_tpu.service.config import IndexingConfig
    from dial_rag_tpu.service.retrieval_chain import create_retriever

    return create_retriever(
        embedder,
        "http://dial.example",
        "key",
        big_records,
        IndexingConfig(),
        make_retrieval_stage=_Stage,
        ensemble_weights=weights,
    )


def test_create_retriever_parity_weights(embedder, big_records):
    stage = _build_ensemble(embedder, big_records)
    assert stage.name == "Combined search"
    names = [s.name for s in stage.retriever.retrievers]
    assert names == ["Embeddings search", "Keywords search"]
    assert stage.retriever.weights == [1.0, 1.0]


def test_create_retriever_weighted_and_disabled_arm(embedder, big_records):
    stage = _build_ensemble(
        embedder, big_records, {"semantic": 0.0, "bm25": 2.0}
    )
    names = [s.name for s in stage.retriever.retrievers]
    assert names == ["Keywords search"]
    assert stage.retriever.weights == [2.0]


def test_create_retriever_all_arms_disabled_is_a_config_error(
    embedder, big_records
):
    from dial_rag_tpu.errors import InvalidConfigurationError

    with pytest.raises(InvalidConfigurationError, match="ensemble_weights"):
        _build_ensemble(
            embedder, big_records, {"semantic": 0.0, "bm25": 0.0}
        )


def test_retrieval_config_validates_arms():
    from pydantic import ValidationError

    from dial_rag_tpu.service.config import RequestConfig, RetrievalConfig

    assert RequestConfig().retrieval.ensemble_weights == {}
    RetrievalConfig(ensemble_weights={"semantic": 0.0, "bm25": 2.0})
    with pytest.raises(ValidationError, match="unknown ensemble arm"):
        RetrievalConfig(ensemble_weights={"sematic": 1.0})
    with pytest.raises(ValidationError, match=">= 0"):
        RetrievalConfig(ensemble_weights={"bm25": -1.0})
    from dial_rag_tpu.service.config import ENSEMBLE_ARMS

    with pytest.raises(ValidationError, match="at least one"):
        RetrievalConfig(
            ensemble_weights={a: 0.0 for a in ENSEMBLE_ARMS}
        )


# --- score-aware fusion (CombSUM/CombMNZ) ---------------------------------


def _hits_from_scores(scores, depth, doc_id=0):
    """Top-``depth`` score-carrying hits from a full score vector (the
    deployable serving form the eval experiment measured)."""
    order = np.argsort(-scores, kind="stable")[:depth]
    return [
        SearchHit(
            doc_id=doc_id,
            chunk_id=int(i),
            retrieval_type=RetrievalType.TEXT,
            score=float(scores[i]),
        )
        for i in order
    ]


def test_weighted_score_fusion_matches_experiment_form():
    """Serving weighted_score_fusion == the eval experiment's deployable
    list-norm fusion (eval/tune_score_fusion.py fuse_scores with depth)
    on random score matrices, for both methods and norms."""
    from dial_rag_tpu.retrieval.ensemble import weighted_score_fusion

    rng = np.random.default_rng(7)
    n, depth, k = 50, 12, 7
    weights = [0.5, 1.0, 1.5]
    for method in ("combsum", "combmnz"):
        for norm in ("minmax", "zscore"):
            for trial in range(5):
                mats = [rng.normal(size=n) for _ in range(3)]
                hit_lists = [_hits_from_scores(m, depth) for m in mats]
                got = [
                    h.chunk_id
                    for h in weighted_score_fusion(
                        hit_lists, weights, method=method, norm=norm
                    )[:k]
                ]

                # independent numpy reference (experiment semantics)
                fused = np.zeros(n)
                support = np.zeros(n)
                for m, w in zip(mats, weights):
                    top = np.argsort(-m, kind="stable")[:depth]
                    s = np.zeros(n)
                    sub = m[top]
                    if norm == "minmax":
                        vals = (sub - sub.min()) / (sub.max() - sub.min())
                    else:
                        vals = (sub - sub.mean()) / sub.std()
                    if method == "combmnz" and vals.min() < 0:
                        # MNZ lists are shifted non-negative so the
                        # support multiplier cannot invert into a
                        # penalty (no-op for minmax)
                        vals = vals - vals.min()
                    s[top] = vals
                    fused += w * s
                    support[np.argsort(-m, kind="stable")[:7]] += 1
                if method == "combmnz":
                    fused *= np.maximum(support, 1)
                want_full = np.argsort(-fused, kind="stable")
                # restrict to docs that appear in some list (fusion only
                # ranks retrieved docs)
                seen = {h.chunk_id for hl in hit_lists for h in hl}
                want = [int(i) for i in want_full if int(i) in seen][:k]
                assert got == want, (method, norm, trial)


def test_score_fusion_rank_proxy_fallback():
    """A list with any missing/non-finite score degrades to a rank
    proxy: a single scoreless arm must preserve its own order."""
    from dial_rag_tpu.retrieval.ensemble import weighted_score_fusion

    hits = [
        SearchHit(doc_id=0, chunk_id=c, retrieval_type=RetrievalType.TEXT)
        for c in (4, 2, 9)
    ]
    fused = weighted_score_fusion([hits], [1.0])
    assert [h.chunk_id for h in fused] == [4, 2, 9]


def test_combmnz_multi_arm_support_wins():
    """CombMNZ: a doc two arms agree on (in their top-7) outranks a doc
    with comparable single-arm evidence."""
    from dial_rag_tpu.retrieval.ensemble import weighted_score_fusion

    a = np.zeros(10)
    b = np.zeros(10)
    a[3], a[5] = 1.0, 0.9  # arm A: doc3 best, doc5 close second
    b[5], b[8] = 1.0, 0.2  # arm B: doc5 best
    lists = [_hits_from_scores(a, 7), _hits_from_scores(b, 7)]
    fused = weighted_score_fusion(lists, [1.0, 1.0], method="combmnz")
    assert fused[0].chunk_id == 5  # support 2 beats doc3's single arm


def test_search_hit_equality_and_key_ignore_score():
    h1 = SearchHit(0, 3, RetrievalType.TEXT, score=1.5)
    h2 = SearchHit(0, 3, RetrievalType.TEXT)
    assert h1 == h2
    assert hash(h1) == hash(h2)
    assert h1.key == h2.key
    assert "score" not in h1.to_metadata()


def test_arm_hits_carry_descending_scores(records, embedder):
    """BM25 / semantic retriever hits must carry their native scores
    (BM25: Okapi == get_scores; dense: -distance), sorted descending."""
    bm25 = Bm25Retriever.from_doc_records(records, k=4)
    hits = bm25.retrieve("cadibona southern boundary")
    assert hits and all(h.score is not None for h in hits)
    assert [h.score for h in hits] == sorted(
        (h.score for h in hits), reverse=True
    )
    flat_scores = bm25._index.get_scores(
        __import__(
            "dial_rag_tpu.text.keywords", fromlist=["keywords_preprocess"]
        ).keywords_preprocess("cadibona southern boundary")
    )
    flat_idx = [
        records_flat_index(records, h.doc_id, h.chunk_id) for h in hits
    ]
    np.testing.assert_allclose(
        [h.score for h in hits], flat_scores[flat_idx], rtol=1e-6
    )

    sem = SemanticRetriever.from_doc_records(embedder, records, k=3)
    shits = sem.retrieve("climate in the alps")
    assert shits and all(h.score is not None for h in shits)
    assert [h.score for h in shits] == sorted(
        (h.score for h in shits), reverse=True
    )


def records_flat_index(records, doc_id, chunk_id):
    flat = 0
    for i, rec in enumerate(records):
        if i == doc_id:
            return flat + chunk_id
        flat += len(rec.chunks)
    raise AssertionError("doc_id out of range")


def test_create_retriever_score_fusion_mode(embedder, big_records):
    from dial_rag_tpu.service.config import IndexingConfig
    from dial_rag_tpu.service.retrieval_chain import create_retriever

    stage = create_retriever(
        embedder,
        "http://dial.example",
        "key",
        big_records,
        IndexingConfig(),
        make_retrieval_stage=_Stage,
        ensemble_weights={"semantic": 0.0},
        fusion_method="combmnz",
        fusion_norm="minmax",
        fusion_depth=30,
    )
    ens = stage.retriever
    assert ens.fusion_method == "combmnz"
    assert ens.output_limit == 7 * len(ens.retrievers)
    # the bm25 arm retrieves at the fusion depth, not k=7
    bm25_stage = next(
        s for s in ens.retrievers if s.name == "Keywords search"
    )
    assert bm25_stage.retriever.k == 30

    import asyncio

    hits = asyncio.run(ens.aretrieve("cadibona southern boundary"))
    assert hits and len(hits) <= ens.output_limit
    assert hits[0].score is not None


def test_score_fusion_weight_zero_arm_is_inert():
    """A weight-0 arm contributes nothing: no score, no CombMNZ
    support, no union membership (parity with the eval experiment,
    which skips w=0 arms entirely)."""
    from dial_rag_tpu.retrieval.ensemble import weighted_score_fusion

    a = np.zeros(10)
    a[1], a[2] = 1.0, 0.5
    b = np.zeros(10)
    b[7], b[1] = 1.0, 0.9
    with_zero = weighted_score_fusion(
        [_hits_from_scores(a, 7), _hits_from_scores(b, 7)],
        [1.0, 0.0],
        method="combmnz",
    )
    alone = weighted_score_fusion(
        [_hits_from_scores(a, 7)], [1.0], method="combmnz"
    )
    assert [h.chunk_id for h in with_zero] == [h.chunk_id for h in alone]
