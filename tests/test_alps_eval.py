"""Retrieval-quality goldens on the reference's REAL corpus.

The reference's quality surface is real-document goldens over
alps_wiki.pdf (reference tests/test_retrievers.py:63-104: 177 chunks,
BM25 "Colle di Cadibona" -> a page-3 chunk, semantic "climate" -> a
page-10 chunk) plus the parquet ground-truth eval
(reference eval/eval_retriever.py:109-146). These tests run the same
data — used strictly as *data*, mounted read-only — through the
first-party parse -> chunk -> BM25 pipeline and pin both the
reference's behavioral contracts and this pipeline's own measured
quality as regression floors.
"""

import asyncio

import pytest

from eval.eval_alps import (
    alps_data_available,
    build_record,
    fact_relevance,
    load_alps,
    parse_alps,
    score,
)

pytestmark = pytest.mark.skipif(
    not alps_data_available(),
    reason="reference alps corpus not mounted",
)


@pytest.fixture(scope="module")
def alps():
    pdf_bytes, rows = load_alps()
    chunks = parse_alps(pdf_bytes)
    record = asyncio.run(build_record(pdf_bytes, chunks))
    return pdf_bytes, rows, chunks, record


def test_chunk_count_pinned(alps):
    """102 chunks from the first-party parser+chunker. The reference's
    unstructured-based pipeline makes 177 (test_retrievers.py:63): the
    by-title chunker packs up to 1000 chars per chunk, so chunks are
    ~2x larger; recall is scored on fact containment, so the count
    difference does not distort the quality comparison."""
    _, _, chunks, _ = alps
    assert len(chunks) == 102
    pages = {c.page_number for c in chunks}
    assert min(pages) == 1 and max(pages) == 25


def test_every_ground_truth_fact_survives_parsing(alps):
    """All 39 questions must map to at least one chunk containing their
    fact — proves the parser+chunker preserve the ground-truth text."""
    _, rows, chunks, _ = alps
    truth = fact_relevance(chunks, rows)
    assert len(truth) == 39
    assert sum(1 for t in truth if not t) == 0


def test_bm25_cadibona_golden(alps):
    """Reference contract: BM25 'Colle di Cadibona' retrieves a page-3
    chunk (reference tests/test_retrievers.py:82-88 pins chunk 31 page
    3 for its chunker; ours is chunk 12 — the page is the contract, the
    chunk id is this pipeline's own frozen regression golden)."""
    from dial_rag_tpu.retrieval import Bm25Retriever

    _, _, chunks, record = alps
    retriever = Bm25Retriever.from_doc_records([record], k=7)
    hits = asyncio.run(retriever.aretrieve("Colle di Cadibona"))
    top = hits[0]
    assert top.chunk_id == 12
    assert chunks[top.chunk_id].page_number == 3
    assert "Cadibona" in chunks[top.chunk_id].text


def test_bm25_quality_floors(alps):
    """Measured round-2 quality on the real corpus, frozen as floors:
    recall@1 0.872, recall@7 0.974, MRR 0.909 (the single @7 miss is a
    ground-truth typo: 'climber' for 'climbed')."""
    from dial_rag_tpu.retrieval import Bm25Retriever

    _, rows, chunks, record = alps
    truth = fact_relevance(chunks, rows)
    retriever = Bm25Retriever.from_doc_records([record], k=7)
    all_hits = [
        asyncio.run(retriever.aretrieve(r["question"])) for r in rows
    ]
    m = score(all_hits, truth, chunks)
    assert m["recall@1"] >= 0.85
    assert m["recall@7"] >= 0.97
    assert m["mrr"] >= 0.90


@pytest.mark.skipif(
    not __import__("os").environ.get("DIAL_RAG__EMBEDDER__MODEL_PATH"),
    reason="needs a real bge-small-en checkpoint artifact",
)
def test_semantic_climate_golden(alps):
    """Reference contract with real weights: semantic 'climate'
    retrieves the climate section (reference test_retrievers.py:90-104
    pins chunk 103 page 10). Lights up when a checkpoint is provided
    via DIAL_RAG__EMBEDDER__MODEL_PATH."""
    import os

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.retrieval import SemanticRetriever

    pdf_bytes, _, chunks, _ = alps
    embedder = BgeEmbedder.from_hf_checkpoint(
        os.environ["DIAL_RAG__EMBEDDER__MODEL_PATH"]
    )
    record = asyncio.run(build_record(pdf_bytes, chunks, embedder))
    retriever = SemanticRetriever.from_doc_records(embedder, [record], k=7)
    hits = asyncio.run(retriever.aretrieve("climate"))
    assert "climate" in chunks[hits[0].chunk_id].text.lower()
