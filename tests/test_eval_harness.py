"""The eval harness end-to-end on a small corpus (CPU test mesh).

Mirrors the reference's eval entry point role (reference
eval/eval_retriever.py): document through the real parse -> chunk ->
index pipeline, retrieval metrics out. BM25 ground truth uses globally
unique proper nouns, so recall@1 must be perfect regardless of model
weights; that makes the threshold a real regression guard for the
parse/chunk/index/query chain.
"""

import asyncio
import json

from eval.corpus import build_corpus
from eval.eval_retriever import (
    build_record,
    main,
    make_test_embedder,
    run_eval,
)


def test_corpus_deterministic():
    a = build_corpus(n_pages=4, seed=7)
    b = build_corpus(n_pages=4, seed=7)
    assert a.pdf_bytes == b.pdf_bytes
    assert a.questions == b.questions
    assert len(a.questions) == 12


def test_eval_end_to_end(tmp_path):
    metrics = main(["--pages", "5", "--out", str(tmp_path)])
    assert metrics["unmapped_questions"] == 0
    assert metrics["bm25"]["recall@1"] == 1.0
    assert metrics["bm25"]["mrr"] == 1.0
    # ensemble includes the random-weight semantic ranks, but every true
    # chunk must still surface within the union of both k=7 lists
    assert metrics["ensemble"]["recall@7"] >= 0.9
    on_disk = json.loads((tmp_path / "metrics.json").read_text())
    assert on_disk["bm25"]["recall@1"] == 1.0
    assert (tmp_path / "metrics.txt").exists()


def test_every_fact_maps_to_one_chunk():
    corpus = build_corpus(n_pages=5)
    embedder = make_test_embedder(corpus)
    record, timings = asyncio.run(build_record(corpus, embedder))
    assert timings["n_chunks"] >= 5
    metrics = asyncio.run(run_eval(corpus, embedder, record))
    assert metrics["unmapped_questions"] == 0


def test_frozen_retrieval_goldens():
    """Exact chunk-id goldens on the seeded corpus + seeded encoder —
    the counterpart of the reference's alps goldens
    (test_retrievers.py:82-104). Any change to the tokenizer, encoder
    init, parse/chunk pipeline, BM25 weights, or top-k tie-breaks shows
    up here as an exact-id diff."""
    from dial_rag_tpu.retrieval import Bm25Retriever, SemanticRetriever

    corpus = build_corpus(n_pages=5, seed=0)
    embedder = make_test_embedder(corpus)
    record, _ = asyncio.run(build_record(corpus, embedder))
    assert len(record.chunks) == 5

    bm25 = Bm25Retriever.from_doc_records([record], k=3)
    sem = SemanticRetriever.from_doc_records(embedder, [record], k=3)

    q0 = corpus.questions[0].question
    assert q0 == "How many meters tall is Mount Drorfell?"
    assert [h.chunk_id for h in bm25.retrieve(q0)] == [0, 4, 3]
    assert [h.chunk_id for h in sem.retrieve(q0)] == [3, 2, 1]

    q3 = corpus.questions[3].question
    assert q3 == "How many meters tall is Mount Glinwick?"
    assert [h.chunk_id for h in bm25.retrieve(q3)] == [1, 4, 3]
    assert [h.chunk_id for h in sem.retrieve(q3)] == [3, 2, 1]
