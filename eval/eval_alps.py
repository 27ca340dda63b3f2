"""Retrieval eval on the reference's REAL corpus: alps_wiki.pdf.

The reference evaluates retrieval on a 23-page Wikipedia PDF against
LLM-generated ground truth (reference eval/eval_retriever.py:109-146,
scored by the external ``aidial-rag-eval`` fact-matching package).
This harness runs the same data through the first-party pipeline —
PDF parse -> by-title chunking -> BM25 (+ semantic + RRF ensemble) —
and scores it first-party:

- **Relevance** is fact containment: the ground truth gives verbatim
  fact sentences, so a chunk is relevant to a question when it covers
  >= 80% of a fact's word trigrams (robust to PDF extraction artifacts
  like hyphenation and ligatures; measured coverage of the best chunk
  is >= 0.9 for all 39 questions).
- **Metrics**: recall@{1,3,7}, MRR, page-recall, and fact-recall@7
  (fraction of facts whose text is covered by the top-7 union — the
  closest first-party analogue of the reference's fact-based scoring).

Chunk-count note: this parser+chunker produces **173 chunks** on this
25-page quality corpus where the reference's unstructured-based
pipeline produces 177 (reference tests/test_retrievers.py:63 — on the
26-page golden corpus the first-party pipeline matches the reference's
177 EXACTLY; the residual 4-chunk divergence here is the page-7
char-margin junctions quantified in docs/chunking_parity.md). Recall
is scored against fact containment, not chunk ids, so the comparison
is apples-to-apples.

Semantic numbers are real retrieval quality only when --model-dir
points at a real bge-small-en checkpoint; with the default
random-weight encoder they measure pipeline wiring, not model quality,
and are labeled as such in the output.

Run:  JAX_PLATFORMS=cpu python -m eval.eval_alps [--model-dir HF_DIR]
Writes eval/out/alps_metrics.json.
"""

import argparse
import asyncio
import json
import os
import re
import time
from pathlib import Path


from eval._platform import honor_jax_platforms_env

from dial_rag_tpu.documents.model import (
    FORMAT_VERSION,
    DocumentRecord,
    IndexSettings,
)
from dial_rag_tpu.documents.parser import parse_document
from dial_rag_tpu.retrieval import (
    LateInteractionRetriever,
    Bm25Retriever,
    EnsembleRetriever,
    SemanticRetriever,
)

DEFAULT_DATA_DIR = "/root/reference/eval/data"
PDF_NAME = "alps_wiki.pdf"
TRUTH_NAME = "alps_ground_truth_mixtral_v2.parquet"
K_VALUES = (1, 3, 7)
SHINGLE_N = 3
COVERAGE_THRESHOLD = 0.8


def alps_data_available(data_dir: str = DEFAULT_DATA_DIR) -> bool:
    d = Path(data_dir)
    return (d / PDF_NAME).is_file() and (d / TRUTH_NAME).is_file()


def load_alps(data_dir: str = DEFAULT_DATA_DIR):
    """(pdf bytes, ground-truth rows [{question, facts}, ...])."""
    import pandas as pd

    d = Path(data_dir)
    pdf_bytes = (d / PDF_NAME).read_bytes()
    df = pd.read_parquet(d / TRUTH_NAME)
    rows = [
        {"question": row["question"], "facts": list(row["facts"])}
        for _, row in df.iterrows()
    ]
    return pdf_bytes, rows


def _norm_tokens(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


def _shingles(tokens: list[str], n: int = SHINGLE_N) -> set:
    if len(tokens) < n:
        return {tuple(tokens)} if tokens else set()
    return {tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def fact_relevance(chunks, rows) -> list[set[int]]:
    """Per-question sets of relevant chunk ids (>=80% trigram coverage
    of some ground-truth fact)."""
    chunk_sh = [_shingles(_norm_tokens(c.text)) for c in chunks]
    truth = []
    for row in rows:
        rel: set[int] = set()
        for fact in row["facts"]:
            fs = _shingles(_norm_tokens(fact))
            if not fs:
                continue
            for i, cs in enumerate(chunk_sh):
                if len(fs & cs) / len(fs) >= COVERAGE_THRESHOLD:
                    rel.add(i)
        truth.append(rel)
    return truth


def parse_alps(pdf_bytes: bytes):
    return parse_document(
        pdf_bytes,
        "application/pdf",
        source_link=PDF_NAME,
        display_name=PDF_NAME,
    )


async def build_record(pdf_bytes: bytes, chunks, embedder=None, li_embedder=None):
    text_index = await Bm25Retriever.build_index(chunks)
    embeddings_index = (
        await SemanticRetriever.build_index(embedder, chunks)
        if embedder is not None
        else None
    )
    late_interaction_index = (
        await LateInteractionRetriever.build_index(li_embedder, chunks)
        if li_embedder is not None
        else None
    )
    return DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=text_index,
        embeddings_index=embeddings_index,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        late_interaction_index=late_interaction_index,
        mime_type="application/pdf",
        document_bytes=pdf_bytes,
    )


def score(all_hits, truth, chunks) -> dict:
    n = len(truth)
    hits_at = {k: 0 for k in K_VALUES}
    page_hits_at = {k: 0 for k in K_VALUES}
    mrr = 0.0
    for hits, rel in zip(all_hits, truth):
        ids = [h.chunk_id for h in hits]
        pages = [chunks[c].page_number for c in ids]
        rel_pages = {chunks[c].page_number for c in rel}
        rank = next((i + 1 for i, c in enumerate(ids) if c in rel), None)
        if rank is not None:
            mrr += 1.0 / rank
        for k in K_VALUES:
            if any(c in rel for c in ids[:k]):
                hits_at[k] += 1
            if rel_pages and any(p in rel_pages for p in pages[:k]):
                page_hits_at[k] += 1
    return {
        **{f"recall@{k}": hits_at[k] / n for k in K_VALUES},
        **{f"page_recall@{k}": page_hits_at[k] / n for k in K_VALUES},
        "mrr": mrr / n,
    }


def fact_recall_at_k(all_hits, rows, chunks, k: int = 7) -> float:
    """Fraction of ground-truth facts covered by the top-k union —
    the first-party analogue of the reference's fact-matching eval."""
    covered = 0
    total = 0
    for hits, row in zip(all_hits, rows):
        union_tokens: list[str] = []
        for h in hits[:k]:
            union_tokens += _norm_tokens(chunks[h.chunk_id].text)
        union_sh = _shingles(union_tokens)
        for fact in row["facts"]:
            fs = _shingles(_norm_tokens(fact))
            if not fs:
                continue
            total += 1
            if len(fs & union_sh) / len(fs) >= COVERAGE_THRESHOLD:
                covered += 1
    return covered / max(total, 1)


async def run_eval(
    data_dir: str, model_dir: str | None, li_model_dir: str | None = None
) -> dict:
    pdf_bytes, rows = load_alps(data_dir)
    t0 = time.perf_counter()
    chunks = parse_alps(pdf_bytes)
    t_parse = time.perf_counter() - t0

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    embedder = None
    semantic_model = None
    if model_dir:
        embedder = BgeEmbedder.from_hf_checkpoint(model_dir)
        semantic_model = model_dir
    elif os.environ.get("DIAL_RAG__EMBEDDER__MODEL_PATH"):
        semantic_model = os.environ["DIAL_RAG__EMBEDDER__MODEL_PATH"]
        embedder = BgeEmbedder.from_hf_checkpoint(semantic_model)

    # late-interaction arm: its own checkpoint (--li-model-dir, e.g. a
    # MaxSim-objective artifact) wins; else it shares the semantic
    # embedder; without either, a corpus-vocab random-weight encoder
    # gives a purely LEXICAL MaxSim signal (identical subwords embed
    # identically for identical contexts) — a wiring check only
    li_model = li_model_dir or semantic_model
    li_embedder = (
        BgeEmbedder.from_hf_checkpoint(li_model_dir)
        if li_model_dir
        else embedder
    )
    if li_embedder is None:
        from dial_rag_tpu.models.tokenizer import build_test_vocab

        words = sorted({w for c in chunks for w in c.text.lower().split()})
        li_embedder = BgeEmbedder.from_random(
            vocab=build_test_vocab(words, size=8192), batch_size=32
        )
        # the tiny config has only 128 trained positions; longer inputs
        # would clamp-gather position row 127 for every later token
        li_embedder.max_len = (
            li_embedder.encoder.config.max_position_embeddings
        )

    record = await build_record(pdf_bytes, chunks, embedder, li_embedder)
    truth = fact_relevance(chunks, rows)
    questions = [r["question"] for r in rows]

    retrievers = {"bm25": Bm25Retriever.from_doc_records([record], k=7)}
    retrievers["late_interaction"] = LateInteractionRetriever.from_doc_records(
        li_embedder, [record], k=7
    )
    if embedder is not None:
        retrievers["semantic"] = SemanticRetriever.from_doc_records(
            embedder, [record], k=7
        )
        # serving fuses every enabled arm (RRF); mirror it
        retrievers["ensemble"] = EnsembleRetriever(
            [
                retrievers["semantic"],
                retrievers["bm25"],
                retrievers["late_interaction"],
            ]
        )

    metrics: dict = {
        "corpus": PDF_NAME,
        "n_questions": len(rows),
        "n_chunks": len(chunks),
        "n_chunks_reference_pipeline": 177,
        "unmapped_questions": sum(1 for t in truth if not t),
        "parse_s": round(t_parse, 3),
        "semantic_model": semantic_model
        or "none (BM25 only; pass --model-dir for semantic quality)",
        "late_interaction_model": li_model
        or "random-weights — a wiring check, NOT a quality number: "
        "contextual token embeddings carry no signal untrained (real "
        "questions share few verbatim contexts with chunks); provide "
        "--model-dir for a meaningful MaxSim row",
    }
    for name, retriever in retrievers.items():
        all_hits = [await retriever.aretrieve(q) for q in questions]
        metrics[name] = score(all_hits, truth, chunks)
        metrics[name]["fact_recall@7"] = fact_recall_at_k(
            all_hits, rows, chunks, k=7
        )
    return metrics


def main(argv=None) -> dict:
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", default=DEFAULT_DATA_DIR)
    parser.add_argument(
        "--model-dir",
        default=None,
        help="local bge-small-en checkpoint dir; adds semantic+ensemble",
    )
    parser.add_argument(
        "--li-model-dir",
        default=None,
        help="separate checkpoint for the late-interaction arm "
        "(e.g. a MaxSim-objective artifact)",
    )
    parser.add_argument("--out", default=str(Path(__file__).parent / "out"))
    args = parser.parse_args(argv)

    if not alps_data_available(args.data_dir):
        raise SystemExit(f"alps data not found under {args.data_dir}")
    metrics = asyncio.run(
        run_eval(args.data_dir, args.model_dir, args.li_model_dir)
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "alps_metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)
    for name in ("bm25", "late_interaction", "semantic", "ensemble"):
        if name in metrics:
            m = metrics[name]
            print(
                f"{name:9s} recall@1={m['recall@1']:.3f} "
                f"recall@7={m['recall@7']:.3f} mrr={m['mrr']:.3f} "
                f"fact_recall@7={m['fact_recall@7']:.3f}"
            )
    return metrics


if __name__ == "__main__":
    main()
