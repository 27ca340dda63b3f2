"""Retrieval eval harness: recall/MRR over the synthetic atlas corpus.

TPU-native counterpart of the reference's eval entry point
(reference eval/eval_retriever.py:109-152), which builds a document
record for a wiki PDF, runs the text-only retriever chain over ground-
truth questions, and scores the answers. Differences by design:

- the corpus is synthesized deterministically (eval/corpus.py) instead
  of shipping external data;
- scoring is first-party (recall@k, MRR at chunk and page granularity)
  instead of the private ``aidial-rag-eval`` package;
- the document goes through the real pipeline: first-party PDF parse ->
  by-title chunking -> BM25 + semantic index build on device -> RRF
  ensemble retrieval (the reference's text-only configuration:
  semantic k=7 + bm25 k=7, equal weights — retrieval_chain.py:201-245).

Run:  python -m eval.eval_retriever [--pages 20] [--model-dir HF_DIR]
Writes eval/out/metrics.json and eval/out/metrics.txt. Without
--model-dir a deterministic random-weight encoder is used: BM25 numbers
are real retrieval quality; semantic numbers then only measure pipeline
wiring, not model quality.
"""

import argparse
import asyncio
import json
import os
import time
from pathlib import Path

from eval._platform import honor_jax_platforms_env

from dial_rag_tpu.documents.model import (
    FORMAT_VERSION,
    DocumentRecord,
    IndexSettings,
)
from dial_rag_tpu.documents.parser import parse_document
from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.retrieval import (
    LateInteractionRetriever,
    Bm25Retriever,
    EnsembleRetriever,
    SemanticRetriever,
)

from eval.corpus import EvalCorpus, build_corpus

MIME_PDF = "application/pdf"
K_VALUES = (1, 3, 7)


def make_test_embedder(corpus: EvalCorpus, batch_size: int = 64) -> BgeEmbedder:
    """Deterministic random-weight embedder over the corpus vocabulary."""
    from dial_rag_tpu.models.tokenizer import build_test_vocab

    return BgeEmbedder.from_random(
        vocab=build_test_vocab(corpus.words), batch_size=batch_size
    )


async def build_record(
    corpus: EvalCorpus,
    embedder: BgeEmbedder,
    li_embedder: BgeEmbedder | None = None,
) -> tuple[DocumentRecord, dict]:
    t0 = time.perf_counter()
    chunks = parse_document(
        corpus.pdf_bytes,
        MIME_PDF,
        source_link="atlas.pdf",
        display_name="atlas.pdf",
    )
    t_parse = time.perf_counter() - t0

    t0 = time.perf_counter()
    text_index = await Bm25Retriever.build_index(chunks)
    t_bm25 = time.perf_counter() - t0

    t0 = time.perf_counter()
    embeddings_index = await SemanticRetriever.build_index(embedder, chunks)
    t_embed = time.perf_counter() - t0

    t0 = time.perf_counter()
    late_interaction_index = await LateInteractionRetriever.build_index(
        li_embedder or embedder, chunks
    )
    t_li = time.perf_counter() - t0

    record = DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=text_index,
        embeddings_index=embeddings_index,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        late_interaction_index=late_interaction_index,
        mime_type=MIME_PDF,
        document_bytes=corpus.pdf_bytes,
    )
    timings = {
        "n_chunks": len(chunks),
        "parse_s": t_parse,
        "bm25_build_s": t_bm25,
        "embed_build_s": t_embed,
        "late_interaction_build_s": t_li,
        "index_chunks_per_s": len(chunks) / max(t_bm25 + t_embed, 1e-9),
    }
    return record, timings


def _ground_truth_chunks(corpus: EvalCorpus, record: DocumentRecord) -> list:
    """Map each question's fact sentence to the chunk id containing it."""
    truth = []
    for q in corpus.questions:
        ids = [
            i
            for i, c in enumerate(record.chunks)
            if q.fact in c.text
            or q.fact in c.text.replace("\n", " ")
        ]
        truth.append(ids)
    return truth


async def run_eval(
    corpus: EvalCorpus,
    embedder: BgeEmbedder,
    record: DocumentRecord,
    li_embedder: BgeEmbedder | None = None,
) -> dict:
    records = [record]
    retrievers = {
        "bm25": Bm25Retriever.from_doc_records(records, k=max(K_VALUES)),
        "semantic": SemanticRetriever.from_doc_records(
            embedder, records, k=max(K_VALUES)
        ),
        "late_interaction": LateInteractionRetriever.from_doc_records(
            li_embedder or embedder, records, k=max(K_VALUES)
        ),
    }
    # serving fuses every enabled arm (RRF); mirror it
    retrievers["ensemble"] = EnsembleRetriever(
        [
            retrievers["semantic"],
            retrievers["bm25"],
            retrievers["late_interaction"],
        ]
    )

    # batched mode: all questions in a handful of device dispatches
    # (one encode + one scan per retriever + fusion) — the serving-side
    # throughput figure as opposed to the per-query p50
    t0 = time.perf_counter()
    batched_hits = await retrievers["ensemble"].aretrieve_batch(
        [q.question for q in corpus.questions]
    )
    batch_elapsed = time.perf_counter() - t0

    truth = _ground_truth_chunks(corpus, record)
    unmapped = sum(1 for ids in truth if not ids)
    metrics = {}
    for name, retriever in retrievers.items():
        hits_at = {k: 0 for k in K_VALUES}
        page_hits_at = {k: 0 for k in K_VALUES}
        mrr = 0.0
        latencies = []
        for q, true_ids in zip(corpus.questions, truth):
            t0 = time.perf_counter()
            found = await retriever.aretrieve(q.question)
            latencies.append(time.perf_counter() - t0)
            found_ids = [h.chunk_id for h in found]
            found_pages = [
                record.chunks[h.chunk_id].page_number for h in found
            ]
            rank = next(
                (
                    i + 1
                    for i, cid in enumerate(found_ids)
                    if cid in true_ids
                ),
                None,
            )
            if rank is not None:
                mrr += 1.0 / rank
            for k in K_VALUES:
                if true_ids and any(c in true_ids for c in found_ids[:k]):
                    hits_at[k] += 1
                if q.page_number in found_pages[:k]:
                    page_hits_at[k] += 1
        n = len(corpus.questions)
        latencies.sort()
        metrics[name] = {
            **{f"recall@{k}": hits_at[k] / n for k in K_VALUES},
            **{
                f"page_recall@{k}": page_hits_at[k] / n for k in K_VALUES
            },
            "mrr": mrr / n,
            "query_p50_ms": latencies[len(latencies) // 2] * 1e3,
            "query_p95_ms": latencies[int(len(latencies) * 0.95)] * 1e3,
        }
    n = len(corpus.questions)
    batch_hits_at1 = sum(
        1
        for found, true_ids in zip(batched_hits, truth)
        if found and true_ids and found[0].chunk_id in true_ids
    )
    metrics["ensemble_batched"] = {
        "recall@1": batch_hits_at1 / n,
        "queries_per_sec": n / max(batch_elapsed, 1e-9),
    }
    metrics["n_questions"] = n
    metrics["unmapped_questions"] = unmapped
    return metrics


def main(argv=None) -> dict:
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--model-dir",
        default=None,
        help="local HF BertModel checkpoint dir (config.json + "
        "model.safetensors + vocab.txt); default: random weights",
    )
    parser.add_argument(
        "--li-model-dir",
        default=None,
        help="separate checkpoint for the late-interaction arm",
    )
    parser.add_argument(
        "--out", default=str(Path(__file__).parent / "out")
    )
    args = parser.parse_args(argv)

    corpus = build_corpus(n_pages=args.pages, seed=args.seed)
    if args.model_dir:
        embedder = BgeEmbedder.from_hf_checkpoint(args.model_dir)
    else:
        embedder = make_test_embedder(corpus)
    li_embedder = (
        BgeEmbedder.from_hf_checkpoint(args.li_model_dir)
        if args.li_model_dir
        else None
    )

    record, timings = asyncio.run(
        build_record(corpus, embedder, li_embedder)
    )
    metrics = asyncio.run(
        run_eval(corpus, embedder, record, li_embedder)
    )
    metrics["indexing"] = timings
    metrics["model"] = args.model_dir or "random-weights"
    metrics["late_interaction_model"] = (
        args.li_model_dir or metrics["model"]
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)
    lines = [
        f"eval over {args.pages} pages, {metrics['n_questions']} questions",
        f"batched ensemble: "
        f"{metrics['ensemble_batched']['queries_per_sec']:.0f} queries/s "
        f"(recall@1={metrics['ensemble_batched']['recall@1']:.3f})",
    ]
    for name in ("bm25", "semantic", "late_interaction", "ensemble"):
        m = metrics[name]
        lines.append(
            f"{name:9s} recall@1={m['recall@1']:.3f} "
            f"recall@7={m['recall@7']:.3f} mrr={m['mrr']:.3f} "
            f"p50={m['query_p50_ms']:.1f}ms"
        )
    text = "\n".join(lines)
    (out_dir / "metrics.txt").write_text(text + "\n")
    print(text)
    return metrics


if __name__ == "__main__":
    main()
