"""Weighted-RRF tuning for the zero-egress checkpoint profile.

The reference serves equal-weight RRF (reference
retrieval_chain.py:207-242) — the right default when every arm is a
real pretrained model. The first-party zero-egress arms are
BM25-distilled students, and the held-out paraphrase set showed the
equal-weight fusion TRAILS plain BM25 there (BASELINE.md "Held-out
paraphrase test"). This experiment asks: does a non-uniform weighting
recover BM25 parity on paraphrase phrasing without giving up the
39-row win?

Protocol (no training, no contamination): per-arm hit lists are
computed ONCE; the 155 hand-authored questions are split
even-index→DEV / odd-index→TEST; a weight grid is scored on DEV by
recall@7 (tie-break MRR) using the production
``weighted_reciprocal_rank``; the winner is then reported on TEST, on
the 39 parquet rows, and on pseudo-queries — none of which influenced
the selection.

Run: JAX_PLATFORMS=cpu python -m eval.tune_ensemble \
       --model-dir checkpoints/alps-semantic \
       --li-model-dir checkpoints/alps-maxsim
Writes eval/out/ensemble_weights.json.
"""

import argparse
import asyncio
import itertools
import json
from pathlib import Path

from eval._platform import honor_jax_platforms_env
from eval.eval_alps import (
    DEFAULT_DATA_DIR,
    alps_data_available,
    build_record,
    fact_relevance,
    load_alps,
    load_handmade_questions,
    make_pseudo_queries,
    parse_alps,
    score_per_question,
)

from dial_rag_tpu.retrieval import (
    Bm25Retriever,
    LateInteractionRetriever,
    SemanticRetriever,
)
from dial_rag_tpu.retrieval.ensemble import weighted_reciprocal_rank

ARMS = ("semantic", "bm25", "late_interaction")
GRID = (0.0, 0.25, 0.5, 1.0, 1.5, 2.0)


def fuse_and_score(hit_lists_by_arm, weights, truth, chunks, idx=None):
    """Fuse cached per-arm hit lists with ``weights`` and score."""
    n = len(truth)
    rows = range(n) if idx is None else idx
    fused = [
        weighted_reciprocal_rank(
            [hit_lists_by_arm[a][i] for a in ARMS], list(weights)
        )[:7]
        for i in rows
    ]
    sub_truth = [truth[i] for i in rows]
    per_q = score_per_question(fused, sub_truth, chunks)
    m = max(len(sub_truth), 1)
    return {k: sum(v) / m for k, v in per_q.items()}


async def collect_hits(retrievers, questions):
    return {
        a: [await retrievers[a].aretrieve(q) for q in questions]
        for a in ARMS
    }


async def run(data_dir, model_dir, li_model_dir):
    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    pdf_bytes, rows = load_alps(data_dir)
    chunks = parse_alps(pdf_bytes)
    embedder = BgeEmbedder.from_hf_checkpoint(model_dir)
    li_embedder = BgeEmbedder.from_hf_checkpoint(li_model_dir)
    record = await build_record(pdf_bytes, chunks, embedder, li_embedder)
    retrievers = {
        "bm25": Bm25Retriever.from_doc_records([record], k=7),
        "semantic": SemanticRetriever.from_doc_records(
            embedder, [record], k=7
        ),
        "late_interaction": LateInteractionRetriever.from_doc_records(
            li_embedder, [record], k=7
        ),
    }

    hm_rows = load_handmade_questions()
    hm_truth = fact_relevance(chunks, hm_rows)
    dev_idx = list(range(0, len(hm_rows), 2))
    test_idx = list(range(1, len(hm_rows), 2))

    hm_hits = await collect_hits(
        retrievers, [r["question"] for r in hm_rows]
    )
    real_truth = fact_relevance(chunks, rows)
    real_hits = await collect_hits(
        retrievers, [r["question"] for r in rows]
    )
    pseudo_rows = make_pseudo_queries(rows)
    pseudo_truth = fact_relevance(chunks, pseudo_rows)
    pseudo_hits = await collect_hits(
        retrievers, [r["question"] for r in pseudo_rows]
    )

    results = []
    for w in itertools.product(GRID, repeat=3):
        if w[1] == 0.0:  # bm25 always on: it is the parity floor arm
            continue
        dev = fuse_and_score(hm_hits, w, hm_truth, chunks, dev_idx)
        results.append((dev["recall@7"], dev["mrr"], w))
    results.sort(reverse=True)
    best = results[0]
    w_best = best[2]

    def report(weights):
        return {
            "weights": dict(zip(ARMS, weights)),
            "handmade_dev": fuse_and_score(
                hm_hits, weights, hm_truth, chunks, dev_idx
            ),
            "handmade_test": fuse_and_score(
                hm_hits, weights, hm_truth, chunks, test_idx
            ),
            "real_39": fuse_and_score(
                real_hits, weights, real_truth, chunks
            ),
            "pseudo": fuse_and_score(
                pseudo_hits, weights, pseudo_truth, chunks
            ),
        }

    out = {
        "protocol": "grid over %s per arm; selected on handmade DEV "
        "(even indices) recall@7 then MRR; TEST (odd indices), the 39 "
        "parquet rows and pseudo-queries never influenced selection"
        % (GRID,),
        "parity_equal_weights": report((1.0, 1.0, 1.0)),
        "bm25_only": report((0.0, 1.0, 0.0)),
        "tuned": report(w_best),
        "grid_top5": [
            {"weights": dict(zip(ARMS, w)), "dev_recall@7": r7, "dev_mrr": mrr}
            for r7, mrr, w in results[:5]
        ],
    }
    return out


def main(argv=None):
    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=DEFAULT_DATA_DIR)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--li-model-dir", required=True)
    p.add_argument("--out", default=str(Path(__file__).parent / "out"))
    args = p.parse_args(argv)
    if not alps_data_available(args.data_dir):
        raise SystemExit(f"alps data not found under {args.data_dir}")
    out = asyncio.run(run(args.data_dir, args.model_dir, args.li_model_dir))
    Path(args.out).mkdir(parents=True, exist_ok=True)
    with open(Path(args.out) / "ensemble_weights.json", "w") as f:
        json.dump(out, f, indent=2)
    for name in ("parity_equal_weights", "bm25_only", "tuned"):
        r = out[name]
        print(
            f"{name:22s} w={tuple(r['weights'].values())} "
            f"dev@7={r['handmade_dev']['recall@7']:.3f} "
            f"TEST@7={r['handmade_test']['recall@7']:.3f} "
            f"test_mrr={r['handmade_test']['mrr']:.3f} "
            f"real39@7={r['real_39']['recall@7']:.3f} "
            f"pseudo@7={r['pseudo']['recall@7']:.3f}"
        )
    return out


if __name__ == "__main__":
    main()
