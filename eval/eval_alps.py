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
25-page quality corpus. The reference's recorded 177-chunk contract
(tests/test_retrievers.py:63) is for the DIFFERENT 26-page golden
corpus, where the first-party pipeline matches 177 EXACTLY; the
reference pipeline's chunk count on this eval corpus is unrecorded
anywhere (its unstructured stack is not installable in this image), so
none is claimed (docs/chunking_parity.md). Recall is scored against
fact containment, not chunk ids, so arm comparisons are
apples-to-apples regardless.

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
        {
            "question": row["question"],
            "facts": list(row["facts"]),
            "answer": str(row.get("answer", "") or ""),
        }
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
    from dial_rag_tpu.retrieval.chargram_retriever import ChargramRetriever

    text_index = await Bm25Retriever.build_index(chunks)
    chargram_index = await ChargramRetriever.build_index(chunks)
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
        chargram_index=chargram_index,
        mime_type="application/pdf",
        document_bytes=pdf_bytes,
    )


def score_per_question(all_hits, truth, chunks) -> dict:
    """Per-question metric vectors (the unit bootstrap resampling
    works over)."""
    out = {f"recall@{k}": [] for k in K_VALUES}
    out.update({f"page_recall@{k}": [] for k in K_VALUES})
    out["mrr"] = []
    for hits, rel in zip(all_hits, truth):
        ids = [h.chunk_id for h in hits]
        pages = [chunks[c].page_number for c in ids]
        rel_pages = {chunks[c].page_number for c in rel}
        rank = next((i + 1 for i, c in enumerate(ids) if c in rel), None)
        out["mrr"].append(1.0 / rank if rank is not None else 0.0)
        for k in K_VALUES:
            out[f"recall@{k}"].append(
                1.0 if any(c in rel for c in ids[:k]) else 0.0
            )
            out[f"page_recall@{k}"].append(
                1.0
                if rel_pages and any(p in rel_pages for p in pages[:k])
                else 0.0
            )
    return out


def score(all_hits, truth, chunks) -> dict:
    per_q = score_per_question(all_hits, truth, chunks)
    n = max(len(truth), 1)
    return {name: sum(vals) / n for name, vals in per_q.items()}


def bootstrap_ci(values, n_boot: int = 4000, seed: int = 0, level=0.95):
    """Percentile bootstrap CI of the mean over questions."""
    import numpy as np

    values = np.asarray(values, dtype=np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(values), size=(n_boot, len(values)))
    means = values[idx].mean(axis=1)
    lo, hi = np.quantile(means, [(1 - level) / 2, (1 + level) / 2])
    return float(lo), float(hi)


def paired_delta_ci(values_a, values_b, n_boot: int = 4000, seed: int = 0):
    """Bootstrap CI of mean(a - b) with PAIRED resampling (both arms
    answered the same questions; pairing removes question-difficulty
    variance from the delta)."""
    import numpy as np

    delta = np.asarray(values_a, dtype=np.float64) - np.asarray(
        values_b, dtype=np.float64
    )
    lo, hi = bootstrap_ci(delta, n_boot=n_boot, seed=seed)
    return {
        "mean": float(delta.mean()),
        "ci95": [lo, hi],
        "excludes_zero": bool(lo > 0 or hi < 0),
    }


def make_pseudo_queries(rows, n_seeds: int = 4, drop: float = 0.45):
    """Expanded ground truth: word-dropout variants of the fact
    sentences (the facts define the relevance labels, so every variant
    is a labeled query). LEXICALLY BIASED by construction — dropout
    keeps surviving words verbatim, which favors lexical retrievers —
    so these rows measure arm STABILITY at larger n, not open-domain
    quality; the real 39 LLM-generated questions stay the headline."""
    import numpy as np

    pseudo = []
    for seed in range(n_seeds):
        rng = np.random.default_rng(1000 + seed)
        for row in rows:
            for fact in row["facts"]:
                words = fact.split()
                if len(words) < 8:
                    continue
                keep = rng.random(len(words)) >= drop
                if keep.sum() < 4:
                    keep[rng.choice(len(words), 4, replace=False)] = True
                query = " ".join(
                    w for w, k_ in zip(words, keep) if k_
                )
                pseudo.append({"question": query, "facts": [fact]})
    return pseudo


HANDMADE_PATH = Path(__file__).parent / "data" / "alps_handmade_questions.json"


def load_handmade_questions(path=HANDMADE_PATH) -> list[dict]:
    """155 hand-authored natural-language questions over the quality
    corpus (eval/data/alps_handmade_questions.json): questions are
    deliberately PARAPHRASED information requests (mean question-fact
    lexical overlap 0.44 vs the dropout pseudo-queries' 1.0 by
    construction), facts are near-verbatim corpus spans so
    fact_relevance labels them exactly like the reference parquet's 39
    mixtral rows (reference eval surface:
    /root/reference/eval/eval_retriever.py:109-146). Returns [] when
    the fixture is absent."""
    p = Path(path)
    if not p.is_file():
        return []
    data = json.loads(p.read_text())
    return [
        {"question": q["question"], "facts": list(q["facts"]), "answer": ""}
        for q in data["questions"]
    ]


def _answer_citation_stream(text: str):
    """Split an answer into small pieces, deliberately cutting inside
    citation tags, to exercise the streaming holdback exactly like a
    real token stream does."""

    async def gen():
        step = 7  # cuts land inside "<[12]>" tags regularly
        for i in range(0, len(text), step):
            yield text[i : i + step]

    return gen()


async def eval_answers(all_hits, rows, chunks, truth, diagnose=False) -> dict:
    """Answer-side eval over deterministic replayed answers (the
    reference scores generated answers via aidial-rag-eval, reference
    eval/eval_retriever.py:133-146; no live LLM exists in this image,
    so answers are replayed from the parquet's ground-truth answers
    and citations are chosen by a generator-independent heuristic).

    For each question, a scripted generator takes the parquet's
    ground-truth ANSWER text and cites every retrieved doc whose text
    covers >=60% of the answer+question unigrams (a content-overlap
    proxy that does NOT see the fact labels). The raw ``<[i]>`` answer
    then flows through the REAL streaming citation rewriter
    (service/citations.py::rewrite_citations) in small pieces, and the
    rewritten ``[k]`` numbering is verified to map back to the same
    chunks. Scored against the fact labels:

    - citation_precision: cited chunks that cover >=1 ground-truth fact
    - citation_recall: facts covered by >=1 cited chunk
    - answered_rate: questions with >=1 citation emitted
    - faithfulness: answer-token coverage by the union of cited chunks
    """
    import re as _re

    from dial_rag_tpu.service.citations import rewrite_citations

    n_prec_num = n_prec_den = 0
    n_rec_num = n_rec_den = 0
    answered = 0
    faithfulness_sum = 0.0
    faithfulness_n = 0
    # diagnosis accumulators (round-5 VERDICT #6: decompose the ~1/3
    # imprecision — real mapping bug vs ground-truth-key artifact)
    cases: list[dict] = []
    cov_hist: list[float] = []  # best fact coverage of EVERY citation
    exact_num = 0  # cited chunk in the question's relevant-chunk set
    neighbor_num = 0  # ...or adjacent to one (overlap-split artifact)
    for hits, row, rel in zip(all_hits, rows, truth):
        answer = str(row.get("answer") or "")
        if not answer:
            continue
        content = set(_norm_tokens(answer + " " + row["question"]))
        cited_raw = []
        for i, h in enumerate(hits):
            chunk_tokens = set(_norm_tokens(chunks[h.chunk_id].text))
            if content and len(content & chunk_tokens) / len(content) >= 0.6:
                cited_raw.append(i + 1)  # 1-based like the LLM prompt
        raw = answer + " " + " ".join(f"<[{i}]>" for i in cited_raw)

        pieces: list[str] = []
        cited_chunks: list[int] = []
        async for text, used in rewrite_citations(
            _answer_citation_stream(raw), len(hits)
        ):
            if used is None:
                pieces.append(text)
            else:
                cited_chunks = used
        rewritten = "".join(pieces)
        # plumbing invariant: [k] numbering maps back to the same docs.
        # Only checkable when the answer text itself carries no literal
        # bracketed digits (e.g. "in [1907]") — those are regex-
        # indistinguishable from rewriter citations; scoring below uses
        # the rewriter's structured `used` output either way.
        if not _re.search(r"\[\d+\]", answer):
            ks = [int(m) for m in _re.findall(r"\[(\d+)\]", rewritten)]
            assert all(1 <= k <= len(cited_chunks) for k in ks) and [
                cited_chunks[k - 1] + 1 for k in ks
            ] == cited_raw, (rewritten, cited_raw, cited_chunks)

        if cited_chunks:
            answered += 1
        cited_ids = [hits[i].chunk_id for i in cited_chunks]
        chunk_sh = [_shingles(_norm_tokens(chunks[c].text)) for c in cited_ids]
        for cid, cs in zip(cited_ids, chunk_sh):
            n_prec_den += 1
            best_cov = 0.0
            for fact in row["facts"]:
                fs = _shingles(_norm_tokens(fact))
                if fs:
                    best_cov = max(best_cov, len(fs & cs) / len(fs))
            covered = best_cov >= COVERAGE_THRESHOLD
            n_prec_num += 1 if covered else 0
            cov_hist.append(best_cov)
            in_rel = cid in rel
            near_rel = in_rel or any(
                abs(cid - r) <= 1 for r in rel
            )
            exact_num += 1 if in_rel else 0
            neighbor_num += 1 if near_rel else 0
            if not covered:
                # false positive under the 0.8-trigram key: classify it
                if best_cov >= 0.5:
                    kind = "near_miss_threshold"  # fact present, key
                    # slightly under the 0.8 trigram cut (paraphrase or
                    # tokenization drift in the ground-truth fact text)
                elif near_rel:
                    kind = "adjacent_overlap_split"  # the fact's chunk
                    # neighbors this one (overlap chunking split it)
                elif best_cov >= 0.2:
                    kind = "partial_topical"
                else:
                    kind = "irrelevant"
                cases.append(
                    {
                        "question": row["question"],
                        "chunk_id": int(cid),
                        "best_fact_coverage": round(best_cov, 3),
                        "in_relevant_set": in_rel,
                        "adjacent_to_relevant": near_rel and not in_rel,
                        "kind": kind,
                        "chunk_snippet": chunks[cid].text[:160],
                        "facts": list(row["facts"]),
                    }
                )
        for fact in row["facts"]:
            fs = _shingles(_norm_tokens(fact))
            if not fs:
                continue
            n_rec_den += 1
            if any(len(fs & cs) / len(fs) >= COVERAGE_THRESHOLD for cs in chunk_sh):
                n_rec_num += 1
        if cited_ids:
            union = set()
            for c in cited_ids:
                union |= set(_norm_tokens(chunks[c].text))
            ans_tokens = _norm_tokens(answer)
            if ans_tokens:
                faithfulness_sum += sum(
                    1 for t in ans_tokens if t in union
                ) / len(ans_tokens)
                faithfulness_n += 1
    out = {
        "citation_precision": n_prec_num / max(n_prec_den, 1),
        "citation_recall": n_rec_num / max(n_rec_den, 1),
        # corrected metric under exact-chunk keys: a citation counts
        # when the cited chunk is IN the question's relevant-chunk set
        # (fact_relevance labels), or additionally when it neighbors
        # one (overlap chunking splits facts across adjacent chunks —
        # a ground-truth-construction artifact, not a mapping bug)
        "citation_precision_exact_chunk": exact_num / max(n_prec_den, 1),
        "citation_precision_with_neighbors": neighbor_num
        / max(n_prec_den, 1),
        # sensitivity of the headline number to the trigram key cut
        "citation_precision_by_threshold": {
            str(t): sum(1 for c in cov_hist if c >= t)
            / max(len(cov_hist), 1)
            for t in (0.5, 0.6, 0.7, 0.8)
        },
        "answered_rate": answered / max(len(rows), 1),
        "faithfulness": faithfulness_sum / max(faithfulness_n, 1),
        "note": "replayed ground-truth answers + overlap-cited docs "
        "through the real streaming citation rewriter; generation "
        "quality itself needs a live LLM (zero egress here)",
    }
    if diagnose:
        from collections import Counter as _Counter

        out["false_positive_kinds"] = dict(
            _Counter(c["kind"] for c in cases)
        )
        out["false_positive_cases"] = cases
    return out


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
    data_dir: str,
    model_dir: str | None,
    li_model_dir: str | None = None,
    answers: bool = False,
    pseudo_queries: bool = True,
    handmade: bool = True,
    html_corpus: bool = True,
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

    from dial_rag_tpu.retrieval.chargram_retriever import ChargramRetriever

    retrievers = {"bm25": Bm25Retriever.from_doc_records([record], k=7)}
    retrievers["chargram"] = ChargramRetriever.from_doc_records([record], k=7)
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
        # the measured zero-egress serving profile (BASELINE.md
        # "Score-aware fusion"): combmnz/minmax over per-arm depth-30
        # score-carrying lists, weights {semantic: 0, li: 0.5} —
        # selected on the handmade DEV half only
        # (eval/tune_score_fusion.py)
        retrievers["ensemble_combmnz"] = EnsembleRetriever(
            [
                Bm25Retriever.from_doc_records([record], k=30),
                LateInteractionRetriever.from_doc_records(
                    li_embedder, [record], k=30
                ),
            ],
            weights=[1.0, 0.5],
            fusion_method="combmnz",
            fusion_norm="minmax",
            output_limit=14,
        )
        # the round-4 chargram winner (BASELINE.md "Char-n-gram arm"):
        # combsum/minmax over per-arm depth-30 lists, weights {semantic:
        # 0, bm25: 1, late_interaction: 1, chargram: 1} — selected on
        # the handmade DEV half only (eval/tune_chargram.py --full);
        # the first profile to beat bm25-only on BOTH recall@7 and MRR
        # of the untouched paraphrase TEST half
        retrievers["ensemble_chargram"] = EnsembleRetriever(
            [
                Bm25Retriever.from_doc_records([record], k=30),
                LateInteractionRetriever.from_doc_records(
                    li_embedder, [record], k=30
                ),
                ChargramRetriever.from_doc_records([record], k=30),
            ],
            weights=[1.0, 1.0, 1.0],
            fusion_method="combsum",
            fusion_norm="minmax",
            output_limit=21,
        )
        # the round-5 expansion winner (config/zero_egress_tuned.yaml):
        # combmnz/minmax over depth-30 lists of expanded-query BM25
        # (corpus-trained distributional expansion) + li 0.5 + chargram
        # 0.5 — both DEV selection rules pick it
        # (eval/tune_word_vectors.py --stage3)
        from dial_rag_tpu.service.config import QueryExpansionConfig

        retrievers["ensemble_expanded"] = EnsembleRetriever(
            [
                Bm25Retriever.from_doc_records(
                    [record],
                    k=30,
                    expansion_config=QueryExpansionConfig(),
                ),
                LateInteractionRetriever.from_doc_records(
                    li_embedder, [record], k=30
                ),
                ChargramRetriever.from_doc_records([record], k=30),
            ],
            weights=[1.0, 0.5, 0.5],
            fusion_method="combmnz",
            fusion_norm="minmax",
            output_limit=21,
        )

    metrics: dict = {
        "corpus": PDF_NAME,
        "n_questions": len(rows),
        "n_chunks": len(chunks),
        # the reference's recorded 177-chunk contract is for the 26-page
        # GOLDEN corpus (tests/test_retrievers.py:63), where this parser
        # matches it exactly; its unstructured pipeline's output on THIS
        # 25-page eval corpus is unrecorded anywhere (the stack is not
        # installable in this image), so no reference count is claimed
        "n_chunks_reference_golden_corpus": 177,
        "chunk_count_note": (
            "reference chunk count on this eval corpus is unrecorded; "
            "the 177 contract applies to the golden corpus, matched "
            "exactly (see docs/chunking_parity.md)"
        ),
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
    per_q: dict[str, dict] = {}
    hits_by_arm: dict[str, list] = {}
    for name, retriever in retrievers.items():
        all_hits = [await retriever.aretrieve(q) for q in questions]
        hits_by_arm[name] = all_hits
        per_q[name] = score_per_question(all_hits, truth, chunks)
        n = max(len(rows), 1)
        metrics[name] = {
            k: sum(v) / n for k, v in per_q[name].items()
        }
        metrics[name]["fact_recall@7"] = fact_recall_at_k(
            all_hits, rows, chunks, k=7
        )
        # 95% bootstrap CIs over questions for the headline rows
        for key in ("recall@7", "mrr"):
            metrics[name][f"{key}_ci95"] = list(
                bootstrap_ci(per_q[name][key])
            )
    if "ensemble" in per_q:
        # paired deltas vs the lexical teacher: the claim "ensemble
        # beats BM25" with its uncertainty at n=len(rows)
        metrics["ensemble_vs_bm25"] = {
            key: paired_delta_ci(
                per_q["ensemble"][key], per_q["bm25"][key]
            )
            for key in ("recall@7", "mrr")
        }
    if "ensemble_combmnz" in per_q:
        metrics["ensemble_combmnz_vs_bm25"] = {
            key: paired_delta_ci(
                per_q["ensemble_combmnz"][key], per_q["bm25"][key]
            )
            for key in ("recall@7", "mrr")
        }
    if "ensemble_chargram" in per_q:
        metrics["ensemble_chargram_vs_bm25"] = {
            key: paired_delta_ci(
                per_q["ensemble_chargram"][key], per_q["bm25"][key]
            )
            for key in ("recall@7", "mrr")
        }
    if "ensemble_expanded" in per_q:
        metrics["ensemble_expanded_vs_bm25"] = {
            key: paired_delta_ci(
                per_q["ensemble_expanded"][key], per_q["bm25"][key]
            )
            for key in ("recall@7", "mrr")
        }

    if answers and "ensemble" in hits_by_arm:
        metrics["answers"] = await eval_answers(
            hits_by_arm["ensemble"], rows, chunks, truth, diagnose=True
        )
        # per-false-positive decomposition goes to its own artifact
        # (eval/out/citation_diagnosis.json); the headline dict keeps
        # the aggregate kinds only
        diag = {
            "false_positive_kinds": metrics["answers"].pop(
                "false_positive_kinds", {}
            ),
            "cases": metrics["answers"].pop("false_positive_cases", []),
            "citation_precision": metrics["answers"][
                "citation_precision"
            ],
            "citation_precision_exact_chunk": metrics["answers"][
                "citation_precision_exact_chunk"
            ],
            "citation_precision_with_neighbors": metrics["answers"][
                "citation_precision_with_neighbors"
            ],
            "citation_precision_by_threshold": metrics["answers"][
                "citation_precision_by_threshold"
            ],
        }
        diag_path = Path("eval/out/citation_diagnosis.json")
        diag_path.parent.mkdir(parents=True, exist_ok=True)
        diag_path.write_text(json.dumps(diag, indent=2))
        metrics["answers"]["false_positive_kinds"] = diag[
            "false_positive_kinds"
        ]
        if "ensemble_chargram" in hits_by_arm:
            # the shipped tuned profile's answer-side numbers (better
            # retrieval -> better citation precision, measured here)
            metrics["answers_chargram_profile"] = await eval_answers(
                hits_by_arm["ensemble_chargram"], rows, chunks, truth
            )
    elif answers:
        metrics["answers"] = await eval_answers(
            hits_by_arm["bm25"], rows, chunks, truth
        )

    hm_rows = load_handmade_questions() if handmade else []
    if hm_rows:
        hm_truth = fact_relevance(chunks, hm_rows)
        hm_metrics: dict = {
            "n_questions": len(hm_rows),
            "unmapped_questions": sum(1 for t in hm_truth if not t),
            "note": "hand-authored paraphrased questions with verbatim "
            "corpus facts (eval/data/alps_handmade_questions.json) — "
            "human-grade ground truth at n>=150 next to the parquet's "
            "39 LLM-generated rows",
        }
        hm_per_q: dict[str, dict] = {}
        for name, retriever in retrievers.items():
            all_hits = [
                await retriever.aretrieve(r["question"]) for r in hm_rows
            ]
            hm_per_q[name] = score_per_question(all_hits, hm_truth, chunks)
            n = max(len(hm_rows), 1)
            hm_metrics[name] = {
                "recall@1": sum(hm_per_q[name]["recall@1"]) / n,
                "recall@7": sum(hm_per_q[name]["recall@7"]) / n,
                "mrr": sum(hm_per_q[name]["mrr"]) / n,
                "recall@7_ci95": list(
                    bootstrap_ci(hm_per_q[name]["recall@7"])
                ),
            }
        if "ensemble" in hm_per_q:
            hm_metrics["ensemble_vs_bm25"] = {
                key: paired_delta_ci(
                    hm_per_q["ensemble"][key], hm_per_q["bm25"][key]
                )
                for key in ("recall@7", "mrr")
            }
        if "ensemble_combmnz" in hm_per_q:
            hm_metrics["ensemble_combmnz_vs_bm25"] = {
                key: paired_delta_ci(
                    hm_per_q["ensemble_combmnz"][key], hm_per_q["bm25"][key]
                )
                for key in ("recall@7", "mrr")
            }
            hm_metrics["ensemble_combmnz_note"] = (
                "profile selected on this set's even-index DEV half "
                "(eval/tune_score_fusion.py): full-set numbers carry "
                "mild selection optimism; the untouched TEST-half "
                "number is recall@7 0.948 = bm25-only"
            )
        if "ensemble_chargram" in hm_per_q:
            hm_metrics["ensemble_chargram_vs_bm25"] = {
                key: paired_delta_ci(
                    hm_per_q["ensemble_chargram"][key], hm_per_q["bm25"][key]
                )
                for key in ("recall@7", "mrr")
            }
            hm_metrics["ensemble_chargram_note"] = (
                "profile selected on this set's even-index DEV half "
                "(eval/tune_chargram.py --full): full-set numbers carry "
                "mild selection optimism; the untouched TEST-half "
                "numbers are recall@7 0.961 / MRR 0.853, both above "
                "bm25-only (0.948 / 0.830)"
            )
        if "ensemble_expanded" in hm_per_q:
            hm_metrics["ensemble_expanded_vs_bm25"] = {
                key: paired_delta_ci(
                    hm_per_q["ensemble_expanded"][key],
                    hm_per_q["bm25"][key],
                )
                for key in ("recall@7", "mrr")
            }
            hm_metrics["ensemble_expanded_note"] = (
                "round-5 profile selected on this set's even-index DEV "
                "half (eval/tune_word_vectors.py --stage3): full-set "
                "numbers carry mild selection optimism; the untouched "
                "TEST-half numbers are recall@7 0.987 / MRR 0.848 vs "
                "bm25-only 0.948 / 0.830"
            )
        metrics["handmade"] = hm_metrics

        # combined: parquet 39 + handmade — the n>=190 statistical claim
        comb_metrics: dict = {"n_questions": len(rows) + len(hm_rows)}
        comb_per_q = {
            name: {
                key: per_q[name][key] + hm_per_q[name][key]
                for key in ("recall@1", "recall@7", "mrr")
            }
            for name in retrievers
        }
        for name, vals in comb_per_q.items():
            n = max(len(rows) + len(hm_rows), 1)
            comb_metrics[name] = {
                key: sum(v) / n for key, v in vals.items()
            }
            comb_metrics[name]["recall@7_ci95"] = list(
                bootstrap_ci(vals["recall@7"])
            )
        if "ensemble" in comb_per_q:
            comb_metrics["ensemble_vs_bm25"] = {
                key: paired_delta_ci(
                    comb_per_q["ensemble"][key], comb_per_q["bm25"][key]
                )
                for key in ("recall@7", "mrr")
            }
        metrics["combined"] = comb_metrics

    if pseudo_queries:
        pseudo_rows = make_pseudo_queries(rows)
        pseudo_truth = fact_relevance(chunks, pseudo_rows)
        pseudo_metrics: dict = {
            "n_questions": len(pseudo_rows),
            "note": "word-dropout variants of the fact sentences — "
            "lexically biased (surviving words are verbatim), measures "
            "arm stability at larger n, not open-domain quality",
        }
        pq = {}
        for name, retriever in retrievers.items():
            all_hits = [
                await retriever.aretrieve(r["question"])
                for r in pseudo_rows
            ]
            pq[name] = score_per_question(all_hits, pseudo_truth, chunks)
            n = max(len(pseudo_rows), 1)
            pseudo_metrics[name] = {
                "recall@7": sum(pq[name]["recall@7"]) / n,
                "mrr": sum(pq[name]["mrr"]) / n,
                "recall@7_ci95": list(bootstrap_ci(pq[name]["recall@7"])),
            }
        if "ensemble" in pq:
            pseudo_metrics["ensemble_vs_bm25"] = {
                key: paired_delta_ci(pq["ensemble"][key], pq["bm25"][key])
                for key in ("recall@7", "mrr")
            }
        metrics["pseudo"] = pseudo_metrics

    if html_corpus:
        html_path = Path(HTML_CORPUS_PATH)
        if html_path.is_file():
            metrics["html_corpus"] = await eval_html_corpus(
                html_path,
                rows + hm_rows,
                embedder=embedder,
                li_embedder=li_embedder,
            )
    return metrics


HTML_CORPUS_PATH = "/root/reference/tests/data/alps_wiki.html"


async def eval_html_corpus(
    html_path: Path, rows: list[dict], embedder, li_embedder
) -> dict:
    """Format-transfer eval: the SAME questions and trained arms over
    the reference's HTML rendition of the article
    (reference tests/data/alps_wiki.html), parsed by the first-party
    HTML pipeline instead of the PDF stack. Same article content, so
    NOT an independent corpus — what it measures is that retrieval
    quality survives the document-format change end to end (parser ->
    chunker -> all arms). Questions whose facts do not re-map onto the
    HTML chunks (>=80% trigram coverage) are DROPPED and counted:
    an unmapped question here is a cross-format labeling gap, not a
    retrieval failure."""
    html_bytes = html_path.read_bytes()
    chunks = parse_document(
        html_bytes,
        "text/html",
        source_link=html_path.name,
        display_name=html_path.name,
    )
    truth_all = fact_relevance(chunks, rows)
    kept = [i for i, t in enumerate(truth_all) if t]
    rows_kept = [rows[i] for i in kept]
    truth = [truth_all[i] for i in kept]

    from dial_rag_tpu.retrieval.chargram_retriever import ChargramRetriever

    record = await build_record(html_bytes, chunks, embedder, li_embedder)
    record.mime_type = "text/html"
    retrievers = {"bm25": Bm25Retriever.from_doc_records([record], k=7)}
    retrievers["chargram"] = ChargramRetriever.from_doc_records([record], k=7)
    retrievers["late_interaction"] = (
        LateInteractionRetriever.from_doc_records(li_embedder, [record], k=7)
    )
    if embedder is not None:
        retrievers["semantic"] = SemanticRetriever.from_doc_records(
            embedder, [record], k=7
        )
        retrievers["ensemble"] = EnsembleRetriever(
            [
                retrievers["semantic"],
                retrievers["bm25"],
                retrievers["late_interaction"],
            ]
        )
        # the round-5 tuned profile on the HTML rendition (format
        # transfer of the expansion winner)
        from dial_rag_tpu.service.config import QueryExpansionConfig

        retrievers["ensemble_expanded"] = EnsembleRetriever(
            [
                Bm25Retriever.from_doc_records(
                    [record],
                    k=30,
                    expansion_config=QueryExpansionConfig(),
                ),
                LateInteractionRetriever.from_doc_records(
                    li_embedder, [record], k=30
                ),
                ChargramRetriever.from_doc_records([record], k=30),
            ],
            weights=[1.0, 0.5, 0.5],
            fusion_method="combmnz",
            fusion_norm="minmax",
            output_limit=21,
        )

    out: dict = {
        "corpus": html_path.name,
        "n_chunks": len(chunks),
        "n_questions": len(rows_kept),
        "dropped_unmapped_questions": len(rows) - len(rows_kept),
        "note": "same article as the PDF corpus rendered as HTML — "
        "measures format-transfer of the full pipeline, not an "
        "independent corpus",
    }
    per_q: dict[str, dict] = {}
    for name, retriever in retrievers.items():
        all_hits = [
            await retriever.aretrieve(r["question"]) for r in rows_kept
        ]
        per_q[name] = score_per_question(all_hits, truth, chunks)
        n = max(len(rows_kept), 1)
        out[name] = {
            "recall@1": sum(per_q[name]["recall@1"]) / n,
            "recall@7": sum(per_q[name]["recall@7"]) / n,
            "mrr": sum(per_q[name]["mrr"]) / n,
            "recall@7_ci95": list(bootstrap_ci(per_q[name]["recall@7"])),
        }
    if "ensemble" in per_q:
        out["ensemble_vs_bm25"] = {
            key: paired_delta_ci(
                per_q["ensemble"][key], per_q["bm25"][key]
            )
            for key in ("recall@7", "mrr")
        }
    return out


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
    parser.add_argument(
        "--answers",
        action="store_true",
        help="answer-side eval: citation precision/recall/faithfulness "
        "over replayed answers through the real citation rewriter",
    )
    parser.add_argument(
        "--no-pseudo",
        action="store_true",
        help="skip the expanded pseudo-query block (3x faster)",
    )
    parser.add_argument(
        "--no-handmade",
        action="store_true",
        help="skip the 155 hand-authored questions and the combined "
        "n>=190 block",
    )
    parser.add_argument(
        "--no-html-corpus",
        action="store_true",
        help="skip the HTML format-transfer block (same questions over "
        "the reference's alps_wiki.html through the HTML parser)",
    )
    args = parser.parse_args(argv)

    if not alps_data_available(args.data_dir):
        raise SystemExit(f"alps data not found under {args.data_dir}")
    metrics = asyncio.run(
        run_eval(
            args.data_dir,
            args.model_dir,
            args.li_model_dir,
            answers=args.answers,
            pseudo_queries=not args.no_pseudo,
            handmade=not args.no_handmade,
            html_corpus=not args.no_html_corpus,
        )
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "alps_metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)
    for name in ("bm25", "late_interaction", "semantic", "ensemble"):
        if name in metrics:
            m = metrics[name]
            lo, hi = m["recall@7_ci95"]
            print(
                f"{name:9s} recall@1={m['recall@1']:.3f} "
                f"recall@7={m['recall@7']:.3f} [{lo:.3f},{hi:.3f}] "
                f"mrr={m['mrr']:.3f} "
                f"fact_recall@7={m['fact_recall@7']:.3f}"
            )
    if "ensemble_vs_bm25" in metrics:
        for key, d in metrics["ensemble_vs_bm25"].items():
            lo, hi = d["ci95"]
            tie = "" if d["excludes_zero"] else " (statistical tie)"
            print(
                f"ensemble-bm25 {key}: {d['mean']:+.3f} "
                f"[{lo:+.3f},{hi:+.3f}]{tie}"
            )
    for block in ("handmade", "combined"):
        if block not in metrics:
            continue
        b = metrics[block]
        line = f"{block} (n={b['n_questions']}):"
        for name in ("bm25", "semantic", "ensemble"):
            if name in b:
                line += f" {name}@7={b[name]['recall@7']:.3f}"
        print(line)
        if "ensemble_vs_bm25" in b:
            for key in ("recall@7", "mrr"):
                d = b["ensemble_vs_bm25"][key]
                lo, hi = d["ci95"]
                tie = "" if d["excludes_zero"] else " (statistical tie)"
                print(
                    f"{block} ensemble-bm25 {key}: {d['mean']:+.3f} "
                    f"[{lo:+.3f},{hi:+.3f}]{tie}"
                )
    if "pseudo" in metrics:
        p = metrics["pseudo"]
        line = f"pseudo (n={p['n_questions']}):"
        for name in ("bm25", "semantic", "ensemble"):
            if name in p:
                line += f" {name}@7={p[name]['recall@7']:.3f}"
        print(line)
        if "ensemble_vs_bm25" in p:
            d = p["ensemble_vs_bm25"]["recall@7"]
            lo, hi = d["ci95"]
            tie = "" if d["excludes_zero"] else " (statistical tie)"
            print(
                f"pseudo ensemble-bm25 recall@7: {d['mean']:+.3f} "
                f"[{lo:+.3f},{hi:+.3f}]{tie}"
            )
    if "answers" in metrics:
        a = metrics["answers"]
        print(
            f"answers: citation_precision={a['citation_precision']:.3f} "
            f"citation_recall={a['citation_recall']:.3f} "
            f"answered={a['answered_rate']:.3f} "
            f"faithfulness={a['faithfulness']:.3f}"
        )
    return metrics


if __name__ == "__main__":
    main()
