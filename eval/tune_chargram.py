"""Char-n-gram fuzzy-lexical arm experiment (zero-egress quality lever).

Motivation: the one remaining quality deficit (BASELINE.md "Held-out
paraphrase test") is MRR on paraphrase phrasing, where BM25's Porter2
stemmer drops derivational variants (glacier/glaciation, mountain/
mountainous) that the BM25-distilled neural arms — students of the same
stemmer — cannot recover either. A character-n-gram TF-IDF arm is a
fundamentally different lexical generalizer: word-boundary-marked char
3..5-grams shared across morphological variants give soft matches with
NO training and no external knowledge, so it is the one fuzzy-matching
family not yet probed by the round-3/4 experiments (morph-aug training:
negative; RM3 expansion: negative).

Protocol (identical to eval/tune_score_fusion.py — selection on the
handmade DEV half only; TEST / 39-row / pseudo splits never influence
selection). Stage 1 asks the cheap question first: does bm25+chargram
2-arm fusion beat bm25-only on DEV at all? If yes, stage 2 runs the
full 4-arm grid with the trained arms.

Run: JAX_PLATFORMS=cpu python -m eval.tune_chargram \
       [--model-dir checkpoints/alps-semantic \
        --li-model-dir checkpoints/alps-maxsim]
Writes eval/out/chargram.json.
"""

import argparse
import asyncio
import itertools
import json
import re
from collections import Counter
from pathlib import Path

import numpy as np

from eval._platform import honor_jax_platforms_env
from eval.eval_alps import (
    DEFAULT_DATA_DIR,
    alps_data_available,
    fact_relevance,
    load_alps,
    load_handmade_questions,
    make_pseudo_queries,
    parse_alps,
    score_per_question,
)
from eval.tune_score_fusion import fuse_scores as _fuse_scores_3arm
from eval.tune_score_fusion import normalize

from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.text.keywords import keywords_preprocess

K = 7
_WORD_RE = re.compile(r"[a-z0-9]+")


def char_ngrams(text: str, n_lo: int = 3, n_hi: int = 5) -> Counter:
    """Word-boundary-marked char n-grams (fastText-style `<word>`),
    plus the whole marked word itself so exact matches keep full
    weight."""
    grams: Counter = Counter()
    for w in _WORD_RE.findall(text.lower()):
        marked = f"<{w}>"
        grams[marked] += 1
        for n in range(n_lo, n_hi + 1):
            if len(marked) <= n:
                continue
            for i in range(len(marked) - n + 1):
                grams[marked[i : i + n]] += 1
    return grams


class ChargramScorer:
    """TF-IDF cosine over char n-grams: corpus-only, no training."""

    def __init__(self, chunk_texts, n_lo=3, n_hi=5, sublinear_tf=True):
        self.n_lo, self.n_hi = n_lo, n_hi
        self.sublinear_tf = sublinear_tf
        counts = [char_ngrams(t, n_lo, n_hi) for t in chunk_texts]
        df: Counter = Counter()
        for c in counts:
            df.update(c.keys())
        self.vocab = {g: i for i, g in enumerate(sorted(df))}
        n_docs = len(chunk_texts)
        self.idf = np.zeros(len(self.vocab), dtype=np.float64)
        for g, i in self.vocab.items():
            self.idf[i] = np.log((n_docs + 1) / (df[g] + 1)) + 1.0
        self.matrix = np.stack([self._vec(c) for c in counts])

    def _vec(self, grams: Counter) -> np.ndarray:
        v = np.zeros(len(self.vocab), dtype=np.float64)
        for g, tf in grams.items():
            i = self.vocab.get(g)
            if i is None:
                continue
            w = (1.0 + np.log(tf)) if self.sublinear_tf else float(tf)
            v[i] = w * self.idf[i]
        norm = np.linalg.norm(v)
        return v / norm if norm > 0 else v

    def score(self, query: str) -> np.ndarray:
        return self.matrix @ self._vec(char_ngrams(query, self.n_lo, self.n_hi))


def fuse2(bm25_raw, cg_raw, w_cg, method, norm, depth):
    """One query: bm25 (weight 1) + chargram (weight w_cg) score fusion,
    deployable top-``depth`` list-normalized form."""
    n = bm25_raw.shape[0]
    fused = np.zeros(n, dtype=np.float64)
    support = np.zeros(n, dtype=np.float64)
    for raw, w in ((bm25_raw, 1.0), (cg_raw, w_cg)):
        if w == 0.0:
            continue
        top = np.argsort(-raw, kind="stable")[:depth]
        s = np.zeros(n, dtype=np.float64)
        s[top] = normalize(raw[top], norm)
        fused += w * s
        support[np.argsort(-raw, kind="stable")[:K]] += 1.0
    if method == "combmnz":
        fused *= np.maximum(support, 1.0)
    order = np.argsort(-fused, kind="stable")[:K]
    return [
        SearchHit(doc_id=0, chunk_id=int(c), retrieval_type=RetrievalType.TEXT)
        for c in order
    ]


def metrics_for(hits_fn, rows_idx, truth, chunks):
    all_hits = [hits_fn(i) for i in rows_idx]
    sub_truth = [truth[i] for i in rows_idx]
    per_q = score_per_question(all_hits, sub_truth, chunks)
    m = max(len(sub_truth), 1)
    return {k: sum(v) / m for k, v in per_q.items()}


def topk_hits(raw):
    order = np.argsort(-raw, kind="stable")[:K]
    return [
        SearchHit(doc_id=0, chunk_id=int(c), retrieval_type=RetrievalType.TEXT)
        for c in order
    ]


def fuse_n(arm_raws, weights, method, norm, depth):
    """One query: n-arm deployable score fusion (top-``depth`` list
    norm, absent docs 0) — same rule as tune_score_fusion.fuse_scores
    but over an arbitrary arm dict."""
    n = next(iter(arm_raws.values())).shape[0]
    fused = np.zeros(n, dtype=np.float64)
    support = np.zeros(n, dtype=np.float64)
    for arm, raw in arm_raws.items():
        w = weights[arm]
        if w == 0.0:
            continue
        top = np.argsort(-raw, kind="stable")[:depth]
        s = np.zeros(n, dtype=np.float64)
        s[top] = normalize(raw[top], norm)
        fused += w * s
        support[np.argsort(-raw, kind="stable")[:K]] += 1.0
    if method == "combmnz":
        fused *= np.maximum(support, 1.0)
    order = np.argsort(-fused, kind="stable")[:K]
    return [
        SearchHit(doc_id=0, chunk_id=int(c), retrieval_type=RetrievalType.TEXT)
        for c in order
    ]


async def run_full(data_dir, model_dir, li_model_dir, n_lo=2, n_hi=4):
    """Stage 2: 4-arm grid (bm25 fixed 1.0; semantic / late_interaction /
    chargram weights swept) under the same DEV-only selection."""
    from eval.eval_alps import build_record
    from eval.tune_score_fusion import ARMS as TRAINED_ARMS
    from eval.tune_score_fusion import arm_score_matrix

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.index.bm25 import Bm25Index

    pdf_bytes, rows = load_alps(data_dir)
    chunks = parse_alps(pdf_bytes)
    chunk_texts = [c.text for c in chunks]
    embedder = BgeEmbedder.from_hf_checkpoint(model_dir)
    li_embedder = BgeEmbedder.from_hf_checkpoint(li_model_dir)
    record = await build_record(pdf_bytes, chunks, embedder, li_embedder)

    bm25_index = Bm25Index.build(record.text_index)
    emb_matrix = np.concatenate(record.embeddings_index, axis=0)
    li_token_lists = [
        np.asarray(t, dtype=np.float32) for t in record.late_interaction_index
    ]
    scorer = ChargramScorer(chunk_texts, n_lo, n_hi)

    hm_rows = load_handmade_questions()
    hm_truth = fact_relevance(chunks, hm_rows)
    dev_idx = list(range(0, len(hm_rows), 2))
    test_idx = list(range(1, len(hm_rows), 2))
    real_truth = fact_relevance(chunks, rows)
    pseudo_rows = make_pseudo_queries(rows)
    pseudo_truth = fact_relevance(chunks, pseudo_rows)

    kw = dict(
        bm25_index=bm25_index,
        embedder=embedder,
        li_embedder=li_embedder,
        emb_matrix=emb_matrix,
        li_token_lists=li_token_lists,
    )
    splits = {
        "handmade": ([r["question"] for r in hm_rows], hm_truth),
        "real": ([r["question"] for r in rows], real_truth),
        "pseudo": ([r["question"] for r in pseudo_rows], pseudo_truth),
    }
    mats = {}
    for split, (qs, _) in splits.items():
        mats[split] = {
            a: arm_score_matrix(a, qs, **kw) for a in TRAINED_ARMS
        }
        mats[split]["chargram"] = np.stack([scorer.score(q) for q in qs])

    def grid_metrics(split, weights, method, norm, depth, idx):
        m = mats[split]
        truth = splits[split][1]
        rows_idx = idx if idx is not None else list(range(len(truth)))
        all_hits = [
            fuse_n(
                {a: m[a][i] for a in m}, weights, method, norm, depth
            )
            for i in rows_idx
        ]
        sub_truth = [truth[i] for i in rows_idx]
        per_q = score_per_question(all_hits, sub_truth, chunks)
        nq = max(len(sub_truth), 1)
        return {k: sum(v) / nq for k, v in per_q.items()}

    best = None
    for method, norm, depth, ws, wl, wc in itertools.product(
        ("combsum", "combmnz"),
        ("minmax", "zscore"),
        (15, 30),
        (0.0, 0.25, 0.5),
        (0.0, 0.25, 0.5, 1.0),
        (0.25, 0.5, 0.75, 1.0),
    ):
        w = {
            "semantic": ws,
            "bm25": 1.0,
            "late_interaction": wl,
            "chargram": wc,
        }
        dev = grid_metrics("handmade", w, method, norm, depth, dev_idx)
        key = (dev["recall@7"], dev["mrr"])
        if best is None or key > best[0]:
            best = (key, (method, norm, depth, dict(w)))
    (dev_r7, dev_mrr), (method, norm, depth, w) = best

    def report(weights, method, norm, depth):
        return {
            "method": method,
            "norm": norm,
            "depth": depth,
            "weights": weights,
            "handmade_dev": grid_metrics(
                "handmade", weights, method, norm, depth, dev_idx
            ),
            "handmade_test": grid_metrics(
                "handmade", weights, method, norm, depth, test_idx
            ),
            "real_39": grid_metrics(
                "real", weights, method, norm, depth, None
            ),
            "pseudo": grid_metrics(
                "pseudo", weights, method, norm, depth, None
            ),
        }

    out = {
        "protocol": (
            "4-arm deployable fusion grid (bm25 fixed 1.0; semantic/li/"
            "chargram swept; chargram shape fixed at the stage-1 DEV "
            f"winner {n_lo}..{n_hi}); selected on handmade DEV recall@7 "
            "then MRR; TEST/39-row/pseudo untouched by selection"
        ),
        "winner": report(w, method, norm, depth),
        # prior shipped profile for side-by-side comparison
        "prior_combmnz_no_chargram": report(
            {
                "semantic": 0.0,
                "bm25": 1.0,
                "late_interaction": 0.5,
                "chargram": 0.0,
            },
            "combmnz",
            "minmax",
            30,
        ),
        # bm25 + chargram only (the stage-1 2-arm winner re-scored in
        # this harness for consistency)
        "bm25_chargram_only": report(
            {
                "semantic": 0.0,
                "bm25": 1.0,
                "late_interaction": 0.0,
                "chargram": 1.0,
            },
            "combmnz",
            "minmax",
            30,
        ),
    }
    return out


async def run(data_dir, model_dir=None, li_model_dir=None):
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.retrieval.bm25_retriever import Bm25Retriever

    pdf_bytes, rows = load_alps(data_dir)
    chunks = parse_alps(pdf_bytes)
    chunk_texts = [c.text for c in chunks]

    text_index = await Bm25Retriever.build_index(chunks)
    bm25_index = Bm25Index.build(text_index)

    hm_rows = load_handmade_questions()
    hm_truth = fact_relevance(chunks, hm_rows)
    dev_idx = list(range(0, len(hm_rows), 2))
    test_idx = list(range(1, len(hm_rows), 2))
    real_truth = fact_relevance(chunks, rows)
    pseudo_rows = make_pseudo_queries(rows)
    pseudo_truth = fact_relevance(chunks, pseudo_rows)

    splits = {
        "handmade": ([r["question"] for r in hm_rows], hm_truth),
        "real": ([r["question"] for r in rows], real_truth),
        "pseudo": ([r["question"] for r in pseudo_rows], pseudo_truth),
    }
    bm25_mats = {
        s: np.stack([bm25_index.get_scores(keywords_preprocess(q)) for q in qs])
        for s, (qs, _) in splits.items()
    }

    out = {"stage1": {}}

    # --- stage 1: chargram shape grid + 2-arm fusion, selected on DEV ---
    best = None
    for n_lo, n_hi in ((3, 5), (3, 4), (4, 5), (2, 4)):
        scorer = ChargramScorer(chunk_texts, n_lo, n_hi)
        cg_dev = np.stack(
            [scorer.score(splits["handmade"][0][i]) for i in dev_idx]
        )
        bm_dev = bm25_mats["handmade"][dev_idx]
        # chargram alone
        alone = metrics_for(
            lambda j: topk_hits(cg_dev[j]),
            range(len(dev_idx)),
            [hm_truth[i] for i in dev_idx],
            chunks,
        )
        out["stage1"][f"chargram_only_{n_lo}_{n_hi}_dev"] = alone
        for method, norm, w_cg, depth in itertools.product(
            ("combsum", "combmnz"),
            ("minmax", "zscore"),
            (0.125, 0.25, 0.5, 0.75, 1.0),
            (7, 15, 30),
        ):
            dev = metrics_for(
                lambda j: fuse2(bm_dev[j], cg_dev[j], w_cg, method, norm, depth),
                range(len(dev_idx)),
                [hm_truth[i] for i in dev_idx],
                chunks,
            )
            key = (dev["recall@7"], dev["mrr"])
            if best is None or key > best[0]:
                best = (key, (n_lo, n_hi, method, norm, w_cg, depth), scorer)

    bm25_dev = metrics_for(
        lambda j: topk_hits(bm25_mats["handmade"][dev_idx][j]),
        range(len(dev_idx)),
        [hm_truth[i] for i in dev_idx],
        chunks,
    )
    out["bm25_only_dev"] = bm25_dev
    (dev_r7, dev_mrr), cfg, scorer = best
    n_lo, n_hi, method, norm, w_cg, depth = cfg
    out["stage1_winner"] = {
        "ngrams": [n_lo, n_hi],
        "method": method,
        "norm": norm,
        "w_chargram": w_cg,
        "depth": depth,
        "dev_recall@7": dev_r7,
        "dev_mrr": dev_mrr,
    }

    # report the DEV winner on the untouched splits
    cg_mats = {
        s: np.stack([scorer.score(q) for q in qs])
        for s, (qs, _) in splits.items()
    }

    def split_report(split, idx, truth):
        bm = bm25_mats[split]
        cg = cg_mats[split]
        rows_idx = idx if idx is not None else list(range(bm.shape[0]))
        return {
            "fused": metrics_for(
                lambda i: fuse2(bm[i], cg[i], w_cg, method, norm, depth),
                rows_idx,
                truth,
                chunks,
            ),
            "bm25_only": metrics_for(
                lambda i: topk_hits(bm[i]), rows_idx, truth, chunks
            ),
            "chargram_only": metrics_for(
                lambda i: topk_hits(cg[i]), rows_idx, truth, chunks
            ),
        }

    out["handmade_test"] = split_report("handmade", test_idx, hm_truth)
    out["real_39"] = split_report("real", None, real_truth)
    out["pseudo"] = split_report("pseudo", None, pseudo_truth)
    return out


def main(argv=None):
    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=DEFAULT_DATA_DIR)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--li-model-dir", default=None)
    p.add_argument("--out", default=str(Path(__file__).parent / "out"))
    p.add_argument(
        "--full",
        action="store_true",
        help="stage 2: 4-arm grid incl. the trained arms "
        "(requires --model-dir/--li-model-dir)",
    )
    args = p.parse_args(argv)
    if not alps_data_available(args.data_dir):
        raise SystemExit(f"alps data not found under {args.data_dir}")
    if args.full:
        out = asyncio.run(
            run_full(args.data_dir, args.model_dir, args.li_model_dir)
        )
        Path(args.out).mkdir(parents=True, exist_ok=True)
        with open(Path(args.out) / "chargram_full.json", "w") as f:
            json.dump(out, f, indent=2)
        for name in (
            "winner",
            "prior_combmnz_no_chargram",
            "bm25_chargram_only",
        ):
            r = out[name]
            print(
                f"{name:28s} {r['method']}/{r['norm']}/d={r['depth']} "
                f"w={r['weights']}  "
                f"dev@7={r['handmade_dev']['recall@7']:.3f} "
                f"TEST@7={r['handmade_test']['recall@7']:.3f} "
                f"test_mrr={r['handmade_test']['mrr']:.3f} "
                f"real39@7={r['real_39']['recall@7']:.3f} "
                f"real39_mrr={r['real_39']['mrr']:.3f} "
                f"pseudo@7={r['pseudo']['recall@7']:.3f}"
            )
        return out
    out = asyncio.run(run(args.data_dir, args.model_dir, args.li_model_dir))
    Path(args.out).mkdir(parents=True, exist_ok=True)
    with open(Path(args.out) / "chargram.json", "w") as f:
        json.dump(out, f, indent=2)
    w = out["stage1_winner"]
    print(
        f"winner: ngrams={w['ngrams']} {w['method']}/{w['norm']}"
        f"/d={w['depth']} w_cg={w['w_chargram']}  "
        f"dev@7={w['dev_recall@7']:.3f} dev_mrr={w['dev_mrr']:.3f}"
    )
    for split in ("handmade_test", "real_39", "pseudo"):
        r = out[split]
        print(
            f"{split:14s} fused@7={r['fused']['recall@7']:.3f} "
            f"mrr={r['fused']['mrr']:.3f} | "
            f"bm25@7={r['bm25_only']['recall@7']:.3f} "
            f"mrr={r['bm25_only']['mrr']:.3f} | "
            f"cg@7={r['chargram_only']['recall@7']:.3f} "
            f"mrr={r['chargram_only']['mrr']:.3f}"
        )
    return out


if __name__ == "__main__":
    main()
