"""Corpus-trained distributional word vectors for query expansion —
the last untried zero-egress synonymy lever (round-5 VERDICT #3).

Motivation: morphology is closed (chargram arm), but true synonymy
(precipitation/rainfall, summit/peak) is not — the semantic arm is
BM25-distilled and cannot out-generalize its lexical teacher, and with
zero egress no pretrained embedding is obtainable. Corpus co-occurrence
is the one synonymy signal that needs no download: PPMI over a +/-W
word window with context-distribution smoothing (the count-based
factorization shown equivalent to SGNS by Levy & Goldberg 2014), then a
truncated randomized SVD. Query expansion injects each query word's
nearest corpus terms, mapped to stems with decayed weights, into the
already-shipped weighted-query BM25 path (Bm25Index term->weight
mappings) — so the candidate serving integration is a config away if
the protocol says ship.

Protocol (identical to eval/tune_chargram.py): all selection on the
handmade DEV half only; the TEST half, the 39 real rows, and the pseudo
split never influence selection. Prior related negatives to beat:
RM3 pseudo-relevance feedback (round 3, did not transfer), morph-aug
training (round 4, overtrains).

Run: JAX_PLATFORMS=cpu python -m eval.tune_word_vectors
Writes eval/out/word_vectors.json.
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
)
from eval.tune_chargram import fuse2, metrics_for, topk_hits

from dial_rag_tpu.text.keywords import keywords_preprocess

K = 7
_WORD_RE = re.compile(r"[a-z0-9]+")


def build_word_vectors(
    chunk_texts: list[str],
    window: int = 5,
    dim: int = 128,
    min_count: int = 2,
    cds: float = 0.75,
    shift: float = 1.0,
    seed: int = 0,
):
    """PPMI + truncated randomized SVD word vectors from the corpus.

    - co-occurrence: symmetric +/-``window`` within a chunk
    - PPMI with context-distribution smoothing ``cds`` (0.75 = the
      SGNS-equivalent setting) and shift log(``shift``)
    - embedding = U * sqrt(S) of the rank-``dim`` SVD, L2-normalized

    Returns (vecs [V, dim] unit rows, word->row dict, row->word list).
    """
    toks_per_chunk = [_WORD_RE.findall(t.lower()) for t in chunk_texts]
    counts = Counter(w for toks in toks_per_chunk for w in toks)
    words = sorted(w for w, c in counts.items() if c >= min_count)
    index = {w: i for i, w in enumerate(words)}
    v = len(words)
    if v == 0:
        return np.zeros((0, dim), np.float32), {}, []
    cooc = np.zeros((v, v), dtype=np.float32)
    for toks in toks_per_chunk:
        ids = [index.get(w, -1) for w in toks]
        for i, wi in enumerate(ids):
            if wi < 0:
                continue
            hi = min(len(ids), i + window + 1)
            for j in range(i + 1, hi):
                wj = ids[j]
                if wj >= 0:
                    cooc[wi, wj] += 1.0
                    cooc[wj, wi] += 1.0
    total = cooc.sum()
    if total == 0:
        return np.zeros((v, dim), np.float32), index, words
    pw = cooc.sum(axis=1) / total
    pc = cooc.sum(axis=0) ** cds
    pc /= pc.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(
            (cooc / total)
            / np.outer(np.maximum(pw, 1e-12), np.maximum(pc, 1e-12))
        )
    pmi[~np.isfinite(pmi)] = 0.0
    ppmi = np.maximum(pmi - np.log(shift), 0.0).astype(np.float32)
    # randomized truncated SVD (numpy-only; V is a few thousand)
    rng = np.random.default_rng(seed)
    d = min(dim, v)
    g = rng.standard_normal((v, d + 10)).astype(np.float32)
    y = ppmi @ g
    q, _ = np.linalg.qr(y)
    b = q.T @ ppmi
    ub, s, _ = np.linalg.svd(b, full_matrices=False)
    u = (q @ ub)[:, :d]
    vecs = u * np.sqrt(np.maximum(s[:d], 0.0))[None, :]
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = (vecs / np.maximum(norms, 1e-12)).astype(np.float32)
    return vecs, index, words


def expand_query(
    query: str,
    vecs,
    index,
    words,
    m: int = 5,
    alpha: float = 0.5,
    sim_min: float = 0.35,
    include_original: bool = True,
) -> dict:
    """Stem->weight expansion of a query: original stems at weight 1
    (when ``include_original``) plus each in-vocab query word's top-m
    distributional neighbors at weight alpha * cosine, skipping
    neighbors that stem-collide with the query (morphological variants
    belong to the chargram arm; this one targets synonymy)."""
    weights: Counter = Counter()
    q_stems = keywords_preprocess(query)
    if include_original:
        for s in q_stems:
            weights[s] += 1.0
    q_stem_set = set(q_stems)
    for w in dict.fromkeys(_WORD_RE.findall(query.lower())):
        i = index.get(w)
        if i is None:
            continue
        sims = vecs @ vecs[i]
        order = np.argsort(-sims)
        taken = 0
        for j in order:
            if taken >= m:
                break
            if j == i or sims[j] < sim_min:
                break
            cand_stems = keywords_preprocess(words[j])
            fresh = [s for s in cand_stems if s not in q_stem_set]
            if not fresh:
                continue  # stopword or morphological variant of query
            for s in fresh:
                weights[s] += alpha * float(sims[j])
            taken += 1
    return dict(weights)


async def run(data_dir):
    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.retrieval.bm25_retriever import Bm25Retriever

    pdf_bytes, rows = load_alps(data_dir)
    chunks = parse_alps(pdf_bytes)
    chunk_texts = [c.text for c in chunks]

    text_index = await Bm25Retriever.build_index(chunks)
    bm25_index = Bm25Index.build(text_index, device=False)

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
        s: np.stack(
            [bm25_index.get_scores(keywords_preprocess(q)) for q in qs]
        )
        for s, (qs, _) in splits.items()
    }

    dev_qs = [splits["handmade"][0][i] for i in dev_idx]
    dev_truth = [hm_truth[i] for i in dev_idx]
    bm_dev = bm25_mats["handmade"][dev_idx]

    bm25_dev = metrics_for(
        lambda j: topk_hits(bm_dev[j]), range(len(dev_idx)), dev_truth,
        chunks,
    )
    out = {"bm25_only_dev": bm25_dev, "stage1": {}}

    # --- stage 1: vector-shape x expansion grid, DEV-only selection ---
    best = None
    for window, dim, shift in itertools.product(
        (2, 5, 8), (64, 128), (1.0, 5.0)
    ):
        vecs, index, words = build_word_vectors(
            chunk_texts, window=window, dim=dim, shift=shift
        )
        for m, alpha, sim_min in itertools.product(
            (3, 5, 10), (0.25, 0.5, 1.0), (0.25, 0.4)
        ):
            # (a) expansion-integrated query: original stems + decayed
            # expansion terms through the weighted BM25 path
            qe_dev = np.stack(
                [
                    bm25_index.get_scores(
                        expand_query(
                            q, vecs, index, words, m, alpha, sim_min
                        )
                    )
                    for q in dev_qs
                ]
            )
            integrated = metrics_for(
                lambda j: topk_hits(qe_dev[j]),
                range(len(dev_idx)),
                dev_truth,
                chunks,
            )
            key = (integrated["recall@7"], integrated["mrr"])
            cfg = (window, dim, shift, m, alpha, sim_min, "integrated")
            if best is None or key > best[0]:
                best = (key, cfg, (vecs, index, words))
            # (b) expansion-only scores fused with plain BM25 (5th-arm
            # shape): protects exact-match ranking from dilution
            eo_dev = np.stack(
                [
                    bm25_index.get_scores(
                        expand_query(
                            q, vecs, index, words, m, alpha, sim_min,
                            include_original=False,
                        )
                    )
                    for q in dev_qs
                ]
            )
            for w_e, depth in itertools.product((0.25, 0.5), (15, 30)):
                fused = metrics_for(
                    lambda j: fuse2(
                        bm_dev[j], eo_dev[j], w_e, "combsum", "minmax",
                        depth,
                    ),
                    range(len(dev_idx)),
                    dev_truth,
                    chunks,
                )
                key = (fused["recall@7"], fused["mrr"])
                cfg = (
                    window, dim, shift, m, alpha, sim_min,
                    f"fused_w{w_e}_d{depth}",
                )
                if key > best[0]:
                    best = (key, cfg, (vecs, index, words))

    (dev_r7, dev_mrr), cfg, (vecs, index, words) = best
    window, dim, shift, m, alpha, sim_min, mode = cfg
    out["stage1_winner"] = {
        "window": window,
        "dim": dim,
        "shift": shift,
        "m": m,
        "alpha": alpha,
        "sim_min": sim_min,
        "mode": mode,
        "dev_recall@7": dev_r7,
        "dev_mrr": dev_mrr,
    }
    out["selection_note"] = (
        "DEV = even handmade rows only; TEST/real/pseudo untouched by "
        "selection (same protocol as tune_chargram)"
    )

    # --- report the DEV winner on the untouched splits ---
    def scores_for(split_qs, integrated):
        return np.stack(
            [
                bm25_index.get_scores(
                    expand_query(
                        q, vecs, index, words, m, alpha, sim_min,
                        include_original=integrated,
                    )
                )
                for q in split_qs
            ]
        )

    integrated = mode == "integrated"
    if not integrated:
        w_e = float(mode.split("_w")[1].split("_")[0])
        depth = int(mode.split("_d")[1])

    def split_report(split, idx, truth):
        qs = splits[split][0]
        rows_idx = idx if idx is not None else list(range(len(qs)))
        bm = bm25_mats[split]
        qe = scores_for(qs, integrated)
        if integrated:
            hits_fn = lambda i: topk_hits(qe[i])  # noqa: E731
        else:
            hits_fn = lambda i: fuse2(  # noqa: E731
                bm[i], qe[i], w_e, "combsum", "minmax", depth
            )
        return {
            "expanded": metrics_for(hits_fn, rows_idx, truth, chunks),
            "bm25_only": metrics_for(
                lambda i: topk_hits(bm[i]), rows_idx, truth, chunks
            ),
        }

    out["handmade_test"] = split_report("handmade", test_idx, hm_truth)
    out["real_39"] = split_report("real", None, real_truth)
    out["pseudo"] = split_report("pseudo", None, pseudo_truth)
    return out


def main(argv=None):
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", default=str(DEFAULT_DATA_DIR))
    args = parser.parse_args(argv)
    if not alps_data_available(Path(args.data_dir)):
        print("alps corpus not available; aborting")
        return None
    out = asyncio.run(run(Path(args.data_dir)))
    out_path = Path("eval/out/word_vectors.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=2))
    w = out["stage1_winner"]
    print(
        f"DEV winner: {w} | bm25-only DEV "
        f"r@7={out['bm25_only_dev']['recall@7']:.3f} "
        f"mrr={out['bm25_only_dev']['mrr']:.3f}"
    )
    for split in ("handmade_test", "real_39", "pseudo"):
        r = out[split]
        print(
            f"{split}: expanded r@7={r['expanded']['recall@7']:.3f} "
            f"mrr={r['expanded']['mrr']:.3f} | bm25 "
            f"r@7={r['bm25_only']['recall@7']:.3f} "
            f"mrr={r['bm25_only']['mrr']:.3f}"
        )
    return out


if __name__ == "__main__":
    main()
