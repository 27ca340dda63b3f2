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
    score_per_question,
)
from eval.tune_chargram import fuse2, metrics_for, topk_hits

from dial_rag_tpu.text.keywords import keywords_preprocess

K = 7
_WORD_RE = re.compile(r"[a-z0-9]+")


def build_word_vectors(
    chunk_texts, window=5, dim=128, min_count=2, cds=0.75, shift=1.0,
    seed=0,
):
    """Experiment-facing wrapper over the shipped implementation
    (dial_rag_tpu/text/word_vectors.py) returning the historical
    (vecs, index, words) tuple."""
    from dial_rag_tpu.text.word_vectors import (
        build_word_vectors as _build,
    )

    wv = _build(
        chunk_texts,
        window=window,
        dim=dim,
        min_count=min_count,
        cds=cds,
        shift=shift,
        seed=seed,
    )
    return wv.vecs, wv.index, wv.words


def expand_query(
    query, vecs, index, words, m=5, alpha=0.5, sim_min=0.35,
    include_original=True,
):
    from dial_rag_tpu.text.word_vectors import WordVectors
    from dial_rag_tpu.text.word_vectors import expand_query as _expand

    return _expand(
        query,
        WordVectors(vecs, index, words),
        m=m,
        alpha=alpha,
        sim_min=sim_min,
        include_original=include_original,
    )


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




async def run_stage2(data_dir, winner: dict):
    """Stage 2: does the expansion signal ADD to the shipped fusion
    stack (bm25 + chargram)? Two integration shapes — expansion-only as
    an extra fused arm, and expanded-query BM25 replacing the bm25
    arm — under the same DEV-only protocol, with BOTH selection rules
    round 4 compared (recall-first, and MRR-guarded: within one DEV
    question of the best recall@7, maximize DEV MRR). The stage-1
    winner showed +recall@7 at -MRR; the fusion stack is the natural
    place to buy the recall without the ranking dilution."""
    import itertools

    from eval.tune_chargram import ChargramScorer, fuse_n

    from dial_rag_tpu.index.bm25 import Bm25Index
    from dial_rag_tpu.retrieval.bm25_retriever import Bm25Retriever

    pdf_bytes, rows = load_alps(data_dir)
    chunks = parse_alps(pdf_bytes)
    chunk_texts = [c.text for c in chunks]
    text_index = await Bm25Retriever.build_index(chunks)
    bm25_index = Bm25Index.build(text_index, device=False)
    # the shipped tuned profile's chargram shape (2..4 grams)
    cg = ChargramScorer(chunk_texts, 2, 4)

    vecs, index, words = build_word_vectors(
        chunk_texts,
        window=winner["window"],
        dim=winner["dim"],
        shift=winner["shift"],
    )
    m, alpha, sim_min = winner["m"], winner["alpha"], winner["sim_min"]

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

    def arm_mats(qs):
        return {
            "bm25": np.stack(
                [
                    bm25_index.get_scores(keywords_preprocess(q))
                    for q in qs
                ]
            ),
            "cg": np.stack([cg.score(q) for q in qs]),
            "qe_only": np.stack(
                [
                    bm25_index.get_scores(
                        expand_query(
                            q, vecs, index, words, m, alpha, sim_min,
                            include_original=False,
                        )
                    )
                    for q in qs
                ]
            ),
            "qe_int": np.stack(
                [
                    bm25_index.get_scores(
                        expand_query(
                            q, vecs, index, words, m, alpha, sim_min
                        )
                    )
                    for q in qs
                ]
            ),
        }

    mats = {s: arm_mats(qs) for s, (qs, _) in splits.items()}
    dev_truth = [hm_truth[i] for i in dev_idx]
    dev_mats = {
        a: mat[dev_idx] for a, mat in mats["handmade"].items()
    }

    def dev_metrics(weights, method, norm, depth):
        return metrics_for(
            lambda j: fuse_n(
                {a: dev_mats[a][j] for a in weights},
                weights,
                method,
                norm,
                depth,
            ),
            range(len(dev_idx)),
            dev_truth,
            chunks,
        )

    candidates = []
    for method, norm, depth in itertools.product(
        ("combsum", "combmnz"), ("minmax",), (15, 30)
    ):
        # baseline family: bm25 + chargram (no expansion)
        for w_cg in (0.5, 1.0):
            weights = {"bm25": 1.0, "cg": w_cg}
            candidates.append(
                ((method, norm, depth, tuple(weights.items())), weights)
            )
        # expansion as an extra arm
        for w_cg, w_e in itertools.product(
            (0.5, 1.0), (0.25, 0.5, 1.0)
        ):
            weights = {"bm25": 1.0, "cg": w_cg, "qe_only": w_e}
            candidates.append(
                ((method, norm, depth, tuple(weights.items())), weights)
            )
        # expanded-query bm25 replacing the bm25 arm
        for w_cg in (0.5, 1.0):
            weights = {"qe_int": 1.0, "cg": w_cg}
            candidates.append(
                ((method, norm, depth, tuple(weights.items())), weights)
            )

    scored = []
    for (method, norm, depth, _), weights in candidates:
        dm = dev_metrics(weights, method, norm, depth)
        scored.append(
            (dm["recall@7"], dm["mrr"], (method, norm, depth), weights)
        )
    best_r7 = max(s[0] for s in scored)
    guard = best_r7 - 1.0 / max(len(dev_idx), 1)
    recall_first = max(scored, key=lambda s: (s[0], s[1]))
    mrr_guarded = max(
        (s for s in scored if s[0] >= guard), key=lambda s: (s[1], s[0])
    )

    def split_report(sel):
        r7, mrr, (method, norm, depth), weights = sel
        out = {
            "dev_recall@7": r7,
            "dev_mrr": mrr,
            "method": method,
            "norm": norm,
            "depth": depth,
            "weights": dict(weights),
        }
        for split, idx in (
            ("handmade_test", test_idx),
            ("real_39", None),
            ("pseudo", None),
        ):
            sp = split.replace("handmade_test", "handmade").replace(
                "real_39", "real"
            )
            truth = splits[sp][1]
            rows_idx = (
                idx if idx is not None else list(range(len(splits[sp][0])))
            )
            out[split] = metrics_for(
                lambda i: fuse_n(
                    {a: mats[sp][a][i] for a in weights},
                    weights,
                    method,
                    norm,
                    depth,
                ),
                rows_idx,
                truth,
                chunks,
            )
        return out

    return {
        "stage1_winner_used": winner,
        "selection_note": (
            "DEV = even handmade rows only; candidates include the "
            "bm25+chargram family WITHOUT expansion, so the selection "
            "itself tells whether expansion earns a slot"
        ),
        "recall_first": split_report(recall_first),
        "mrr_guarded": split_report(mrr_guarded),
    }


def main_stage2(argv=None):
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=str(DEFAULT_DATA_DIR))
    args = parser.parse_args(argv)
    winner = json.loads(Path("eval/out/word_vectors.json").read_text())[
        "stage1_winner"
    ]
    out = asyncio.run(run_stage2(Path(args.data_dir), winner))
    Path("eval/out/word_vectors_stage2.json").write_text(
        json.dumps(out, indent=2)
    )
    for rule in ("recall_first", "mrr_guarded"):
        r = out[rule]
        print(
            f"{rule}: weights={r['weights']} {r['method']}/{r['norm']}"
            f"/d{r['depth']} DEV {r['dev_recall@7']:.3f}/{r['dev_mrr']:.3f}"
        )
        for split in ("handmade_test", "real_39", "pseudo"):
            print(
                f"  {split}: r@7={r[split]['recall@7']:.3f} "
                f"mrr={r[split]['mrr']:.3f}"
            )
    return out




async def run_stage3(data_dir, model_dir, li_model_dir, winner: dict):
    """Stage 3: the FULL deployable stack — do the trained arms
    (semantic / late-interaction) plus expansion beat the shipped
    ensemble_chargram profile? Candidates include plain-bm25 bases, the
    shipped profile itself, and qe_int-based stacks, so selection picks
    expansion only if it earns the slot against everything we ship."""
    import itertools

    from eval.eval_alps import build_record
    from eval.tune_chargram import ChargramScorer, fuse_n
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
        np.asarray(t, dtype=np.float32)
        for t in record.late_interaction_index
    ]
    cg = ChargramScorer(chunk_texts, 2, 4)
    vecs, index, words = build_word_vectors(
        chunk_texts,
        window=winner["window"],
        dim=winner["dim"],
        shift=winner["shift"],
    )
    m, alpha, sim_min = winner["m"], winner["alpha"], winner["sim_min"]

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
    kw = dict(
        bm25_index=bm25_index,
        embedder=embedder,
        li_embedder=li_embedder,
        emb_matrix=emb_matrix,
        li_token_lists=li_token_lists,
    )
    mats = {}
    for split, (qs, _) in splits.items():
        mats[split] = {
            a: arm_score_matrix(a, qs, **kw) for a in TRAINED_ARMS
        }
        mats[split]["chargram"] = np.stack([cg.score(q) for q in qs])
        mats[split]["qe_int"] = np.stack(
            [
                bm25_index.get_scores(
                    expand_query(q, vecs, index, words, m, alpha, sim_min)
                )
                for q in qs
            ]
        )

    def grid_metrics(split, weights, method, norm, depth, idx):
        mm = mats[split]
        truth = splits[split][1]
        rows_idx = idx if idx is not None else list(range(len(truth)))
        all_hits = [
            fuse_n(
                {a: mm[a][i] for a in weights}, weights, method, norm,
                depth,
            )
            for i in rows_idx
        ]
        sub = [truth[i] for i in rows_idx]
        per_q = score_per_question(all_hits, sub, chunks)
        nq = max(len(sub), 1)
        return {k: sum(v) / nq for k, v in per_q.items()}

    candidates = []
    for method, depth in itertools.product(("combsum", "combmnz"), (15, 30)):
        for base in ("bm25", "qe_int"):
            for ws, wl, wc in itertools.product(
                (0.0, 0.25), (0.0, 0.5, 1.0), (0.5, 1.0)
            ):
                w = {
                    base: 1.0,
                    "semantic": ws,
                    "late_interaction": wl,
                    "chargram": wc,
                }
                candidates.append((method, "minmax", depth, w))

    scored = []
    for method, norm, depth, w in candidates:
        dm = grid_metrics("handmade", w, method, norm, depth, dev_idx)
        scored.append((dm["recall@7"], dm["mrr"], (method, norm, depth), w))
    best_r7 = max(s[0] for s in scored)
    guard = best_r7 - 1.0 / max(len(dev_idx), 1)
    recall_first = max(scored, key=lambda s: (s[0], s[1]))
    mrr_guarded = max(
        (s for s in scored if s[0] >= guard), key=lambda s: (s[1], s[0])
    )

    def report(sel):
        r7, mrr, (method, norm, depth), w = sel
        return {
            "weights": w,
            "method": method,
            "norm": norm,
            "depth": depth,
            "dev_recall@7": r7,
            "dev_mrr": mrr,
            "handmade_test": grid_metrics(
                "handmade", w, method, norm, depth, test_idx
            ),
            "real_39": grid_metrics("real", w, method, norm, depth, None),
            "pseudo": grid_metrics("pseudo", w, method, norm, depth, None),
        }

    shipped = {
        "bm25": 1.0,
        "semantic": 0.0,
        "late_interaction": 1.0,
        "chargram": 1.0,
    }
    return {
        "stage1_winner_used": winner,
        "recall_first": report(recall_first),
        "mrr_guarded": report(mrr_guarded),
        "shipped_tuned_profile": report(
            (None, None, ("combsum", "minmax", 30), shipped)
        ),
    }


def main_stage3(argv=None):
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=str(DEFAULT_DATA_DIR))
    parser.add_argument("--model-dir", default="checkpoints/alps-semantic")
    parser.add_argument(
        "--li-model-dir", default="checkpoints/alps-maxsim"
    )
    args = parser.parse_args(argv)
    winner = json.loads(Path("eval/out/word_vectors.json").read_text())[
        "stage1_winner"
    ]
    out = asyncio.run(
        run_stage3(
            Path(args.data_dir), args.model_dir, args.li_model_dir, winner
        )
    )
    Path("eval/out/word_vectors_stage3.json").write_text(
        json.dumps(out, indent=2)
    )
    for rule in ("recall_first", "mrr_guarded", "shipped_tuned_profile"):
        r = out[rule]
        print(f"{rule}: weights={r['weights']} {r['method']}/d{r['depth']}")
        for split in ("handmade_test", "real_39", "pseudo"):
            print(
                f"  {split}: r@7={r[split]['recall@7']:.3f} "
                f"mrr={r[split]['mrr']:.3f}"
            )
    return out


if __name__ == "__main__":
    import sys

    if "--stage2" in sys.argv:
        sys.argv.remove("--stage2")
        main_stage2(sys.argv[1:])
    elif "--stage3" in sys.argv:
        sys.argv.remove("--stage3")
        main_stage3(sys.argv[1:])
    else:
        main(sys.argv[1:])
