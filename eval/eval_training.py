"""Closed-loop training eval: does contrastive fine-tuning improve
retrieval on the synthetic corpus?

The reference serves a frozen encoder; this framework also trains one
(dial_rag_tpu/training). This harness proves the loop does its job
end to end: generate the corpus -> split its QA pairs into train/test ->
measure semantic recall with the untrained random-weight encoder ->
train on the train split's (question, chunk) pairs -> re-index and
measure again on the held-out questions. Fully deterministic (seeded
corpus, seeded init, fixed data order).

    JAX_PLATFORMS=cpu python -m eval.eval_training --pages 10 --steps 150
"""

import argparse
import asyncio
import json
import re
from pathlib import Path

import numpy as np

from dial_rag_tpu.documents.model import (
    FORMAT_VERSION,
    DocumentRecord,
    IndexSettings,
)
from dial_rag_tpu.documents.parser import parse_document
from dial_rag_tpu.embeddings.embedder import (
    DEFAULT_QUERY_INSTRUCTION,
    BgeEmbedder,
)
from dial_rag_tpu.models.bert import BertEncoder
from dial_rag_tpu.retrieval import (
    LateInteractionRetriever,
    SemanticRetriever,
)
from dial_rag_tpu.training.loop import TrainConfig, train

from eval._platform import honor_jax_platforms_env
from eval.corpus import build_corpus
from eval.eval_retriever import (
    _ground_truth_chunks,
    make_test_embedder,
)

K_VALUES = (1, 3, 7)


def _recall(retriever_factory, questions, truth) -> dict:
    retriever = retriever_factory()
    hits_at = {k: 0 for k in K_VALUES}
    mrr = 0.0
    for q, true_ids in zip(questions, truth):
        found = [h.chunk_id for h in retriever.retrieve(q.question)]
        rank = next(
            (i + 1 for i, c in enumerate(found) if c in true_ids), None
        )
        if rank is not None:
            mrr += 1.0 / rank
        for k in K_VALUES:
            if true_ids and any(c in true_ids for c in found[:k]):
                hits_at[k] += 1
    n = len(questions)
    return {
        **{f"recall@{k}": hits_at[k] / n for k in K_VALUES},
        "mrr": mrr / n,
    }


def _semantic_factory(embedder, chunks):
    def make():
        embeddings = asyncio.run(
            SemanticRetriever.build_index(embedder, chunks)
        )
        record = _record(chunks, embeddings_index=embeddings)
        return SemanticRetriever.from_doc_records(
            embedder, [record], k=max(K_VALUES)
        )

    return make


def _maxsim_factory(embedder, chunks):
    def make():
        li = asyncio.run(
            LateInteractionRetriever.build_index(embedder, chunks)
        )
        record = _record(chunks, late_interaction_index=li)
        return LateInteractionRetriever.from_doc_records(
            embedder, [record], k=max(K_VALUES)
        )

    return make


def _record(chunks, embeddings_index=None, late_interaction_index=None):
    return DocumentRecord(
        format_version=FORMAT_VERSION,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=None,
        embeddings_index=embeddings_index,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        late_interaction_index=late_interaction_index,
        mime_type="application/pdf",
        document_bytes=b"",
    )


def run(
    n_pages: int = 12,
    steps: int = 600,
    seed: int = 0,
    objective: str = "cls",
    learning_rate: float = 3e-4,
    batch_size: int = 16,
) -> dict:
    corpus = build_corpus(n_pages=n_pages, seed=seed)
    chunks = parse_document(
        corpus.pdf_bytes,
        "application/pdf",
        source_link="atlas.pdf",
        display_name="atlas.pdf",
    )
    record = _record(chunks)
    truth = _ground_truth_chunks(corpus, record)

    # held-out split: even questions train, odd questions test; questions
    # whose fact maps to no chunk are excluded from BOTH sides (they are
    # unanswerable at chunk granularity and would deflate every metric)
    train_qs = [
        (q, t) for i, (q, t) in enumerate(zip(corpus.questions, truth))
        if i % 2 == 0 and t
    ]
    test_qs = [
        q for i, (q, t) in enumerate(zip(corpus.questions, truth))
        if i % 2 == 1 and t
    ]
    test_truth = [t for i, t in enumerate(truth) if i % 2 == 1 and t]
    n_unmapped = sum(1 for t in truth if not t)
    if not test_qs:
        raise ValueError("no mappable held-out questions at this scale")

    prefix = DEFAULT_QUERY_INSTRUCTION if objective == "cls" else ""
    # Two pair sources (tiny labeled sets alone overfit in tens of steps
    # and collapse held-out recall — measured):
    # - inverse-cloze self-supervision: every sentence of every chunk as
    #   a pseudo-query for its own chunk (the standard bootstrap when
    #   labeled pairs are scarce) — hundreds of pairs;
    # - the train split's labeled (question, chunk) pairs.
    # The CLS path prefixes queries with the BGE instruction at serving
    # time (embed_query), so trained queries carry it too.
    pairs = [
        (prefix + q.question, chunks[t[0]].text) for q, t in train_qs
    ]
    for chunk in chunks:
        # chunk text is newline-joined; sentences end with "." either way
        for sent in re.split(r"(?<=\.)\s+|\n+", chunk.text):
            sent = sent.strip()
            if len(sent.split()) >= 4:
                pairs.append((prefix + sent, chunk.text))
    if not pairs:
        raise ValueError(
            "no training pairs (too few pages or no mappable questions)"
        )
    # In-batch-negatives InfoNCE is poisoned by duplicate POSITIVES in a
    # batch (for query i, a second pair j with the same positive makes
    # logits[i, j] == logits[i, i], so the label scores a copy of the
    # positive as a negative). ICT pairs share positives heavily (~4-10
    # sentences per chunk), so batches are built positive-disjoint below
    # and the batch size stays below the unique-positive count.
    unique_pos = sorted({p for _, p in pairs})
    if len(unique_pos) < 2:
        raise ValueError("contrastive training needs >= 2 distinct chunks")
    batch_size = max(2, min(batch_size, len(unique_pos) - 1))
    embedder = make_test_embedder(corpus, batch_size=16)
    config = embedder.encoder.config
    # the tiny config supports exactly 128 positions; index/query/train
    # must all stay inside them (the default 512 max_len would bucket
    # chunks to 256 tokens and clamp-gather untrained positions)
    seq_len = config.max_position_embeddings
    embedder.max_len = seq_len

    factory = _semantic_factory if objective == "cls" else _maxsim_factory
    before = _recall(factory(embedder, chunks), test_qs, test_truth)

    train_config = TrainConfig(
        batch_size=batch_size,
        seq_len=seq_len,
        learning_rate=learning_rate,
        warmup_steps=10,
        total_steps=steps,
        checkpoint_every=10**9,
        seed=seed,
        objective=objective,
        # InfoNCE temperature is calibrated to cosine logits in [-1, 1];
        # MaxSim logits are sums over ~query-length tokens, an order of
        # magnitude larger, so the sharpening stays at 1.0 there
        temperature=0.02 if objective == "cls" else 1.0,
    )
    # positive-disjoint batch construction: each emitted batch draws one
    # query from batch_size DISTINCT positives (pairs_to_batches slices
    # the stream in exact batch_size groups, so alignment holds)
    from dial_rag_tpu.training.data import positive_disjoint_stream

    stream = positive_disjoint_stream(
        pairs, train_config.batch_size, steps, seed=seed
    )
    trained_params, losses = train(
        config, train_config, stream, embedder.tokenizer,
        init=embedder.params,
    )

    trained = BgeEmbedder(
        tokenizer=embedder.tokenizer,
        encoder=BertEncoder(config),
        params=trained_params,
        batch_size=embedder.batch_size,
        max_len=seq_len,
    )
    after = _recall(factory(trained, chunks), test_qs, test_truth)

    return {
        "objective": objective,
        "n_pages": n_pages,
        "n_train_pairs": len(pairs),
        "n_test_questions": len(test_qs),
        "n_unmapped_questions": n_unmapped,
        "steps": steps,
        "loss_first": round(float(np.mean(losses[:5])), 4),
        "loss_last": round(float(np.mean(losses[-5:])), 4),
        "before": before,
        "after": after,
    }


def main(argv=None) -> dict:
    honor_jax_platforms_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", type=int, default=12)
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--objective", choices=("cls", "maxsim"), default="cls"
    )
    parser.add_argument("--out", default=str(Path(__file__).parent / "out"))
    args = parser.parse_args(argv)

    metrics = run(
        n_pages=args.pages,
        steps=args.steps,
        seed=args.seed,
        objective=args.objective,
    )
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / f"training_{args.objective}.json", "w") as f:
        json.dump(metrics, f, indent=2)
    print(
        f"{args.objective}: recall@1 {metrics['before']['recall@1']:.3f}"
        f" -> {metrics['after']['recall@1']:.3f}, "
        f"mrr {metrics['before']['mrr']:.3f} -> "
        f"{metrics['after']['mrr']:.3f} "
        f"(loss {metrics['loss_first']} -> {metrics['loss_last']})"
    )
    return metrics


if __name__ == "__main__":
    main()
