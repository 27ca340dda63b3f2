"""Mint an idf-pooling table for an existing encoder checkpoint.

The reference's semantic retriever serves single-vector CLS embeddings
from frozen bge-small weights (reference embeddings/embeddings.py:29-66).
The first-party MaxSim-trained trunk (checkpoints/alps-maxsim) carries
its retrieval signal in per-TOKEN embedding directions, not in CLS —
an idf-weighted mean of its normalized token embeddings beats the same
trunk's CLS vector by >0.2 recall@7 on the real-corpus eval (current
measured numbers live in eval/out/alps_metrics.json's semantic row).
This tool computes that idf weight table from the training corpora and
writes it next to the model weights as ``idf_pooling.npz``;
`BgeEmbedder.from_hf_checkpoint` then serves the checkpoint with
``pooling="idf"`` automatically.

The table is a training-corpus statistic baked into the artifact (the
same corpora that trained the trunk — no eval ground truth enters),
exactly like SPLADE/SIF models ship term weights: idf(t) =
ln((N - df + 0.5)/(df + 0.5) + 1), floored at 1e-3, raised to --alpha.
Tokens unseen in the corpus get the maximum (df=0) weight.

    python -m tools.make_idf_pooling --model-dir checkpoints/alps-maxsim
        [--alpha 2.0] [--out checkpoints/alps-maxsim]
"""

import argparse
import json
from pathlib import Path

import numpy as np


def build_idf_table(
    chunk_texts: list[str],
    tokenizer,
    vocab_size: int,
    alpha: float,
    max_tokens: int = 512,
) -> np.ndarray:
    """[V] f32 idf^alpha weights from chunk-level wordpiece df.

    ``max_tokens`` defaults to the embedder's serving max_len (512):
    df must be counted over the same token window the semantic arm
    encodes, or a token that appears only in chunk TAILS would count
    df=0 and receive the table's df-unseen MAXIMUM weight — the exact
    opposite of its true commonness."""
    n = len(chunk_texts)
    df = np.zeros(vocab_size, dtype=np.int64)
    for i in range(0, n, 64):
        batch = chunk_texts[i : i + 64]
        ids, mask = tokenizer.encode_batch(batch, max_len=max_tokens)
        for row in range(len(batch)):
            t = int(mask[row].sum())
            df[np.unique(ids[row, :t])] += 1
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf = np.maximum(idf, 1e-3)
    return (idf**alpha).astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model-dir",
        required=True,
        help="checkpoint dir with config.json + vocab.txt",
    )
    parser.add_argument(
        "--out",
        default=None,
        help="dir to write idf_pooling.npz (default: --model-dir)",
    )
    parser.add_argument(
        "--alpha",
        type=float,
        default=2.0,
        help="idf exponent; 2.0 won on held-out ICT pseudo-queries "
        "(and was confirmed, not chosen, on the eval questions)",
    )
    args = parser.parse_args()

    from dial_rag_tpu.models.tokenizer import WordPieceTokenizer
    from tools.make_checkpoint import gather_corpus_chunks

    model_dir = Path(args.model_dir)
    with open(model_dir / "config.json") as f:
        vocab_size = json.load(f)["vocab_size"]
    tokenizer = WordPieceTokenizer.from_vocab_file(
        str(model_dir / "vocab.txt")
    )

    texts = gather_corpus_chunks()
    print(f"{len(texts)} corpus chunks", flush=True)
    weights = build_idf_table(texts, tokenizer, vocab_size, args.alpha)
    nz = weights[weights > (1e-3**args.alpha) + 1e-9]
    median = f"{np.median(nz):.4f}" if nz.size else "n/a (all at floor)"
    print(
        f"idf^{args.alpha}: min={weights.min():.4f} max={weights.max():.4f} "
        f"median(non-floor)={median}",
        flush=True,
    )

    out_dir = Path(args.out or args.model_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_dir / "idf_pooling.npz",
        weights=weights,
        alpha=np.float32(args.alpha),
    )
    print(f"wrote {out_dir / 'idf_pooling.npz'}", flush=True)


if __name__ == "__main__":
    main()
