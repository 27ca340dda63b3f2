"""Mint a first-party trained encoder checkpoint (bge-small arch).

The reference serves frozen bge-small-en weights downloaded at image
build time (reference embeddings/embeddings.py:29-32, download_model.py)
— unavailable here (no egress). This tool trains the same architecture
from scratch with inverse-cloze-task (ICT) self-supervision over the
real corpora in the image (both alps_wiki.pdf files + the synthetic
eval corpus) and writes an HF-layout checkpoint directory that the
standard loader (`BgeEmbedder.from_hf_checkpoint`, also used for real
bge artifacts) serves directly:

    out/
      config.json          # BertModel config (bge-small dims)
      model.safetensors    # trained weights, HF BertModel names
      vocab.txt            # first-party-trained WordPiece vocab

No ground-truth eval questions enter training (ICT only), so
eval/eval_alps.py --model-dir measures honest held-out quality.

    python -m tools.make_checkpoint --out checkpoints/alps-cls \
        [--objective cls|maxsim] [--steps 1500] [--vocab-size 8192]

Runs on whatever jax backend is active (TPU if available; set
JAX_PLATFORMS=cpu to force host).
"""

import argparse
import json
import re
from pathlib import Path

import numpy as np


def gather_corpus_chunks() -> list[str]:
    """Chunk texts from every corpus available in the image."""
    from dial_rag_tpu.documents.parser import parse_document

    texts: list[str] = []
    for pdf_path in (
        "/root/reference/tests/data/alps_wiki.pdf",
        "/root/reference/eval/data/alps_wiki.pdf",
    ):
        p = Path(pdf_path)
        if p.is_file():
            chunks = parse_document(
                p.read_bytes(),
                "application/pdf",
                source_link=p.name,
                display_name=p.name,
            )
            texts += [c.text for c in chunks if c.text.strip()]
    from eval.corpus import build_corpus

    corpus = build_corpus(n_pages=30, seed=7)
    chunks = parse_document(
        corpus.pdf_bytes,
        "application/pdf",
        source_link="atlas.pdf",
        display_name="atlas.pdf",
    )
    texts += [c.text for c in chunks if c.text.strip()]
    return texts


def train_vocab(texts: list[str], vocab_size: int, out_dir: Path) -> str:
    """Train a WordPiece vocab (HF tokenizers trainer — a baked-in lib;
    serving still tokenizes with the first-party WordPiece over the
    resulting vocab.txt) and write it."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.normalizers import BertNormalizer
    from tokenizers.pre_tokenizers import BertPreTokenizer
    from tokenizers.trainers import WordPieceTrainer

    tok = Tokenizer(WordPiece(unk_token="[UNK]"))
    tok.normalizer = BertNormalizer(lowercase=True)
    tok.pre_tokenizer = BertPreTokenizer()
    trainer = WordPieceTrainer(
        vocab_size=vocab_size,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"],
        continuing_subword_prefix="##",
    )
    tok.train_from_iterator(texts, trainer)
    vocab = tok.get_vocab()
    ordered = sorted(vocab, key=vocab.get)
    path = out_dir / "vocab.txt"
    path.write_text("\n".join(ordered) + "\n", encoding="utf-8")
    return str(path)


_STOPWORDS = frozenset(
    """a an and are as at be by for from has have in is it its of on or
    that the to was were which with""".split()
)


def morph_groups(texts: list[str], stem) -> dict[str, list[str]]:
    """stem -> sorted list of corpus-attested surface forms. Only real
    corpus word forms enter (rule-generated candidates produce junk
    like "mountaining"); a stem with >=2 attested forms is a genuine
    inflection group ("formed"/"forming"/"forms")."""
    groups: dict[str, set[str]] = {}
    for text in texts:
        for w in re.findall(r"[A-Za-z]{4,}", text):
            wl = w.lower()
            if wl in _STOPWORDS:
                continue
            groups.setdefault(stem(wl), set()).add(wl)
    return {s: sorted(forms) for s, forms in groups.items() if len(forms) > 1}


def morph_perturb(
    sentence: str, rng, stem, groups: dict[str, list[str]], p: float = 0.35
) -> str | None:
    """Replace ~p of the eligible words with a different corpus-attested
    surface form sharing the Porter2 stem ("variant" means exactly what
    the BM25 teacher already treats as equivalent via stemming); None if
    nothing changed. Targets the measured paraphrase-regime inflection
    failures ("romanticised" query vs "romanticising" corpus) that BM25
    wins for free while the WordPiece-level trained arms miss."""
    words = sentence.split()
    out = []
    changed = False
    for w in words:
        # keep leading/trailing punctuation attached to the word
        core = w.strip(".,;:!?()[]\"'")
        cl = core.lower()
        if (
            len(cl) >= 4
            and cl.isalpha()
            and cl not in _STOPWORDS
            and rng.random() < p
        ):
            vs = [f for f in groups.get(stem(cl), ()) if f != cl]
            if vs:
                v = vs[int(rng.integers(len(vs)))]
                if core[0].isupper():
                    v = v.capitalize()
                out.append(w.replace(core, v, 1))
                changed = True
                continue
        out.append(w)
    return " ".join(out) if changed else None


def ict_pairs(
    texts: list[str], prefix: str, seed: int = 0, morph_aug: bool = False
):
    """Self-supervised (query, chunk) pairs; returns (pairs, pos_key)
    where pos_key maps each passage view back to its source chunk so
    batch construction treats views of one chunk as ONE positive. Three query styles per
    chunk — exact ICT sentences alone teach verbatim matching and fail
    on question-style paraphrases (measured: semantic recall@7 0.44);
    the keyword/dropout styles force order-invariant bag-of-content
    matching, the regime real questions live in:

    - ICT: each sentence as a pseudo-query for its chunk;
    - word dropout: the sentence with ~30% of words removed;
    - keyword subsets: 3-7 shuffled content words sampled from the
      whole chunk (soft-BM25 supervision);
    - (``morph_aug``) morphological variants: ~35% of the sentence's
      content words swapped for a different surface form sharing the
      Porter2 stem — teaches the WordPiece-level arms the inflection
      invariance the BM25 teacher gets for free from stemming.
    """
    stem = groups = mrng = None
    if morph_aug:
        from dial_rag_tpu.text.keywords import _stemmer

        stem = _stemmer()
        groups = morph_groups(texts, stem)
        # dedicated stream: the baseline views must stay byte-identical
        # with the flag on (additive augmentation, not a reshuffle)
        mrng = np.random.default_rng(seed + 104729)
    rng = np.random.default_rng(seed)
    pairs = []
    view_src: dict[str, int] = {}

    def add(q, passage, src):
        view_src.setdefault(passage, src)
        pairs.append((q, passage))

    for src, text in enumerate(texts):
        content_words = [
            w
            for w in re.findall(r"[A-Za-z][A-Za-z0-9'-]+", text)
            if w.lower() not in _STOPWORDS and len(w) > 2
        ]
        for sent in re.split(r"(?<=[.!?])\s+|\n+", text):
            sent = sent.strip()
            words = sent.split()
            if len(words) < 4:
                continue
            add(prefix + sent, text, src)
            keep = rng.random(len(words)) > 0.3
            dropped = [w for w, k in zip(words, keep) if k]
            if len(dropped) >= 3:
                add(prefix + " ".join(dropped), text, src)
            if morph_aug:
                mv = morph_perturb(sent, mrng, stem, groups)
                if mv is not None:
                    add(prefix + mv, text, src)
            # passage-side dropout: pair the sentence against a 15%%-
            # word-dropped view of the chunk (blocks chunk-identity
            # memorization — measured embedding collapse without it)
            twords = text.split()
            tkeep = rng.random(len(twords)) > 0.15
            tview = " ".join(w for w, k in zip(twords, tkeep) if k)
            if tview:
                add(prefix + sent, tview, src)
        n_kw = max(2, min(6, len(content_words) // 12))
        for _ in range(n_kw):
            if len(content_words) < 3:
                break
            k = int(rng.integers(3, 8))
            sample = rng.choice(
                content_words, size=min(k, len(content_words)), replace=False
            )
            add(prefix + " ".join(sample), text, src)
    return pairs, view_src.get


def mix_teacher_row(row_a: np.ndarray, row_b: np.ndarray, tt: float):
    """Combine two teachers' raw in-batch score rows into ONE score row
    whose softened distribution is the equal mixture of theirs.

    The KD loss computes ``softmax(teacher_scores / tt)``; passing
    ``tt * log(0.5*softmax(a/tt) + 0.5*softmax(b/tt))`` round-trips the
    mixture exactly (softmax of a log-probability vector is the
    probability vector), so no loss change is needed for multi-teacher
    distillation."""
    rows = np.stack([row_a, row_b]).astype(np.float64) / tt
    rows -= rows.max(axis=-1, keepdims=True)
    probs = np.exp(rows)
    probs /= probs.sum(axis=-1, keepdims=True)
    return (tt * np.log(probs.mean(axis=0) + 1e-12)).astype(np.float32)


def maxsim_teacher_scores(
    model_dir: str,
    queries: list[str],
    texts: list[str],
    qbatch: int = 16,
) -> np.ndarray:
    """[Q, N] MaxSim scores of every query against every chunk under a
    trained late-interaction checkpoint (TCT-ColBERT-style teacher: the
    token-level model generalizes to paraphrases, and distilling its
    score distribution into the single CLS vector transfers that — the
    BM25 teacher alone plateaus the CLS arm at ~0.49 recall@7).

    Everything runs in ONE device dispatch (chunk encode + a lax.scan
    over query batches with the serving-parity pairwise scorer): only
    token ids go H2D and only the [Q, N] score matrix comes D2H, which
    keeps the slow tunnel transfers out of the hot path.
    """
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.embeddings.embedder import (
        BgeEmbedder,
        _token_encode_jit,
    )
    from dial_rag_tpu.training.contrastive import maxsim_scores_pairwise

    emb = BgeEmbedder.from_hf_checkpoint(model_dir)
    p_ids, p_mask = emb.tokenizer.encode_batch(texts, max_len=256)
    q_ids, q_mask = emb.tokenizer.encode_batch(queries, max_len=64)
    nq = len(queries)
    pad = (-nq) % qbatch
    if pad:
        q_ids = np.pad(q_ids, ((0, pad), (0, 0)))
        q_mask = np.pad(q_mask, ((0, pad), (0, 0)))
    q_ids = q_ids.reshape(-1, qbatch, q_ids.shape[1])
    q_mask = q_mask.reshape(-1, qbatch, q_mask.shape[1])
    enc_kw = dict(
        num_heads=emb.encoder.config.num_heads,
        compute_dtype=emb.encoder.compute_dtype,
        attention_impl=emb.encoder.attention_impl,
        gelu=emb.encoder.gelu,
    )

    @jax.jit
    def run(params, p_ids, p_mask, q_ids, q_mask):
        p_tok = _token_encode_jit(params, p_ids, p_mask, **enc_kw)
        pm = p_mask.astype(jnp.float32)

        def body(_, qb):
            ids, mask = qb
            q_tok = _token_encode_jit(params, ids, mask, **enc_kw)
            return None, maxsim_scores_pairwise(
                q_tok, mask.astype(jnp.float32), p_tok, pm
            )

        _, scores = jax.lax.scan(body, None, (q_ids, q_mask))
        return scores.reshape(-1, scores.shape[-1])

    print(
        f"maxsim teacher: scoring {nq} queries x {len(texts)} chunks "
        f"({model_dir})",
        flush=True,
    )
    scores = np.asarray(
        run(emb.params, p_ids, p_mask, q_ids, q_mask)
    )[:nq]
    return scores


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--objective", choices=("cls", "maxsim"), default="cls")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--seq-len", type=int, default=256)
    parser.add_argument("--vocab-size", type=int, default=8192)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--save-dtype", choices=("float32", "float16"), default="float16"
    )
    parser.add_argument("--kd-weight", type=float, default=0.5)
    parser.add_argument(
        "--init-from",
        default=None,
        help="warm-start from an existing checkpoint dir (reuses its "
        "vocab.txt and weights instead of random init)",
    )
    parser.add_argument("--teacher-temperature", type=float, default=4.0)
    parser.add_argument(
        "--teacher",
        choices=("bm25", "maxsim", "mix"),
        default="bm25",
        help="distillation teacher: the serving BM25 (lexical), a "
        "trained late-interaction checkpoint (--li-teacher-dir; "
        "TCT-ColBERT-style score distillation), or an equal mixture "
        "of both softened distributions",
    )
    parser.add_argument(
        "--li-teacher-dir",
        default="checkpoints/alps-maxsim",
        help="late-interaction checkpoint used when --teacher is "
        "maxsim/mix",
    )
    parser.add_argument(
        "--hard-negatives",
        action="store_true",
        help="build batches from BM25-confusable neighbour chunks "
        "(ANCE-style hard in-batch negatives) instead of uniform "
        "positive-disjoint sampling",
    )
    parser.add_argument(
        "--corpus-kd-weight",
        type=float,
        default=0.0,
        help="mix weight of the corpus-level distillation term (cls "
        "objective only): distill the teacher's scores over ALL corpus "
        "chunks into the student's query-vs-bank logits, with the "
        "passage bank re-encoded from current params every "
        "--bank-refresh-every steps; 0 disables",
    )
    parser.add_argument("--bank-refresh-every", type=int, default=100)
    parser.add_argument(
        "--checkpoint-every",
        type=int,
        default=0,
        help="save an orbax resume checkpoint every N steps (0 "
        "disables). Long runs ride a remote TPU tunnel that can hang "
        "mid-run; with this set, re-running the same command resumes "
        "from the latest save instead of restarting from step 0",
    )
    parser.add_argument(
        "--checkpoint-dir",
        default=None,
        help="resume-checkpoint directory (default <out>/resume when "
        "--checkpoint-every is set)",
    )
    parser.add_argument(
        "--morph-aug",
        action="store_true",
        help="add morphological-variant query views to the ICT pairs "
        "(stem-sharing surface-form swaps; targets the measured "
        "paraphrase-regime inflection failures). Off by default so the "
        "shipped staged recipe stays byte-reproducible.",
    )
    args = parser.parse_args()
    if args.corpus_kd_weight > 0 and args.objective != "cls":
        # fail in milliseconds, not after minutes of teacher precompute:
        # the loss would raise this only at the first jitted train step
        parser.error(
            "--corpus-kd-weight needs --objective cls "
            "(the bank stores single-vector embeddings)"
        )

    import jax

    from dial_rag_tpu.embeddings.embedder import DEFAULT_QUERY_INSTRUCTION
    from dial_rag_tpu.models.bert import (
        BertConfig,
        export_hf_state,
        init_params,
    )
    from dial_rag_tpu.models.tokenizer import WordPieceTokenizer
    from dial_rag_tpu.training.data import positive_disjoint_stream
    from dial_rag_tpu.training.loop import TrainConfig, train

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    texts = gather_corpus_chunks()
    print(f"corpus: {len(texts)} chunks", flush=True)
    if args.init_from:
        import shutil

        src = (Path(args.init_from) / "vocab.txt").resolve()
        dst = (out_dir / "vocab.txt").resolve()
        if src != dst:  # --out may equal --init-from (in-place continuation)
            shutil.copy(src, dst)
    elif (
        args.checkpoint_every
        and (out_dir / "vocab.txt").is_file()
        and (resume_dir := Path(args.checkpoint_dir or out_dir / "resume")).is_dir()
        and any(resume_dir.iterdir())
    ):
        # resuming a crashed run (live orbax state in the resume dir —
        # a finished run deletes it, so a leftover vocab.txt alone does
        # NOT trigger reuse): the HF WordPiece trainer is NOT
        # deterministic across processes (thread-order merge ties move
        # the vocab size by a few tokens), so retraining here would
        # change the embedding-table shape and make the orbax restore
        # fail. The first run's vocab is the contract — reuse it.
        print("reusing existing vocab.txt (resume)", flush=True)
    else:
        train_vocab(texts, args.vocab_size, out_dir)
    tokenizer = WordPieceTokenizer.from_vocab_file(str(out_dir / "vocab.txt"))
    print(f"vocab: {len(tokenizer.vocab)} tokens", flush=True)

    prefix = DEFAULT_QUERY_INSTRUCTION if args.objective == "cls" else ""
    pairs, pos_key = ict_pairs(
        texts, prefix, seed=args.seed, morph_aug=args.morph_aug
    )
    print(f"ICT pairs: {len(pairs)}", flush=True)
    n_sources = len({pos_key(p) for _, p in pairs})
    if args.batch_size > n_sources:
        args.batch_size = max(2, n_sources)
        print(
            f"batch size clamped to {args.batch_size} "
            f"({n_sources} distinct source chunks)",
            flush=True,
        )

    any_kd = args.kd_weight > 0 or args.corpus_kd_weight > 0
    bm25 = None
    if args.hard_negatives or (
        any_kd and args.teacher in ("bm25", "mix")
    ):
        from dial_rag_tpu.index.bm25 import Bm25Index
        from dial_rag_tpu.text import keywords_preprocess

        tokenized = [keywords_preprocess(t) for t in texts]
        bm25 = Bm25Index.build(tokenized, device=False)

    if args.hard_negatives:
        # each batch = one seed chunk + its most BM25-confusable
        # neighbours (chunk text as the query), so in-batch negatives
        # are the candidates an index would actually confuse
        from dial_rag_tpu.training.data import hard_negative_stream

        neighbors = {}
        for i, toks in enumerate(tokenized):
            ranked = np.argsort(bm25.get_scores(toks))[::-1]
            neighbors[i] = [int(j) for j in ranked if int(j) != i][:128]
        stream = hard_negative_stream(
            pairs, args.batch_size, args.steps, neighbors,
            seed=args.seed, pos_key=pos_key,
        )
        print("hard-negative batches (BM25 neighbourhoods)", flush=True)
    else:
        stream = positive_disjoint_stream(
            pairs, args.batch_size, args.steps, seed=args.seed,
            pos_key=pos_key,
        )

    teacher = None
    corpus_teacher = None
    bank_tokens = None
    if any_kd:
        # distillation: per-query scores over ALL chunks are precomputed
        # once; each batch selects its passages' columns. Passages map
        # to chunks via pos_key (views share their source chunk's
        # column).
        uniq_queries = sorted({q for q, _ in stream})
        strip = (lambda q: q[len(prefix):]) if prefix else (lambda q: q)
        qscore = mscore = None
        if bm25 is not None and args.teacher in ("bm25", "mix"):
            # lexical teacher: the serving BM25 (keywords-preprocessed,
            # host scoring)
            qscore = {
                q: bm25.get_scores(keywords_preprocess(strip(q)))
                for q in uniq_queries
            }
            print(
                f"BM25 teacher ready ({len(uniq_queries)} unique queries)",
                flush=True,
            )
        if args.teacher in ("maxsim", "mix"):
            mat = maxsim_teacher_scores(
                args.li_teacher_dir,
                [strip(q) for q in uniq_queries],
                texts,
            )
            mscore = {q: mat[i] for i, q in enumerate(uniq_queries)}
            print("maxsim teacher ready", flush=True)

        tt = args.teacher_temperature
        if args.teacher == "mix":
            # the mixture must be formed over exactly the columns the
            # loss softmaxes (softmax-then-slice != slice-then-softmax),
            # so in-batch and corpus teachers mix their own views
            def row_for(q, cols=None):
                if cols is None:
                    return mix_teacher_row(qscore[q], mscore[q], tt)
                return mix_teacher_row(qscore[q][cols], mscore[q][cols], tt)

        else:
            score = qscore if args.teacher == "bm25" else mscore

            def row_for(q, cols=None):
                return score[q] if cols is None else score[q][cols]

        if args.kd_weight > 0:

            def teacher(buf):
                cols = [pos_key(p) for _, p in buf]
                return np.stack([row_for(q, cols) for q, _ in buf])

        if args.corpus_kd_weight > 0:
            # full-corpus distillation target: the teacher's raw scores
            # over ALL chunks per batch query. The student's matching
            # logits come from the bank (refreshed in the loop) with the
            # batch positives' columns replaced by LIVE passage
            # embeddings (doc-side gradient; contrastive.py)
            def corpus_teacher(buf):
                rows = np.stack([row_for(q) for q, _ in buf])
                cols = np.asarray(
                    [pos_key(p) for _, p in buf], dtype=np.int32
                )
                return rows, cols

            bank_tokens = tokenizer.encode_batch(
                texts, max_len=args.seq_len
            )
            print(
                f"corpus bank: {len(texts)} chunks, refresh every "
                f"{args.bank_refresh_every} steps",
                flush=True,
            )

    config = BertConfig(vocab_size=len(tokenizer.vocab))  # bge-small dims
    # init on host: eager per-op dispatch on the remote TPU is ~100ms/op
    if args.init_from:
        import json as _json

        from safetensors.numpy import load_file

        from dial_rag_tpu.models.bert import load_hf_weights

        state = load_file(str(Path(args.init_from) / "model.safetensors"))
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = load_hf_weights(state, config)
        print(f"warm start from {args.init_from}", flush=True)
    else:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = init_params(jax.random.PRNGKey(args.seed), config)
    params = jax.device_put(params)

    train_config = TrainConfig(
        batch_size=args.batch_size,
        seq_len=args.seq_len,
        learning_rate=args.learning_rate,
        warmup_steps=min(100, args.steps // 10),
        total_steps=args.steps,
        checkpoint_every=args.checkpoint_every or 10**9,
        seed=args.seed,
        objective=args.objective,
        kd_weight=args.kd_weight,
        teacher_temperature=args.teacher_temperature,
        corpus_kd_weight=args.corpus_kd_weight,
        bank_refresh_every=args.bank_refresh_every,
    )
    ckpt_dir = None
    if args.checkpoint_every:
        ckpt_dir = args.checkpoint_dir or str(out_dir / "resume")
    params, losses = train(
        config, train_config, stream, tokenizer, init=params,
        teacher=teacher, corpus_teacher=corpus_teacher,
        bank_tokens=bank_tokens, checkpoint_dir=ckpt_dir,
    )
    if losses:
        print(
            f"loss {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}",
            flush=True,
        )
    else:
        print("no new steps (resumed at final step)", flush=True)

    params = jax.device_get(params)
    from safetensors.numpy import save_file

    dtype = np.float16 if args.save_dtype == "float16" else np.float32
    # warm-started runs accumulate provenance: total steps and stage
    # count carry over from the init checkpoint's config so a staged
    # recipe (e.g. the Makefile's three 25k runs into one dir) reports
    # its true training length, not just the final stage's
    prior_steps, prior_stages = 0, 0
    if args.init_from:
        init_cfg_path = Path(args.init_from) / "config.json"
        if init_cfg_path.is_file():
            prior = json.loads(init_cfg_path.read_text()).get(
                "first_party_training", {}
            )
            prior_steps = int(prior.get("steps", 0))
            prior_stages = int(prior.get("stages", 1 if prior else 0))
    save_file(
        export_hf_state(params, config, dtype=dtype),
        str(out_dir / "model.safetensors"),
    )
    (out_dir / "config.json").write_text(
        json.dumps(
            {
                "architectures": ["BertModel"],
                "model_type": "bert",
                "vocab_size": config.vocab_size,
                "hidden_size": config.hidden_size,
                "num_hidden_layers": config.num_layers,
                "num_attention_heads": config.num_heads,
                "intermediate_size": config.intermediate_size,
                "max_position_embeddings": config.max_position_embeddings,
                "type_vocab_size": config.type_vocab_size,
                "do_lower_case": True,
                "first_party_training": {
                    "objective": args.objective,
                    "steps": prior_steps + args.steps,
                    "stages": prior_stages + 1,
                    "final_stage_steps": args.steps,
                    "batch_size": args.batch_size,
                    "seq_len": args.seq_len,
                    "learning_rate": args.learning_rate,
                    "kd_weight": args.kd_weight,
                    "teacher": args.teacher,
                    "teacher_temperature": args.teacher_temperature,
                    "hard_negatives": args.hard_negatives,
                    "corpus_kd_weight": args.corpus_kd_weight,
                    "bank_refresh_every": args.bank_refresh_every,
                    "seed": args.seed,
                    "recipe": "tools/make_checkpoint.py (ICT, no eval questions)",
                },
            },
            indent=2,
        )
    )
    if ckpt_dir is not None:
        # the resume state (params + opt_state orbax saves) only matters
        # while the run can still die; once the export above landed it is
        # dead weight sitting inside the checkpoint dir — drop it
        import shutil

        shutil.rmtree(ckpt_dir, ignore_errors=True)
    print(f"checkpoint -> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
