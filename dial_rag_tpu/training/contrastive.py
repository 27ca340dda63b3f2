"""Contrastive fine-tuning of the embedding encoder (InfoNCE).

The reference serves a frozen bge-small-en; a production retrieval stack
also needs to *train* its embedder on domain pairs. This module provides
the symmetric in-batch-negatives InfoNCE objective used by the BGE family,
as a single jitted train step sharded over a (dp, tp) mesh:

- the (query, passage) batch is dp-sharded; because the logit matrix is
  ``q @ p.T`` over the *global* batch, XLA inserts the all-gather across
  dp — the idiomatic TPU replacement for torch's explicit
  ``all_gather``-with-grad tricks;
- encoder weights follow the tensor-parallel plan in parallel/mesh.py;
- optimizer state inherits the parameter shardings (sharded adamw).
"""

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from dial_rag_tpu.models.bert import BertConfig, bert_forward
from dial_rag_tpu.parallel.mesh import (
    batch_sharding,
    bert_param_shardings,
)
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _encode(params, ids, mask, *, num_heads, compute_dtype, remat=False):
    # differentiable end to end: the fused attention kernel carries a
    # custom VJP (recompute-P backward, ops/flash_attention.py)
    hidden = bert_forward(
        params,
        ids,
        mask,
        num_heads=num_heads,
        compute_dtype=compute_dtype,
        remat=remat,
    )
    cls = hidden[:, 0, :].astype(jnp.float32)
    return cls / jnp.maximum(
        jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12
    )


def _encode_tokens(params, ids, mask, *, num_heads, compute_dtype, remat):
    """Per-token L2-normalized hidden states (the late-interaction
    representation — must match serving's
    embeddings/embedder.py:_token_encode_jit numerics)."""
    hidden = bert_forward(
        params,
        ids,
        mask,
        num_heads=num_heads,
        compute_dtype=compute_dtype,
        remat=remat,
    ).astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(hidden * hidden, axis=-1, keepdims=True))
    return hidden / jnp.maximum(norm, 1e-12)


def maxsim_scores_pairwise(q_tok, q_mask, p_tok, p_mask):
    """All-pairs MaxSim logits [B, C]: sum over real q tokens of max over
    real p tokens of per-token cosine — the exact serving scorer
    (index/late_interaction.py), differentiable. Memory: the [B, C, S, S]
    sim tensor is materialized, so keep B*C*S^2 bounded (B=32, S=128 ->
    256 MiB f32); remat/smaller batches for longer sequences."""
    sims = jnp.einsum(
        "bsd,ctd->bcst",
        q_tok,
        p_tok,
        preferred_element_type=jnp.float32,
        # serving's _maxsim_scores runs f32 dots at HIGHEST; without it
        # TPU f32 matmuls are bf16-grade and the trained logits would
        # drift from the serving scores (CPU tests cannot catch this)
        precision=jax.lax.Precision.HIGHEST,
    )
    sims = jnp.where(
        p_mask[None, :, None, :].astype(bool), sims, -jnp.inf
    )
    per_q = jnp.max(sims, axis=-1)  # [B, C, S]
    per_q = jnp.where(q_mask[:, None, :].astype(bool), per_q, 0.0)
    scores = jnp.sum(per_q, axis=-1)
    # a passage with zero real tokens scores -inf against EVERY query,
    # which turns the softmax row all -inf -> NaN loss. Unreachable with
    # tokenizer-built batches (CLS/SEP are always present) but a silent
    # NaN for hand-built ones: give such passages a large-but-finite
    # floor instead so the loss stays defined
    has_tokens = p_mask.sum(axis=-1) > 0  # [C]
    return jnp.where(has_tokens[None, :], scores, -1e9)


def contrastive_loss(
    params,
    batch,
    *,
    num_heads: int,
    temperature: float = 0.02,
    compute_dtype=jnp.float32,
    remat: bool = False,
    objective: str = "cls",
    kd_weight: float = 0.5,
    teacher_temperature: float = 4.0,
    corpus_kd_weight: float = 0.5,
):
    """Symmetric InfoNCE over in-batch negatives.

    ``batch`` is a dict with q_ids/q_mask/p_ids/p_mask, all [B, S].
    ``objective``: "cls" trains the single-vector (bge-style CLS)
    representation the semantic retriever serves; "maxsim" trains the
    token-level representation the late-interaction retriever serves
    (logits are raw MaxSim sums, matching the serving scorer — not
    length-normalized, like ColBERT).
    """
    enc_kw = dict(
        num_heads=num_heads, compute_dtype=compute_dtype, remat=remat
    )
    if objective == "cls":
        q = _encode(params, batch["q_ids"], batch["q_mask"], **enc_kw)
        p = _encode(params, batch["p_ids"], batch["p_mask"], **enc_kw)
        logits = jnp.dot(q, p.T, preferred_element_type=jnp.float32)
    elif objective == "maxsim":
        q_tok = _encode_tokens(
            params, batch["q_ids"], batch["q_mask"], **enc_kw
        )
        p_tok = _encode_tokens(
            params, batch["p_ids"], batch["p_mask"], **enc_kw
        )
        logits = maxsim_scores_pairwise(
            q_tok, batch["q_mask"], p_tok, batch["p_mask"]
        )
    else:
        raise ValueError(f"unknown objective: {objective!r}")
    logits = logits / temperature
    labels = jnp.arange(logits.shape[0])
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_qp.mean() + loss_pq.mean())
    if "teacher_scores" in batch:
        # lexical distillation: soften the one-hot InfoNCE target with a
        # teacher's in-batch score distribution (e.g. the serving BM25 —
        # the student then learns term-weighted matching that
        # generalizes to unseen phrasings instead of memorizing pairs)
        targets = jax.nn.softmax(
            batch["teacher_scores"].astype(jnp.float32)
            / teacher_temperature,
            axis=-1,
        )
        loss_kd = optax.softmax_cross_entropy(logits, targets).mean()
        loss = (1.0 - kd_weight) * loss + kd_weight * loss_kd
    if "teacher_corpus" in batch:
        # corpus-level distillation: match the teacher's score
        # distribution over the ENTIRE corpus, not the batch's B
        # columns. In-batch KD subsamples the ranking — each step the
        # student sees the teacher's preferences among B of N chunks;
        # with N only a few hundred, scoring the full corpus gives the
        # exact ranking gradient every step. The passage side is a
        # periodically-refreshed stop-gradient bank (loop.py), so this
        # term trains the QUERY encoder to reproduce the teacher's
        # corpus-wide geometry (TAS-B/ANCE-style cached negatives).
        if objective != "cls":
            raise ValueError(
                "corpus distillation needs the cls objective "
                "(the bank stores single-vector embeddings)"
            )
        bank = jnp.asarray(batch["bank_emb"], jnp.float32)  # [N, D], stop-grad
        if "bank_cols" in batch:
            # live columns (XBM-style): replace the batch positives'
            # bank rows with the CURRENT differentiable passage
            # embeddings. Without this the corpus term gives the doc
            # side zero gradient and class separability hinges on the
            # frozen bank's spread — random-init CLS embeddings are
            # near-collinear, so the pure stop-grad term plateaus
            # (measured: held-out recall@1 0.33 vs 0.94 InfoNCE on the
            # mechanism probe). Positive-disjoint batches guarantee
            # unique columns.
            bank = bank.at[batch["bank_cols"]].set(p)
        logits_c = (
            jnp.dot(q, bank.T, preferred_element_type=jnp.float32)
            / temperature
        )
        targets_c = jax.nn.softmax(
            batch["teacher_corpus"].astype(jnp.float32)
            / teacher_temperature,
            axis=-1,
        )
        loss_ckd = optax.softmax_cross_entropy(logits_c, targets_c).mean()
        loss = (1.0 - corpus_kd_weight) * loss + corpus_kd_weight * loss_ckd
    return loss


def make_bank_encoder(
    config: BertConfig, compute_dtype=jnp.float32, block: int = 64
):
    """Jitted full-corpus encoder for the distillation bank: one
    dispatch encodes [N, S] chunk tokens to [N, D] CLS embeddings via a
    lax.scan over ``block``-row slices (bounds activation memory to one
    block regardless of corpus size). The caller pads N to a multiple
    of ``block`` and slices the result; numerics match the serving
    single-vector encode (_encode)."""

    @jax.jit
    def encode_bank(params, ids, mask):
        n, s = ids.shape
        pad = (-n) % block
        ids_p = jnp.pad(ids, ((0, pad), (0, 0)))
        mask_p = jnp.pad(mask, ((0, pad), (0, 0)))
        # padding rows are all-PAD; _encode handles them (zero-norm
        # floor) and the caller slices them away
        ids_b = ids_p.reshape(-1, block, s)
        mask_b = mask_p.reshape(-1, block, s)

        def body(_, xs):
            bids, bmask = xs
            return None, _encode(
                params,
                bids,
                bmask,
                num_heads=config.num_heads,
                compute_dtype=compute_dtype,
            )

        _, embs = jax.lax.scan(body, None, (ids_b, mask_b))
        return embs.reshape(-1, embs.shape[-1])[:n]

    return encode_bank


def create_train_state(
    params, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    config: BertConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    temperature: float = 0.02,
    compute_dtype=jnp.float32,
    remat: bool = False,
    objective: str = "cls",
    kd_weight: float = 0.5,
    teacher_temperature: float = 4.0,
    corpus_kd_weight: float = 0.5,
):
    """Build the jitted train step. With a mesh, params/batch/opt-state are
    sharded (tp plan + dp batch) and XLA inserts all collectives.
    ``remat`` rematerializes encoder layers in the backward — O(1)-layer
    activation memory for ~1/3 extra FLOPs (long-seq / big-batch runs).
    ``objective`` picks the trained representation (see contrastive_loss)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(contrastive_loss)(
            params,
            batch,
            num_heads=config.num_heads,
            temperature=temperature,
            compute_dtype=compute_dtype,
            remat=remat,
            objective=objective,
            kd_weight=kd_weight,
            teacher_temperature=teacher_temperature,
            corpus_kd_weight=corpus_kd_weight,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    param_sh = bert_param_shardings(
        {"layers": [None] * config.num_layers}, mesh
    )
    batch_sh = jax.tree.map(lambda _: batch_sharding(mesh), {
        "q_ids": 0, "q_mask": 0, "p_ids": 0, "p_mask": 0
    })
    repl = NamedSharding(mesh, P())

    # opt_state sharding mirrors params where shapes match; let XLA decide
    # elsewhere by only constraining params and batch.
    return jax.jit(
        step,
        in_shardings=(param_sh, None, batch_sh),
        out_shardings=(param_sh, None, repl),
    )
