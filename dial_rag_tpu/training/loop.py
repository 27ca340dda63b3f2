"""Training loop with checkpoint/resume for the contrastive objective.

The reference has no training subsystem (its checkpointing is the index
cache — SURVEY §5); a production retrieval stack needs to fine-tune its
embedder on domain (query, passage) pairs. This loop drives
training/contrastive.py with:

- host-side tokenization of text pairs through the same WordPiece
  tokenizer the serving path uses (consistent vocab / buckets);
- orbax checkpoints of {params, opt_state, step} with resume-latest;
- optional (dp, tp) mesh sharding, identical to dryrun_multichip.
"""

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Iterator

import jax
import numpy as np
import optax

from dial_rag_tpu.models.bert import BertConfig, init_params
from dial_rag_tpu.models.tokenizer import WordPieceTokenizer
from dial_rag_tpu.training.contrastive import (
    create_train_state,
    make_train_step,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    seq_len: int = 128
    learning_rate: float = 2e-5
    warmup_steps: int = 100
    total_steps: int = 1000
    # InfoNCE temperature; None resolves per objective in __post_init__:
    # 0.02 for cosine-calibrated CLS logits in [-1, 1], 1.0 for MaxSim
    # logits (sums over ~query-length tokens, an order of magnitude
    # larger — 0.02 there causes measured held-out collapse)
    temperature: float | None = None
    checkpoint_every: int = 200
    seed: int = 0
    # rematerialize encoder layers in the backward: O(1)-layer
    # activation memory for ~1/3 extra FLOPs (long-seq / big batches)
    remat: bool = False
    # "cls" = single-vector bge-style representation (semantic retriever);
    # "maxsim" = token-level late-interaction representation
    objective: str = "cls"
    # lexical-distillation mix (active only when a teacher provides
    # per-batch scores): loss = (1-kd_weight)*InfoNCE + kd_weight*KD
    kd_weight: float = 0.5
    teacher_temperature: float = 4.0
    # corpus-level distillation (active only when train() gets
    # bank_tokens + a corpus_teacher): mix weight of the
    # full-corpus KD term and the stop-gradient passage-bank refresh
    # cadence in steps (ANCE/TAS-B-style cached embeddings)
    corpus_kd_weight: float = 0.5
    bank_refresh_every: int = 100

    def __post_init__(self):
        if self.objective not in ("cls", "maxsim"):
            raise ValueError(f"unknown objective {self.objective!r}")
        if self.bank_refresh_every < 1:
            raise ValueError(
                "bank_refresh_every must be >= 1 (the bank is encoded "
                "at step 0 and re-encoded every bank_refresh_every steps)"
            )
        if self.temperature is None:
            object.__setattr__(
                self,
                "temperature",
                0.02 if self.objective == "cls" else 1.0,
            )


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=config.learning_rate,
        warmup_steps=config.warmup_steps,
        decay_steps=max(config.total_steps, config.warmup_steps + 1),
    )
    return optax.adamw(schedule, weight_decay=0.01)


def pairs_to_batches(
    tokenizer: WordPieceTokenizer,
    pairs: Iterable[tuple[str, str]],
    config: TrainConfig,
    teacher=None,
    corpus_teacher=None,
) -> Iterator[dict]:
    """(query, passage) text pairs -> token batches, dropping the ragged
    tail (static shapes keep one compiled step). ``teacher(buf)`` may
    return a [B, B] score matrix attached as ``teacher_scores`` (the
    lexical-distillation target, contrastive.py); ``corpus_teacher(buf)``
    a [B, N] full-corpus score matrix attached as ``teacher_corpus``
    (the corpus-distillation target — train() adds the matching
    ``bank_emb``)."""
    buf: list[tuple[str, str]] = []
    for pair in pairs:
        buf.append(pair)
        if len(buf) == config.batch_size:
            q_ids, q_mask = tokenizer.encode_batch(
                [q for q, _ in buf], max_len=config.seq_len
            )
            p_ids, p_mask = tokenizer.encode_batch(
                [p for _, p in buf], max_len=config.seq_len
            )
            s = max(q_ids.shape[1], p_ids.shape[1])

            def pad(a):
                return np.pad(a, ((0, 0), (0, s - a.shape[1])))

            batch = {
                "q_ids": pad(q_ids),
                "q_mask": pad(q_mask),
                "p_ids": pad(p_ids),
                "p_mask": pad(p_mask),
            }
            if teacher is not None:
                batch["teacher_scores"] = np.asarray(
                    teacher(buf), dtype=np.float32
                )
            if corpus_teacher is not None:
                rows = corpus_teacher(buf)
                if isinstance(rows, tuple):
                    # (teacher_rows [B, N], live column ids [B]): the
                    # columns let the loss scatter the batch's live
                    # passage embeddings into the bank (doc-side
                    # gradient — see contrastive.py)
                    rows, cols = rows
                    cols = np.asarray(cols, dtype=np.int32)
                    if len(np.unique(cols)) != len(cols):
                        # duplicate columns would make the live scatter
                        # keep an arbitrary competing row — silent wrong
                        # gradients. Positive-disjoint batches guarantee
                        # uniqueness; reject anything else loudly.
                        raise ValueError(
                            "corpus_teacher returned duplicate bank "
                            "columns in one batch; build batches "
                            "positive-disjoint at pos_key granularity"
                        )
                    batch["bank_cols"] = cols
                batch["teacher_corpus"] = np.asarray(
                    rows, dtype=np.float32
                )
            yield batch
            buf = []


class Checkpointer:
    """Orbax-backed save/restore of {params, opt_state, step}."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(max_to_keep=3)
        )

    def save(self, step: int, params, opt_state) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, params_like, opt_state_like):
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return step, restored["params"], restored["opt_state"]


def train(
    model_config: BertConfig,
    train_config: TrainConfig,
    pairs: Iterable[tuple[str, str]],
    tokenizer: WordPieceTokenizer,
    mesh=None,
    checkpoint_dir: str | None = None,
    init: dict | None = None,
    teacher=None,
    corpus_teacher=None,
    bank_tokens: tuple | None = None,
):
    """Run the loop; returns (params, losses). Resumes from the latest
    checkpoint in ``checkpoint_dir`` when one exists.

    ``corpus_teacher(buf) -> [B, N]`` + ``bank_tokens`` (the corpus's
    (ids, mask) token arrays, [N, S]) enable corpus-level distillation:
    every ``bank_refresh_every`` steps the full corpus is re-encoded
    with the CURRENT params into a stop-gradient embedding bank, and
    each step distills the teacher's [B, N] score rows into the
    student's query-vs-bank logits (contrastive.py)."""
    optimizer = make_optimizer(train_config)
    params = init or init_params(
        jax.random.PRNGKey(train_config.seed), model_config
    )
    state = create_train_state(params, optimizer)
    params, opt_state = state.params, state.opt_state
    start_step = 0

    ckpt = Checkpointer(checkpoint_dir) if checkpoint_dir else None
    if ckpt is not None:
        restored = ckpt.restore(params, opt_state)
        if restored is not None:
            start_step, params, opt_state = restored
            logger.info(f"resumed from step {start_step}")

    if mesh is not None:
        from dial_rag_tpu.parallel.mesh import bert_param_shardings

        params = jax.device_put(params, bert_param_shardings(params, mesh))

    if (teacher is not None or corpus_teacher is not None) and mesh is not None:
        raise NotImplementedError(
            "teacher distillation is single-chip for now"
        )
    if (corpus_teacher is None) != (bank_tokens is None):
        raise ValueError(
            "corpus distillation needs BOTH corpus_teacher and bank_tokens"
        )
    step_fn = make_train_step(
        model_config,
        optimizer,
        mesh=mesh,
        temperature=train_config.temperature,
        remat=train_config.remat,
        objective=train_config.objective,
        kd_weight=train_config.kd_weight,
        teacher_temperature=train_config.teacher_temperature,
        corpus_kd_weight=train_config.corpus_kd_weight,
    )

    bank_emb = None
    encode_bank = None
    if bank_tokens is not None:
        import jax.numpy as jnp

        from dial_rag_tpu.training.contrastive import make_bank_encoder

        encode_bank = make_bank_encoder(model_config)
        bank_ids = jnp.asarray(bank_tokens[0])
        bank_mask = jnp.asarray(bank_tokens[1])

    losses = []  # device scalars; converted once at the end (a float()
    # per step would synchronize host and device every iteration)
    step = start_step
    last_saved = ckpt.latest_step() if ckpt is not None else None
    batches = pairs_to_batches(
        tokenizer,
        pairs,
        train_config,
        teacher=teacher,
        corpus_teacher=corpus_teacher,
    )
    # resume continues the data stream where the checkpointed run left
    # off; without the skip, the first start_step batches are re-trained
    for _ in range(start_step):
        if next(batches, None) is None:
            break
    for batch in batches:
        if step >= train_config.total_steps:
            break
        if encode_bank is not None:
            if bank_emb is None or step % train_config.bank_refresh_every == 0:
                # stop-gradient refresh: re-encode the corpus with the
                # CURRENT params; stays a device array (no H2D per step)
                bank_emb = encode_bank(params, bank_ids, bank_mask)
            batch["bank_emb"] = bank_emb
        params, opt_state, loss = step_fn(params, opt_state, batch)
        step += 1
        losses.append(loss)
        if step % 1000 == 0:
            # heartbeat only — the step counter is host state, so this
            # never synchronizes with the device; long remote-tunnel runs
            # need SOME output to tell a slow compile from a hung link
            print(f"train step {step}/{train_config.total_steps}", flush=True)
        if ckpt is not None and step % train_config.checkpoint_every == 0:
            ckpt.save(step, jax.device_get(params), jax.device_get(opt_state))
            last_saved = step
    if ckpt is not None and step > start_step and step != last_saved:
        ckpt.save(step, jax.device_get(params), jax.device_get(opt_state))
    return params, [float(l) for l in losses]
