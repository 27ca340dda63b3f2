"""Contrastive training loop: loss goes down, checkpoints resume exactly."""

import jax
import numpy as np
import pytest

from dial_rag_tpu.models.bert import BertConfig
from dial_rag_tpu.models.tokenizer import WordPieceTokenizer, build_test_vocab
from dial_rag_tpu.training.loop import (
    Checkpointer,
    TrainConfig,
    pairs_to_batches,
    train,
)

WORDS = [chr(c) for c in range(97, 123)]


@pytest.fixture(scope="module")
def tokenizer():
    return WordPieceTokenizer(vocab=build_test_vocab(WORDS))


def _pairs(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        w = rng.choice(WORDS, size=4)
        out.append((" ".join(w[:2]), " ".join(w)))
    return out


def test_pairs_to_batches_static_shapes(tokenizer):
    cfg = TrainConfig(batch_size=4, seq_len=32)
    batches = list(pairs_to_batches(tokenizer, _pairs(10), cfg))
    assert len(batches) == 2  # ragged tail dropped
    for b in batches:
        assert b["q_ids"].shape == b["p_ids"].shape
        assert b["q_ids"].shape[0] == 4


def test_training_reduces_loss(tokenizer):
    cfg = TrainConfig(
        batch_size=8,
        seq_len=32,
        learning_rate=1e-3,
        warmup_steps=2,
        total_steps=12,
        checkpoint_every=100,
    )
    params, losses = train(
        BertConfig.tiny(), cfg, _pairs(cfg.batch_size * 12), tokenizer
    )
    assert len(losses) == 12
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_checkpoint_save_restore_roundtrip(tokenizer, tmp_path):
    cfg = TrainConfig(
        batch_size=4,
        seq_len=32,
        total_steps=4,
        checkpoint_every=2,
        warmup_steps=1,
    )
    config = BertConfig.tiny()
    params1, _ = train(
        config,
        cfg,
        _pairs(cfg.batch_size * 4),
        tokenizer,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    assert ckpt.latest_step() == 4

    # resume: same config continues from step 4 and saves beyond it
    cfg2 = TrainConfig(
        batch_size=4,
        seq_len=32,
        total_steps=6,
        checkpoint_every=2,
        warmup_steps=1,
    )
    params2, losses2 = train(
        config,
        cfg2,
        _pairs(cfg.batch_size * 6, seed=1),
        tokenizer,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert len(losses2) == 2  # only steps 5 and 6 ran
    assert Checkpointer(str(tmp_path / "ckpt")).latest_step() == 6


def test_restore_is_exact(tokenizer, tmp_path):
    cfg = TrainConfig(
        batch_size=4, seq_len=32, total_steps=2, checkpoint_every=10,
        warmup_steps=1,
    )
    config = BertConfig.tiny()
    params, _ = train(
        config,
        cfg,
        _pairs(8),
        tokenizer,
        checkpoint_dir=str(tmp_path / "c2"),
    )
    ckpt = Checkpointer(str(tmp_path / "c2"))
    from dial_rag_tpu.models.bert import init_params
    from dial_rag_tpu.training.contrastive import create_train_state
    from dial_rag_tpu.training.loop import make_optimizer

    like = init_params(jax.random.PRNGKey(0), config)
    opt_like = create_train_state(like, make_optimizer(cfg)).opt_state
    step, restored, _ = ckpt.restore(like, opt_like)
    assert step == 2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_final_step_on_checkpoint_boundary_no_double_save(
    tokenizer, tmp_path
):
    """total_steps a multiple of checkpoint_every: the in-loop save and
    the final save target the same step; orbax raises on duplicates."""
    cfg = TrainConfig(
        batch_size=4,
        seq_len=32,
        total_steps=4,
        checkpoint_every=4,
        warmup_steps=1,
    )
    train(
        BertConfig.tiny(),
        cfg,
        _pairs(cfg.batch_size * 4),
        tokenizer,
        checkpoint_dir=str(tmp_path / "b"),
    )
    assert Checkpointer(str(tmp_path / "b")).latest_step() == 4


def test_jsonl_pairs_reader(tmp_path):
    import json as _json

    from dial_rag_tpu.training.data import jsonl_pairs

    for shard in range(3):
        with open(tmp_path / f"pairs-{shard}.jsonl", "w") as f:
            for i in range(10):
                f.write(
                    _json.dumps(
                        {"query": f"q{shard}-{i}", "passage": f"p{shard}-{i}"}
                    )
                    + "\n"
                )
            f.write("not json\n")  # malformed lines are skipped
    pattern = str(tmp_path / "pairs-*.jsonl")
    a = list(jsonl_pairs(pattern, seed=7, shuffle_buffer=8))
    b = list(jsonl_pairs(pattern, seed=7, shuffle_buffer=8))
    assert a == b  # deterministic given the seed
    assert len(a) == 30
    assert sorted(a) != a  # actually shuffled
    assert set(a) == {
        (f"q{s}-{i}", f"p{s}-{i}") for s in range(3) for i in range(10)
    }
    # epochs
    two = list(jsonl_pairs(pattern, seed=7, shuffle_buffer=0, repeat=2))
    assert len(two) == 60

    import pytest

    with pytest.raises(FileNotFoundError):
        next(jsonl_pairs(str(tmp_path / "missing-*.jsonl")))


def test_train_from_jsonl(tmp_path, tokenizer):
    import json as _json

    from dial_rag_tpu.training.data import jsonl_pairs

    with open(tmp_path / "pairs.jsonl", "w") as f:
        for q, p in _pairs(40):
            f.write(_json.dumps({"query": q, "passage": p}) + "\n")
    cfg = TrainConfig(
        batch_size=8, seq_len=32, total_steps=3, warmup_steps=1,
        checkpoint_every=100,
    )
    params, losses = train(
        BertConfig.tiny(),
        cfg,
        jsonl_pairs(str(tmp_path / "pairs.jsonl"), shuffle_buffer=16),
        tokenizer,
    )
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_remat_grads_match_exact():
    """jax.checkpoint must not change gradients — only when/where
    activations are (re)computed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dial_rag_tpu.models.bert import BertConfig, init_params
    from dial_rag_tpu.training.contrastive import contrastive_loss

    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    batch = {
        "q_ids": rng.integers(5, config.vocab_size, (4, 16)).astype("int32"),
        "q_mask": np.ones((4, 16), "int32"),
        "p_ids": rng.integers(5, config.vocab_size, (4, 16)).astype("int32"),
        "p_mask": np.ones((4, 16), "int32"),
    }

    def grads(remat):
        return jax.grad(
            lambda p: contrastive_loss(
                p, batch, num_heads=config.num_heads, remat=remat
            )
        )(params)

    g_plain = grads(False)
    g_remat = grads(True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        g_plain,
        g_remat,
    )


def test_train_with_remat_converges_one_step(tokenizer):
    cfg = TrainConfig(
        batch_size=4, seq_len=16, total_steps=2, warmup_steps=1, remat=True
    )
    _, losses = train(BertConfig.tiny(), cfg, _pairs(8), tokenizer)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_maxsim_pairwise_matches_numpy():
    """The differentiable all-pairs MaxSim logits must equal the serving
    scorer's semantics (sum over real q tokens of max over real p
    tokens)."""
    import jax.numpy as jnp

    from dial_rag_tpu.training.contrastive import maxsim_scores_pairwise

    rng = np.random.default_rng(0)
    b, c, s, d = 3, 4, 6, 8
    q = rng.standard_normal((b, s, d)).astype(np.float32)
    p = rng.standard_normal((c, s, d)).astype(np.float32)
    q_mask = (rng.random((b, s)) < 0.7).astype(np.int32)
    p_mask = (rng.random((c, s)) < 0.7).astype(np.int32)
    q_mask[:, 0] = 1
    p_mask[:, 0] = 1

    got = np.asarray(
        maxsim_scores_pairwise(
            jnp.asarray(q), jnp.asarray(q_mask),
            jnp.asarray(p), jnp.asarray(p_mask),
        )
    )
    expected = np.zeros((b, c), np.float32)
    for i in range(b):
        for j in range(c):
            total = 0.0
            for si in range(s):
                if not q_mask[i, si]:
                    continue
                sims = [
                    float(q[i, si] @ p[j, ti])
                    for ti in range(s)
                    if p_mask[j, ti]
                ]
                total += max(sims)
            expected[i, j] = total
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_maxsim_training_reduces_loss(tokenizer):
    """The late-interaction objective trains end to end (grads flow
    through the token encodings and the max) and the loss drops."""
    cfg = TrainConfig(
        batch_size=8,
        seq_len=32,
        total_steps=12,
        warmup_steps=2,
        learning_rate=1e-3,
        checkpoint_every=1000,
        objective="maxsim",
    )
    model = BertConfig.tiny()
    _, losses = train(model, cfg, _pairs(200), tokenizer)
    assert len(losses) == 12
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_train_config_temperature_resolves_per_objective():
    """temperature=None (the default) resolves to the per-objective
    calibration: 0.02 for cosine CLS logits, 1.0 for MaxSim logits
    (0.02 there causes measured held-out collapse — advisor finding)."""
    from dial_rag_tpu.training.loop import TrainConfig

    assert TrainConfig().temperature == 0.02
    assert TrainConfig(objective="maxsim").temperature == 1.0
    assert TrainConfig(objective="maxsim", temperature=0.5).temperature == 0.5
    with pytest.raises(ValueError):
        TrainConfig(objective="colbert")


def test_maxsim_pairwise_zero_token_passage_is_finite():
    """A passage with zero real tokens must score a large-but-finite
    floor, not -inf (which would NaN the loss_pq softmax row)."""
    import jax.numpy as jnp

    from dial_rag_tpu.training.contrastive import maxsim_scores_pairwise

    q_tok = jnp.ones((2, 3, 4))
    q_mask = jnp.ones((2, 3), jnp.int32)
    p_tok = jnp.ones((2, 3, 4))
    p_mask = jnp.asarray([[1, 1, 0], [0, 0, 0]], jnp.int32)
    scores = maxsim_scores_pairwise(q_tok, q_mask, p_tok, p_mask)
    assert bool(jnp.all(jnp.isfinite(scores)))
    # zero-token passage loses to any real passage for every query
    assert bool(jnp.all(scores[:, 1] < scores[:, 0]))


def _clustered_pairs(n_clusters=6, per_cluster=4, queries_per=3):
    """Synthetic sources arranged in clusters: source key = cluster *
    per_cluster + member; neighbours = the other members of the same
    cluster (hardest first by member index)."""
    pairs, neighbors = [], {}
    for c in range(n_clusters):
        members = [c * per_cluster + m for m in range(per_cluster)]
        for s in members:
            neighbors[s] = [o for o in members if o != s]
            for qi in range(queries_per):
                pairs.append((f"q{s}_{qi}", f"passage{s}"))
    return pairs, neighbors


def test_hard_negative_stream_batches_are_positive_disjoint():
    from dial_rag_tpu.training.data import hard_negative_stream

    pairs, neighbors = _clustered_pairs()
    bs, n_batches = 4, 12
    stream = hard_negative_stream(
        pairs, bs, n_batches, neighbors, seed=0,
        pos_key=lambda p: int(p.removeprefix("passage")),
    )
    assert len(stream) == bs * n_batches
    for b in range(n_batches):
        batch = stream[b * bs : (b + 1) * bs]
        sources = {p for _, p in batch}
        assert len(sources) == bs  # no duplicate positives in a batch


def test_hard_negative_stream_clusters_batches():
    """With cluster-structured neighbours and batch_size == cluster
    size, every batch must be exactly one cluster (the seed plus its
    neighbours) — the hard-negative construction, not uniform draws."""
    from dial_rag_tpu.training.data import hard_negative_stream

    pairs, neighbors = _clustered_pairs(n_clusters=6, per_cluster=4)
    bs, n_batches = 4, 20
    key = lambda p: int(p.removeprefix("passage"))  # noqa: E731
    stream = hard_negative_stream(
        pairs, bs, n_batches, neighbors, seed=1, pos_key=key
    )
    for b in range(n_batches):
        batch = stream[b * bs : (b + 1) * bs]
        clusters = {key(p) // 4 for _, p in batch}
        assert len(clusters) == 1


def test_hard_negative_stream_pads_short_neighbour_lists():
    """Sources with no neighbours still form full, positive-disjoint
    batches (random fill)."""
    from dial_rag_tpu.training.data import hard_negative_stream

    pairs, _ = _clustered_pairs(n_clusters=3, per_cluster=4)
    bs, n_batches = 8, 6
    stream = hard_negative_stream(
        pairs, bs, n_batches, neighbors={}, seed=2,
        pos_key=lambda p: int(p.removeprefix("passage")),
    )
    assert len(stream) == bs * n_batches
    for b in range(n_batches):
        batch = stream[b * bs : (b + 1) * bs]
        assert len({p for _, p in batch}) == bs


def test_hard_negative_stream_rotates_queries_and_is_deterministic():
    from dial_rag_tpu.training.data import hard_negative_stream

    pairs, neighbors = _clustered_pairs(queries_per=3)
    key = lambda p: int(p.removeprefix("passage"))  # noqa: E731
    a = hard_negative_stream(pairs, 4, 30, neighbors, seed=3, pos_key=key)
    b = hard_negative_stream(pairs, 4, 30, neighbors, seed=3, pos_key=key)
    assert a == b
    # every query view of a heavily-drawn source eventually appears
    qs = {q for q, p in a if key(p) == key(a[0][1])}
    assert len(qs) == 3


def test_mix_teacher_row_roundtrips_through_loss_softmax():
    """softmax(mix_teacher_row(a, b, tt) / tt) must equal the equal
    mixture of the two softened teacher distributions — the invariant
    that lets multi-teacher KD reuse the single-teacher loss path."""
    from tools.make_checkpoint import mix_teacher_row

    rng = np.random.default_rng(0)
    a = rng.normal(size=16).astype(np.float32) * 5
    b = rng.normal(size=16).astype(np.float32) * 5
    tt = 2.0
    mixed = mix_teacher_row(a, b, tt)

    def soft(x):
        e = np.exp((x - x.max()) / tt)
        return e / e.sum()

    want = 0.5 * (soft(a) + soft(b))
    got = np.exp((mixed - mixed.max()) / tt)
    got /= got.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bank_encoder_matches_single_vector_encode():
    """make_bank_encoder must reproduce _encode row-for-row (serving
    numerics), including when N is not a multiple of the scan block."""
    from dial_rag_tpu.training.contrastive import (
        _encode,
        make_bank_encoder,
    )

    config = BertConfig.tiny()
    from dial_rag_tpu.models.bert import init_params

    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(1)
    n, s = 11, 16  # n deliberately not a multiple of block=4
    ids = rng.integers(1, 50, size=(n, s)).astype(np.int32)
    mask = (rng.random((n, s)) > 0.2).astype(np.int32)
    mask[:, 0] = 1  # CLS always real
    bank = make_bank_encoder(config, block=4)(params, ids, mask)
    want = _encode(
        params, ids, mask, num_heads=config.num_heads,
        compute_dtype=np.float32,
    )
    assert bank.shape == (n, config.hidden_size)
    np.testing.assert_allclose(
        np.asarray(bank), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_corpus_kd_loss_mixes_exactly():
    """With a bank + teacher_corpus the loss must equal
    (1-w)*base + w*xent(q@bank/T, softmax(teacher/tt)) — checked
    against a hand-computed numpy value."""
    import jax.numpy as jnp

    from dial_rag_tpu.training.contrastive import (
        _encode,
        contrastive_loss,
    )

    config = BertConfig.tiny()
    from dial_rag_tpu.models.bert import init_params

    params = init_params(jax.random.PRNGKey(2), config)
    rng = np.random.default_rng(3)
    b, s, n_bank = 3, 12, 7
    batch = {
        "q_ids": rng.integers(1, 50, size=(b, s)).astype(np.int32),
        "q_mask": np.ones((b, s), np.int32),
        "p_ids": rng.integers(1, 50, size=(b, s)).astype(np.int32),
        "p_mask": np.ones((b, s), np.int32),
    }
    kw = dict(num_heads=config.num_heads, temperature=0.05)
    base = float(contrastive_loss(params, batch, **kw))
    bank = rng.standard_normal((n_bank, config.hidden_size)).astype(
        np.float32
    )
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    teacher = rng.standard_normal((b, n_bank)).astype(np.float32)
    tt, w = 2.0, 0.6
    full = {**batch, "bank_emb": bank, "teacher_corpus": teacher}
    got = float(
        contrastive_loss(
            params, full, teacher_temperature=tt, corpus_kd_weight=w, **kw
        )
    )
    q = np.asarray(
        _encode(
            params, batch["q_ids"], batch["q_mask"],
            num_heads=config.num_heads, compute_dtype=jnp.float32,
        )
    )
    logits = (q @ bank.T) / 0.05
    t = teacher / tt
    t = np.exp(t - t.max(axis=-1, keepdims=True))
    t /= t.sum(axis=-1, keepdims=True)
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1))
    lse += logits.max(-1)
    xent = float((-(t * logits).sum(-1) + lse).mean())
    np.testing.assert_allclose(got, (1 - w) * base + w * xent, rtol=1e-5)


def test_corpus_kd_rejects_maxsim_objective():
    from dial_rag_tpu.training.contrastive import contrastive_loss
    from dial_rag_tpu.models.bert import init_params

    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), config)
    batch = {
        "q_ids": np.ones((2, 8), np.int32),
        "q_mask": np.ones((2, 8), np.int32),
        "p_ids": np.ones((2, 8), np.int32),
        "p_mask": np.ones((2, 8), np.int32),
        "bank_emb": np.ones((3, config.hidden_size), np.float32),
        "teacher_corpus": np.ones((2, 3), np.float32),
    }
    with pytest.raises(ValueError, match="corpus distillation"):
        contrastive_loss(
            params, batch, num_heads=config.num_heads, objective="maxsim",
            temperature=1.0,
        )


def test_train_with_corpus_teacher_and_bank(tokenizer):
    """End-to-end loop smoke: corpus distillation trains (finite,
    decreasing loss) and the bank refresh path executes (refresh_every
    < total_steps). The teacher prefers each query's true positive, so
    the corpus-KD term should pull recall the right way."""
    pairs = _pairs(8 * 14, seed=5)
    corpus = sorted({p for _, p in pairs})
    pos_col = {p: i for i, p in enumerate(corpus)}
    ids, mask = tokenizer.encode_batch(corpus, max_len=32)

    def corpus_teacher(buf):
        rows = np.full((len(buf), len(corpus)), -5.0, np.float32)
        for i, (_, p) in enumerate(buf):
            rows[i, pos_col[p]] = 5.0
        return rows

    cfg = TrainConfig(
        batch_size=8,
        seq_len=32,
        learning_rate=1e-3,
        warmup_steps=2,
        total_steps=12,
        checkpoint_every=100,
        corpus_kd_weight=0.7,
        bank_refresh_every=4,
    )
    params, losses = train(
        BertConfig.tiny(), cfg, pairs, tokenizer,
        corpus_teacher=corpus_teacher, bank_tokens=(ids, mask),
    )
    assert len(losses) == 12
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_train_corpus_teacher_requires_bank():
    from dial_rag_tpu.training.loop import train

    with pytest.raises(ValueError, match="BOTH"):
        train(
            BertConfig.tiny(),
            TrainConfig(total_steps=1),
            [],
            WordPieceTokenizer(vocab=build_test_vocab(WORDS)),
            corpus_teacher=lambda buf: np.zeros((len(buf), 1)),
        )


def test_corpus_kd_live_columns_scatter_exact():
    """With bank_cols the loss must score queries against the bank with
    the batch positives' columns REPLACED by the live passage
    embeddings — equal to hand-scattering p into the bank."""
    import jax.numpy as jnp

    from dial_rag_tpu.training.contrastive import (
        _encode,
        contrastive_loss,
    )
    from dial_rag_tpu.models.bert import init_params

    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(4), config)
    rng = np.random.default_rng(5)
    b, s, n_bank = 3, 12, 7
    batch = {
        "q_ids": rng.integers(1, 50, size=(b, s)).astype(np.int32),
        "q_mask": np.ones((b, s), np.int32),
        "p_ids": rng.integers(1, 50, size=(b, s)).astype(np.int32),
        "p_mask": np.ones((b, s), np.int32),
    }
    bank = rng.standard_normal((n_bank, config.hidden_size)).astype(
        np.float32
    )
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    teacher = rng.standard_normal((b, n_bank)).astype(np.float32)
    cols = np.array([5, 0, 2], np.int32)
    kw = dict(num_heads=config.num_heads, temperature=0.05,
              teacher_temperature=2.0, corpus_kd_weight=1.0)
    live = float(contrastive_loss(
        params,
        {**batch, "bank_emb": bank, "teacher_corpus": teacher,
         "bank_cols": cols},
        **kw,
    ))
    p = np.asarray(_encode(
        params, batch["p_ids"], batch["p_mask"],
        num_heads=config.num_heads, compute_dtype=jnp.float32,
    ))
    scattered = bank.copy()
    scattered[cols] = p
    manual = float(contrastive_loss(
        params,
        {**batch, "bank_emb": scattered, "teacher_corpus": teacher},
        **kw,
    ))
    np.testing.assert_allclose(live, manual, rtol=1e-6)
    # and the doc side must actually receive gradient through the
    # live columns (the stop-grad bank alone gives it none)
    def loss_of(params):
        return contrastive_loss(
            params,
            {**batch, "bank_emb": bank, "teacher_corpus": teacher,
             "bank_cols": cols},
            **kw,
        )

    grads = jax.grad(loss_of)(params)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    assert float(np.abs(np.asarray(leaf)).max()) > 0


def test_morph_groups_and_perturb_are_stem_invariant():
    """morph_perturb swaps only corpus-attested surface forms sharing
    the serving stemmer's stem — every swap is BM25-invariant by
    construction (keywords_preprocess maps both forms to one term)."""
    from dial_rag_tpu.text.keywords import _stemmer
    from tools.make_checkpoint import morph_groups, morph_perturb

    stem = _stemmer()
    texts = [
        "The glaciers formed the valleys. Glacier ice forms slowly.",
        "Forming ranges takes time; the range rose as plates collided.",
        "Plate tectonics collide with mountains and mountain ranges.",
    ]
    groups = morph_groups(texts, stem)
    # only stems with >=2 attested forms become groups
    assert all(len(v) > 1 for v in groups.values())
    for s, forms in groups.items():
        assert all(stem(f) == s for f in forms)
        assert all(f == f.lower() and f.isalpha() for f in forms)

    rng = np.random.default_rng(0)
    sent = "The glaciers formed the valleys as plates collided."
    seen = set()
    for _ in range(20):
        mv = morph_perturb(sent, rng, stem, groups, p=0.9)
        if mv is None:
            continue
        seen.add(mv)
        assert mv != sent
        # stem sequence of content words is preserved word-for-word
        orig = [w.strip(".,;:!?") for w in sent.split()]
        pert = [w.strip(".,;:!?") for w in mv.split()]
        assert len(orig) == len(pert)
        for a, b in zip(orig, pert):
            assert stem(a.lower()) == stem(b.lower())
    assert seen  # the perturbation actually fires on this input


def test_ict_pairs_morph_aug_adds_views_only():
    """morph_aug=True must be additive: every baseline pair is still
    present, new pairs map to the same source chunks, and the flag off
    reproduces the byte-identical baseline (shipped-recipe safety)."""
    from tools.make_checkpoint import ict_pairs

    texts = [
        "The glaciers formed the valleys. Glacier ice forms slowly "
        "over centuries of snowfall and compaction in the mountains.",
        "Forming ranges takes geological time; the range rose as the "
        "African and European plates collided during the orogeny.",
    ]
    base, base_key = ict_pairs(texts, "q: ", seed=3)
    again, _ = ict_pairs(texts, "q: ", seed=3, morph_aug=False)
    assert base == again
    aug, aug_key = ict_pairs(texts, "q: ", seed=3, morph_aug=True)
    assert set(base) <= set(aug)
    assert len(aug) > len(base)
    for q, p in set(aug) - set(base):
        assert aug_key(p) in (0, 1)
