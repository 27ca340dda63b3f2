"""JAX BERT encoder parity vs HF transformers BertModel (torch, CPU).

No network: a small random BertModel is instantiated from a config, its
state dict is mapped into our pytree, and the outputs are compared. This
covers the weight-name mapping, attention masking, GELU/LayerNorm
numerics, and the bge CLS+normalize pooling contract
(SURVEY.md §7 hard part 1).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dial_rag_tpu.models.bert import (
    BertConfig,
    BertEncoder,
    bert_forward,
    load_hf_weights,
)

CFG = BertConfig(
    vocab_size=512,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=96,
)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def params(hf_model):
    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return load_hf_weights(state, CFG)


def _random_batch(rng, b, s):
    ids = rng.integers(5, CFG.vocab_size, size=(b, s)).astype(np.int64)
    lengths = rng.integers(2, s + 1, size=(b,))
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int64)
    ids = np.where(mask == 1, ids, 0)
    return ids, mask


def test_hidden_states_match(hf_model, params):
    rng = np.random.default_rng(1)
    ids, mask = _random_batch(rng, 4, 24)

    with torch.no_grad():
        expected = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    got = np.asarray(
        bert_forward(
            params,
            np.asarray(ids, np.int32),
            np.asarray(mask, np.int32),
            num_heads=CFG.num_heads,
        )
    )
    # compare only unpadded positions (HF computes garbage on padded ones too,
    # but they are masked out of attention either way)
    # f32 rounding-order differences between oneDNN (torch) and XLA matmuls
    # accumulate through the layer stack on random-init weights; ~5e-4 is
    # pure float noise (embeddings alone match to 1e-6).
    sel = mask.astype(bool)
    np.testing.assert_allclose(got[sel], expected[sel], atol=2e-3, rtol=1e-3)


def test_cls_pooling_and_normalization(hf_model, params):
    rng = np.random.default_rng(2)
    ids, mask = _random_batch(rng, 3, 16)

    with torch.no_grad():
        hidden = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    cls = hidden[:, 0, :]
    expected = cls / np.linalg.norm(cls, axis=1, keepdims=True)

    enc = BertEncoder(CFG)
    got = np.asarray(enc.encode(params, ids.astype(np.int32), mask.astype(np.int32)))
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)
    cos = (got * expected).sum(axis=1)
    assert (cos > 0.999999).all(), cos
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), np.ones(3), atol=1e-6
    )


def test_padding_invariance(params):
    """Embeddings must not change when the batch is padded to a longer bucket."""
    rng = np.random.default_rng(3)
    ids, mask = _random_batch(rng, 2, 16)
    enc = BertEncoder(CFG)

    short = np.asarray(enc.encode(params, ids, mask))
    pad = np.zeros((2, 16), dtype=np.int64)
    long_ids = np.concatenate([ids, pad], axis=1)
    long_mask = np.concatenate([mask, pad], axis=1)
    long = np.asarray(enc.encode(params, long_ids, long_mask))
    np.testing.assert_allclose(short, long, atol=1e-5)


def test_bf16_compute_close(params):
    rng = np.random.default_rng(4)
    ids, mask = _random_batch(rng, 2, 16)
    f32 = np.asarray(BertEncoder(CFG).encode(params, ids, mask))
    import jax.numpy as jnp

    bf16 = np.asarray(
        BertEncoder(CFG, compute_dtype=jnp.bfloat16).encode(params, ids, mask)
    )
    # normalized vectors: cosine similarity should stay very high
    cos = (f32 * bf16).sum(axis=1)
    assert (cos > 0.995).all(), cos


def test_gelu_auto_semantics(params):
    """gelu='auto' resolves to the exact-erf parity path under f32
    compute (bit-identical to gelu='exact') and to the tanh
    approximation under bf16, where the approximation error (~3e-4)
    sits below bf16 roundoff — embeddings stay cosine-close to f32."""
    rng = np.random.default_rng(5)
    ids, mask = _random_batch(rng, 2, 16)

    f32_auto = np.asarray(BertEncoder(CFG).encode(params, ids, mask))
    f32_exact = np.asarray(
        BertEncoder(CFG, gelu="exact").encode(params, ids, mask)
    )
    np.testing.assert_array_equal(f32_auto, f32_exact)

    bf16_auto = np.asarray(
        BertEncoder(CFG, compute_dtype=jnp.bfloat16).encode(params, ids, mask)
    )
    bf16_tanh = np.asarray(
        BertEncoder(CFG, compute_dtype=jnp.bfloat16, gelu="tanh").encode(
            params, ids, mask
        )
    )
    np.testing.assert_array_equal(bf16_auto, bf16_tanh)
    cos = (f32_exact * bf16_auto).sum(axis=1)
    assert (cos > 0.995).all(), cos


def test_from_hf_checkpoint_end_to_end(tmp_path):
    """The production loading path: an HF BertModel checkpoint directory
    (config.json + model.safetensors + vocab.txt) loads into the
    embedder and matches transformers' CLS pooling on real text."""
    import json

    import torch
    import transformers
    from safetensors.torch import save_file

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    hf_cfg = transformers.BertConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg)
    model.eval()

    vocab_tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        chr(c) for c in range(97, 123)
    ] + [f"##{chr(c)}" for c in range(97, 123)]
    vocab_tokens += [f"tok{i}" for i in range(64 - len(vocab_tokens))]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab_tokens) + "\n")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )

    embedder = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path), compute_dtype=jnp.float32
    )
    assert embedder.dim == 32
    text = "ab cd efg"
    ours = embedder.embed_documents([text])[0]

    ids, mask = embedder.tokenizer.encode_batch([text], max_len=64)
    with torch.no_grad():
        hf_out = model(
            input_ids=torch.from_numpy(ids.astype("int64")),
            attention_mask=torch.from_numpy(mask.astype("int64")),
        ).last_hidden_state[0, 0]
    hf_cls = torch.nn.functional.normalize(hf_out, dim=-1).numpy()
    np.testing.assert_allclose(ours, hf_cls, atol=2e-5)


def _tiny_hf_bert(seed=0):
    hf_cfg = transformers.BertConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(seed)
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return hf_cfg, model


def _write_vocab(path):
    vocab_tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        chr(c) for c in range(97, 123)
    ] + [f"##{chr(c)}" for c in range(97, 123)]
    vocab_tokens += [f"tok{i}" for i in range(64 - len(vocab_tokens))]
    path.write_text("\n".join(vocab_tokens) + "\n")


def test_from_sentence_transformers_layout(tmp_path):
    """The layout the reference actually ships
    (SentenceTransformer.save(): modules.json + root transformer +
    1_Pooling/config.json + sentence_bert_config.json — reference
    download_model.py) loads with cls pooling and the saved
    max_seq_length."""
    import json

    from safetensors.torch import save_file

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    hf_cfg, model = _tiny_hf_bert()
    _write_vocab(tmp_path / "vocab.txt")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "modules.json").write_text(
        json.dumps(
            [
                {
                    "idx": 0,
                    "name": "0",
                    "path": "",
                    "type": "sentence_transformers.models.Transformer",
                },
                {
                    "idx": 1,
                    "name": "1",
                    "path": "1_Pooling",
                    "type": "sentence_transformers.models.Pooling",
                },
            ]
        )
    )
    (tmp_path / "1_Pooling").mkdir()
    (tmp_path / "1_Pooling" / "config.json").write_text(
        json.dumps(
            {
                "word_embedding_dimension": 32,
                "pooling_mode_cls_token": True,
                "pooling_mode_mean_tokens": False,
            }
        )
    )
    (tmp_path / "sentence_bert_config.json").write_text(
        json.dumps({"max_seq_length": 48})
    )

    embedder = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path), compute_dtype=jnp.float32
    )
    assert embedder.max_len == 48  # from sentence_bert_config.json
    assert embedder.encoder.pooling == "cls"

    text = "ab cd efg"
    ours = embedder.embed_documents([text])[0]
    ids, mask = embedder.tokenizer.encode_batch([text], max_len=48)
    with torch.no_grad():
        hf_out = model(
            input_ids=torch.from_numpy(ids.astype("int64")),
            attention_mask=torch.from_numpy(mask.astype("int64")),
        ).last_hidden_state[0, 0]
    expected = torch.nn.functional.normalize(hf_out, dim=-1).numpy()
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_mean_pooling_and_torch_bin_fallback(tmp_path):
    """Mean-token pooling (the other sentence-transformers mode) from a
    pytorch_model.bin-only checkpoint matches torch's mask-weighted
    mean + normalize."""
    import json

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    hf_cfg, model = _tiny_hf_bert(seed=3)
    _write_vocab(tmp_path / "vocab.txt")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    torch.save(model.state_dict(), str(tmp_path / "pytorch_model.bin"))
    (tmp_path / "modules.json").write_text(
        json.dumps(
            [
                {
                    "path": "",
                    "type": "sentence_transformers.models.Transformer",
                },
                {
                    "path": "1_Pooling",
                    "type": "sentence_transformers.models.Pooling",
                },
            ]
        )
    )
    (tmp_path / "1_Pooling").mkdir()
    (tmp_path / "1_Pooling" / "config.json").write_text(
        json.dumps(
            {
                "pooling_mode_cls_token": False,
                "pooling_mode_mean_tokens": True,
            }
        )
    )

    embedder = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path), compute_dtype=jnp.float32
    )
    assert embedder.encoder.pooling == "mean"

    text = "abc de fgh ij"
    ours = embedder.embed_documents([text])[0]
    ids, mask = embedder.tokenizer.encode_batch([text], max_len=512)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids.astype("int64")),
            attention_mask=torch.from_numpy(mask.astype("int64")),
        ).last_hidden_state[0]
    m = torch.from_numpy(mask.astype("float32"))[0, :, None]
    pooled = (hidden * m).sum(0) / m.sum(0).clamp(min=1e-9)
    expected = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_idf_pooling_checkpoint(tmp_path):
    """``idf_pooling.npz`` next to the weights switches the loader to
    idf-weighted mean pooling over per-token L2-normalized hidden
    states (the single-vector serving mode for a MaxSim-trained trunk,
    minted by tools/make_idf_pooling.py), drops the bge query
    instruction, and matches a manual numpy pool of the HF states."""
    import json

    from safetensors.torch import save_file

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    hf_cfg, model = _tiny_hf_bert()
    _write_vocab(tmp_path / "vocab.txt")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    rng = np.random.default_rng(5)
    weights = (rng.random(64) + 0.05).astype(np.float32)
    np.savez(tmp_path / "idf_pooling.npz", weights=weights)

    embedder = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path), compute_dtype=jnp.float32
    )
    assert embedder.encoder.pooling == "idf"
    assert embedder.query_instruction == ""

    text = "ab cd efg"
    ours = embedder.embed_documents([text])[0]

    ids, mask = embedder.tokenizer.encode_batch([text], max_len=64)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids.astype("int64")),
            attention_mask=torch.from_numpy(mask.astype("int64")),
        ).last_hidden_state[0].numpy()
    t = int(mask[0].sum())
    tok = hidden[:t] / np.linalg.norm(hidden[:t], axis=1, keepdims=True)
    w = weights[ids[0, :t]]
    pooled = (w[:, None] * tok).sum(0)
    expected = pooled / np.linalg.norm(pooled)
    np.testing.assert_allclose(ours, expected, atol=2e-5)

    # query path shares the pooling and carries NO instruction prefix
    # (instruction tokens are rare in document corpora -> high idf ->
    # they would dominate every query vector)
    q = embedder.embed_query("ab cd efg")
    np.testing.assert_allclose(q, expected, atol=2e-5)


def test_idf_pooling_vocab_mismatch_rejected(tmp_path):
    """A weight table whose length disagrees with the model vocab is a
    corrupt artifact: clean ValueError, not a silent misgather."""
    import json

    import pytest as _pytest
    from safetensors.torch import save_file

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    hf_cfg, model = _tiny_hf_bert()
    _write_vocab(tmp_path / "vocab.txt")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    np.savez(
        tmp_path / "idf_pooling.npz",
        weights=np.ones(100, dtype=np.float32),
    )
    with _pytest.raises(ValueError, match="idf_pooling"):
        BgeEmbedder.from_hf_checkpoint(str(tmp_path))


def _write_checkpoint(dirpath, seed=0):
    import json

    from safetensors.torch import save_file

    hf_cfg, model = _tiny_hf_bert(seed=seed)
    dirpath.mkdir(parents=True, exist_ok=True)
    _write_vocab(dirpath / "vocab.txt")
    (dirpath / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(dirpath / "model.safetensors"),
    )


def test_model_identity_contract(tmp_path):
    """model_id is the index-invalidation key. Contract: (1) the SAME
    checkpoint content mounted at a different path keeps its identity
    (no surprise full re-index on a docker-vs-local mount change);
    (2) changing the tokenizer vocab alone changes the identity even
    with byte-identical weights (vocab defines the token space the
    index was built in); (3) from_random identities distinguish seeds
    and configs (invalidation works in test/bench paths too)."""
    import dataclasses

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.models.bert import BertConfig

    _write_checkpoint(tmp_path / "mount_a" / "ckpt")
    # a DIFFERENT basename too: docker_compose_local mounts
    # checkpoints/alps-semantic as /embeddings_model/bge-small-en, so
    # even the directory name must not enter the identity
    _write_checkpoint(tmp_path / "mount_b" / "bge-small-en")
    id_a = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path / "mount_a" / "ckpt"), compute_dtype=jnp.float32
    ).model_id
    id_b = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path / "mount_b" / "bge-small-en"), compute_dtype=jnp.float32
    ).model_id
    assert id_a == id_b  # identical content, different mount paths

    # vocab.txt changes the embedding of a text with identical weights
    vocab_path = tmp_path / "mount_a" / "ckpt" / "vocab.txt"
    vocab_path.write_text(vocab_path.read_text().replace("tok0", "zok0"))
    id_a2 = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path / "mount_a" / "ckpt"), compute_dtype=jnp.float32
    ).model_id
    assert id_a2 != id_a

    assert (
        BgeEmbedder.from_random(seed=0).model_id
        != BgeEmbedder.from_random(seed=1).model_id
    )
    # different vocab CONTENTS (same size) change the token space and
    # must change the identity
    from dial_rag_tpu.models.tokenizer import build_test_vocab

    assert (
        BgeEmbedder.from_random(
            seed=0, vocab=build_test_vocab(["alpha", "beta"])
        ).model_id
        != BgeEmbedder.from_random(
            seed=0, vocab=build_test_vocab(["gamma", "delta"])
        ).model_id
    )
    assert (
        BgeEmbedder.from_random(seed=0).model_id
        != BgeEmbedder.from_random(
            seed=0, config=dataclasses.replace(BertConfig.tiny(), num_layers=1)
        ).model_id
    )


def test_model_id_covers_pooling_mode_and_max_len(tmp_path):
    """Pooling mode (1_Pooling/config.json) and max_seq_length
    (sentence_bert_config.json) change the embedding of every text but
    live outside the hashed weight/vocab/config files — the content
    digest must fold the DERIVED values in, so an in-place pooling or
    seq-length edit invalidates persisted indexes."""
    import json

    from safetensors.torch import save_file

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    hf_cfg, model = _tiny_hf_bert(seed=5)
    _write_vocab(tmp_path / "vocab.txt")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "modules.json").write_text(
        json.dumps(
            [
                {
                    "path": "",
                    "type": "sentence_transformers.models.Transformer",
                },
                {
                    "path": "1_Pooling",
                    "type": "sentence_transformers.models.Pooling",
                },
            ]
        )
    )
    (tmp_path / "1_Pooling").mkdir()

    def pool_cfg(cls_mode: bool):
        (tmp_path / "1_Pooling" / "config.json").write_text(
            json.dumps(
                {
                    "pooling_mode_cls_token": cls_mode,
                    "pooling_mode_mean_tokens": not cls_mode,
                }
            )
        )

    def st_cfg(max_len: int):
        (tmp_path / "sentence_bert_config.json").write_text(
            json.dumps({"max_seq_length": max_len})
        )

    pool_cfg(True)
    st_cfg(48)
    base = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path), compute_dtype=jnp.float32
    ).model_id
    # identical tree -> identical identity
    assert (
        BgeEmbedder.from_hf_checkpoint(
            str(tmp_path), compute_dtype=jnp.float32
        ).model_id
        == base
    )

    pool_cfg(False)  # cls -> mean, weight files untouched
    mean_id = BgeEmbedder.from_hf_checkpoint(
        str(tmp_path), compute_dtype=jnp.float32
    ).model_id
    assert mean_id != base

    pool_cfg(True)
    st_cfg(64)  # max_seq_length change, weight files untouched
    assert (
        BgeEmbedder.from_hf_checkpoint(
            str(tmp_path), compute_dtype=jnp.float32
        ).model_id
        != base
    )
