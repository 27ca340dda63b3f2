"""Fused whole-layer encoder blocks (ops/fused_encoder.py).

The kernels run in Pallas interpreter mode on the CPU test mesh; the
assertions pin them to the plain-jnp reference compositions that the
custom VJPs differentiate, and to the unfused bert_forward path.
Reference model being accelerated: the bge-small encoder the reference
runs via sentence-transformers (aidial_rag/embeddings/embeddings.py:38-66).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dial_rag_tpu.models.bert import BertConfig, BertEncoder, bert_forward, init_params
from dial_rag_tpu.ops.fused_encoder import (
    _attn_block_reference,
    _ffn_reference,
    _layer_reference,
    fused_attention_block,
    fused_ffn_block,
    fused_layer_block,
    supports_fused_block,
)


def _ffn_weights(rng, hid, inter, dtype=jnp.float32):
    ks = jax.random.split(rng, 4)
    return (
        (jax.random.normal(ks[0], (hid, inter)) * 0.05).astype(dtype),
        (jax.random.normal(ks[1], (inter,)) * 0.02).astype(dtype),
        (jax.random.normal(ks[2], (inter, hid)) * 0.05).astype(dtype),
        (jax.random.normal(ks[3], (hid,)) * 0.02).astype(dtype),
        jnp.ones((hid,), dtype),
        jnp.zeros((hid,), dtype),
    )


def _attn_weights(rng, hid, dtype=jnp.float32):
    ks = jax.random.split(rng, 4)
    return (
        (jax.random.normal(ks[0], (hid, 3 * hid)) * 0.05).astype(dtype),
        (jax.random.normal(ks[1], (3 * hid,)) * 0.02).astype(dtype),
        (jax.random.normal(ks[2], (hid, hid)) * 0.05).astype(dtype),
        (jax.random.normal(ks[3], (hid,)) * 0.02).astype(dtype),
        jnp.ones((hid,), dtype),
        jnp.zeros((hid,), dtype),
    )


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_ffn_block_matches_reference(dtype, atol):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64)).astype(dtype)
    w = _ffn_weights(rng, 64, 128)
    out = fused_ffn_block(x, *w)
    ref = _ffn_reference(x, *w)
    assert out.dtype == x.dtype and out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_ffn_block_odd_row_count_subdivides():
    # b*s not divisible by the default row block: the launcher halves
    # the block until it divides
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 12, 64))
    w = _ffn_weights(jax.random.PRNGKey(3), 64, 128)
    np.testing.assert_allclose(
        np.asarray(fused_ffn_block(x, *w)),
        np.asarray(_ffn_reference(x, *w)),
        atol=2e-5,
    )


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_attention_block_matches_reference(dtype, atol):
    hid, heads, b, s = 64, 4, 2, 24
    x = jax.random.normal(jax.random.PRNGKey(4), (b, s, hid)).astype(dtype)
    w = _attn_weights(jax.random.PRNGKey(5), hid)
    mask = jnp.ones((b, s), jnp.int32).at[1, s // 2 :].set(0)
    out = fused_attention_block(x, mask, *w, heads)
    ref = _attn_block_reference(x, mask, *w, heads)
    assert out.dtype == x.dtype and out.shape == x.shape
    # padding rows produce garbage in both paths; compare real tokens
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref[0], np.float32), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(out[1, : s // 2], np.float32),
        np.asarray(ref[1, : s // 2], np.float32),
        atol=atol,
    )


def test_ffn_block_gradients_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 64))
    w = _ffn_weights(jax.random.PRNGKey(7), 64, 128)

    def loss_fused(x, *w):
        return jnp.sum(jnp.sin(fused_ffn_block(x, *w)))

    def loss_ref(x, *w):
        return jnp.sum(jnp.sin(_ffn_reference(x, *w)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3))(x, *w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3))(x, *w)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_attention_block_gradients_match_reference():
    hid, heads, b, s = 64, 4, 2, 8
    x = jax.random.normal(jax.random.PRNGKey(8), (b, s, hid))
    w = _attn_weights(jax.random.PRNGKey(9), hid)
    mask = jnp.ones((b, s), jnp.int32)

    def loss_fused(x, *w):
        return jnp.sum(jnp.sin(fused_attention_block(x, mask, *w, heads)))

    def loss_ref(x, *w):
        return jnp.sum(jnp.sin(_attn_block_reference(x, mask, *w, heads)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3))(x, *w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3))(x, *w)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def _layer_weights(rng, hid, inter, dtype=jnp.float32):
    a = _attn_weights(rng, hid, dtype)
    f = _ffn_weights(jax.random.fold_in(rng, 1), hid, inter, dtype)
    return a + f


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 3e-5), (jnp.bfloat16, 4e-2)])
def test_layer_block_matches_reference(dtype, atol):
    hid, inter, heads, b, s = 64, 128, 4, 2, 24
    x = jax.random.normal(jax.random.PRNGKey(20), (b, s, hid)).astype(dtype)
    w = _layer_weights(jax.random.PRNGKey(21), hid, inter)
    mask = jnp.ones((b, s), jnp.int32).at[1, s // 2 :].set(0)
    out = fused_layer_block(x, mask, w, heads)
    ref = _layer_reference(x, mask, w, heads)
    assert out.dtype == x.dtype and out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref[0], np.float32), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(out[1, : s // 2], np.float32),
        np.asarray(ref[1, : s // 2], np.float32),
        atol=atol,
    )


def test_layer_block_gradients_match_reference():
    hid, inter, heads, b, s = 64, 128, 4, 2, 8
    x = jax.random.normal(jax.random.PRNGKey(22), (b, s, hid))
    w = _layer_weights(jax.random.PRNGKey(23), hid, inter)
    mask = jnp.ones((b, s), jnp.int32)

    def loss_fused(x, w):
        return jnp.sum(jnp.sin(fused_layer_block(x, mask, w, heads)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(_layer_reference(x, mask, w, heads)))

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), atol=1e-4, rtol=1e-3
    )
    for a, b_ in zip(gw_f, gw_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3
        )


@pytest.mark.parametrize("impl", ["fused", "fused_layer"])
def test_bert_forward_fused_matches_xla(impl):
    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(10), config)
    ids = jax.random.randint(jax.random.PRNGKey(11), (2, 32), 5, config.vocab_size)
    mask = jnp.ones_like(ids).at[1, 20:].set(0)
    kw = dict(num_heads=config.num_heads, compute_dtype=jnp.bfloat16, gelu="tanh")
    out_fused = bert_forward(params, ids, mask, attention_impl=impl, **kw)
    out_xla = bert_forward(params, ids, mask, attention_impl="xla", **kw)
    np.testing.assert_allclose(
        np.asarray(out_fused[0], np.float32),
        np.asarray(out_xla[0], np.float32),
        atol=6e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused[1, :20], np.float32),
        np.asarray(out_xla[1, :20], np.float32),
        atol=6e-2,
    )


def test_bert_forward_fused_rejects_unsupported_contracts():
    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(12), config)
    ids = jnp.zeros((1, 16), jnp.int32)
    mask = jnp.ones_like(ids)
    with pytest.raises(ValueError, match="tanh"):
        bert_forward(
            params, ids, mask,
            num_heads=config.num_heads, compute_dtype=jnp.float32,
            attention_impl="fused", gelu="exact",
        )
    assert not supports_fused_block(1024)


def test_encode_group_with_fused_blocks():
    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(13), config)
    enc = BertEncoder(
        config, compute_dtype=jnp.bfloat16, attention_impl="fused", gelu="tanh"
    )
    ids = jax.random.randint(jax.random.PRNGKey(14), (2, 3, 32), 5, config.vocab_size)
    mask = jnp.ones_like(ids)
    out = enc.encode_group(params, ids, mask)
    assert out.shape == (6, config.hidden_size)
    norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
