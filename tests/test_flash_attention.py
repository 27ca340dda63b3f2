"""Parity of the fused Pallas attention kernel vs the XLA reference path.

Runs in interpreter mode on the CPU test mesh; the same kernel compiles
for TPU. Mirrors the tier-1 numeric-parity strategy of the reference's
test_embeddings_metrics.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dial_rag_tpu.models.bert import BertConfig, BertEncoder, init_params, _xla_attention
from dial_rag_tpu.ops.flash_attention import flash_attention


def _random_qkv(rng, b, h, s, dh, dtype):
    shape = (b, h, s, dh)
    q = rng.standard_normal(shape).astype(np.float32)
    k = rng.standard_normal(shape).astype(np.float32)
    v = rng.standard_normal(shape).astype(np.float32)
    return (
        jnp.asarray(q, dtype),
        jnp.asarray(k, dtype),
        jnp.asarray(v, dtype),
    )


def _xla_ref(q, k, v, mask):
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
    return _xla_attention(q, k, v, bias[:, None, None, :])


@pytest.mark.parametrize("s", [16, 64, 128])
def test_matches_xla_f32(s):
    rng = np.random.default_rng(0)
    b, h, dh = 2, 4, 32
    q, k, v = _random_qkv(rng, b, h, s, dh, jnp.float32)
    mask = jnp.ones((b, s), dtype=jnp.int32)
    out = flash_attention(q, k, v, mask)
    ref = _xla_ref(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_padding_mask_parity():
    rng = np.random.default_rng(1)
    b, h, s, dh = 3, 2, 64, 32
    q, k, v = _random_qkv(rng, b, h, s, dh, jnp.float32)
    lengths = [64, 17, 1]
    mask = np.zeros((b, s), dtype=np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
    mask = jnp.asarray(mask)
    out = np.asarray(flash_attention(q, k, v, mask))
    ref = np.asarray(_xla_ref(q, k, v, mask))
    # only real query rows matter (padded rows are dropped by pooling),
    # but the kernel matches the XLA path on those too
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(out[i, :, :n], ref[i, :, :n], atol=2e-6)


def test_bf16_close_to_f32():
    rng = np.random.default_rng(2)
    b, h, s, dh = 2, 2, 32, 32
    q, k, v = _random_qkv(rng, b, h, s, dh, jnp.bfloat16)
    mask = jnp.ones((b, s), dtype=jnp.int32)
    out = np.asarray(flash_attention(q, k, v, mask), dtype=np.float32)
    ref = np.asarray(
        _xla_ref(q, k, v, mask), dtype=np.float32
    )
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-2)


def test_encoder_end_to_end_pallas_vs_xla():
    """Full bert_forward with attention_impl='pallas' matches 'xla'."""
    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, config.vocab_size, size=(4, 48)).astype(np.int32)
    mask = np.ones((4, 48), dtype=np.int32)
    mask[2, 30:] = 0
    enc_x = BertEncoder(config, attention_impl="xla")
    enc_p = BertEncoder(config, attention_impl="pallas")
    out_x = np.asarray(enc_x.encode(params, ids, mask))
    out_p = np.asarray(enc_p.encode(params, ids, mask))
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)


def test_gradients_match_xla_path():
    rng = np.random.default_rng(5)
    b, h, s, dh = 2, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    mask_np = np.ones((b, s), dtype=np.int32)
    mask_np[1, 20:] = 0
    mask = jnp.asarray(mask_np)
    cot = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, mask) * cot)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-4
        )


def test_training_step_through_pallas_attention():
    """value_and_grad through bert_forward with the pallas kernel works
    (the contrastive trainer's requirement)."""
    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(6)
    ids = rng.integers(0, config.vocab_size, size=(4, 32)).astype(np.int32)
    mask = np.ones((4, 32), dtype=np.int32)

    from dial_rag_tpu.models.bert import bert_forward

    def loss(params):
        h = bert_forward(
            params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            num_heads=config.num_heads,
            attention_impl="pallas",
        )
        return jnp.sum(h**2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(
        np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads)
    )


def test_q_blocked_long_sequence_matches_xla():
    """S > 512 takes the query-blocked path; outputs match the XLA
    reference including padding."""
    from dial_rag_tpu.ops.flash_attention import _FULL_TILE_MAX_S, _Q_BLOCK

    s = _FULL_TILE_MAX_S + _Q_BLOCK * 2  # forces the blocked path
    rng = np.random.default_rng(7)
    b, h, dh = 1, 2, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    mask_np = np.ones((b, s), dtype=np.int32)
    mask_np[0, s - 100:] = 0
    mask = jnp.asarray(mask_np)
    out = np.asarray(flash_attention(q, k, v, mask))
    ref = np.asarray(_xla_ref(q, k, v, mask))
    np.testing.assert_allclose(
        out[0, :, : s - 100], ref[0, :, : s - 100], atol=5e-6
    )


def test_q_blocked_gradients_match_xla():
    from dial_rag_tpu.ops.flash_attention import _FULL_TILE_MAX_S, _Q_BLOCK

    s = _FULL_TILE_MAX_S + _Q_BLOCK * 2
    rng = np.random.default_rng(8)
    b, h, dh = 1, 1, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, s), dtype=np.int32))
    cot = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))

    gp = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention(q, k, v, mask) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: jnp.sum(_xla_ref(q, k, v, mask) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3
        )


def test_kv_blocked_long_sequence_matches_xla(monkeypatch):
    """Above _Q_BLOCKED_MAX_S the online-softmax KV-blocked path runs;
    outputs match the XLA reference including padding. The threshold is
    lowered so the test stays CPU-sized while exercising a multi-block
    (4 q-blocks x 2 kv-blocks) grid."""
    import dial_rag_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_Q_BLOCKED_MAX_S", 512)
    s = fa._KV_BLOCK * 2
    rng = np.random.default_rng(9)
    b, h, dh = 2, 2, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    mask_np = np.ones((b, s), dtype=np.int32)
    mask_np[1, s // 3 :] = 0  # padding crosses a kv-block boundary
    mask = jnp.asarray(mask_np)
    out = np.asarray(fa.flash_attention(q, k, v, mask))
    ref = np.asarray(_xla_ref(q, k, v, mask))
    np.testing.assert_allclose(out[0], ref[0], atol=5e-6)
    np.testing.assert_allclose(
        out[1, :, : s // 3], ref[1, :, : s // 3], atol=5e-6
    )


def test_kv_blocked_gradients_match_xla(monkeypatch):
    """The two-pass blocked backward (dQ over kv-blocks, dK/dV over
    q-blocks, P recomputed from the stored log-sum-exp) must match the
    XLA reference gradients."""
    import dial_rag_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_Q_BLOCKED_MAX_S", 512)
    s = fa._KV_BLOCK * 2
    rng = np.random.default_rng(10)
    b, h, dh = 1, 2, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    mask_np = np.ones((b, s), dtype=np.int32)
    mask_np[0, -137:] = 0
    mask = jnp.asarray(mask_np)
    cot = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))

    gp = jax.grad(
        lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v, mask) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: jnp.sum(_xla_ref(q, k, v, mask) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3
        )


def _pack_qkv(q, k, v):
    """[B, H, S, Dh] x3 -> the fused-GEMM layout [B, S, 3H]."""
    b, h, s, dh = q.shape
    return jnp.concatenate(
        [x.transpose(0, 2, 1, 3).reshape(b, s, h * dh) for x in (q, k, v)],
        axis=-1,
    )


@pytest.mark.parametrize("s", [16, 64, 128])
def test_fused_qkv_matches_xla_f32(s):
    from dial_rag_tpu.ops.flash_attention import fused_qkv_attention

    rng = np.random.default_rng(12)
    b, h, dh = 2, 4, 32
    q, k, v = _random_qkv(rng, b, h, s, dh, jnp.float32)
    mask_np = np.ones((b, s), dtype=np.int32)
    mask_np[1, s // 2 :] = 0
    mask = jnp.asarray(mask_np)
    out = np.asarray(fused_qkv_attention(_pack_qkv(q, k, v), mask, h))
    ref = np.asarray(_xla_ref(q, k, v, mask))  # [B, H, S, Dh]
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-6)
    np.testing.assert_allclose(
        out[1, : s // 2], ref[1, : s // 2], atol=2e-6
    )


def test_fused_qkv_gradients_match_xla():
    """The layout-native kernel's backward (split -> recompute-P
    backward -> repack) must match grads of the XLA path taken w.r.t.
    the packed qkv tensor."""
    from dial_rag_tpu.ops.flash_attention import fused_qkv_attention

    rng = np.random.default_rng(13)
    b, h, s, dh = 2, 2, 32, 16
    q, k, v = _random_qkv(rng, b, h, s, dh, jnp.float32)
    qkv = _pack_qkv(q, k, v)
    mask_np = np.ones((b, s), dtype=np.int32)
    mask_np[1, 20:] = 0
    mask = jnp.asarray(mask_np)
    cot = jnp.asarray(rng.standard_normal((b, s, h * dh)).astype(np.float32))

    def loss_fused(qkv):
        return jnp.sum(fused_qkv_attention(qkv, mask, h) * cot)

    def loss_xla(qkv):
        qkv4 = qkv.reshape(b, s, 3, h, dh)
        qq, kk, vv = (qkv4[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        ctx = _xla_ref(qq, kk, vv, mask)
        return jnp.sum(ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dh) * cot)

    gp = jax.grad(loss_fused)(qkv)
    gx = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), atol=5e-5, rtol=1e-4
    )


def test_encoder_pallas_uses_fused_path_and_matches_xla():
    """bert_forward at S <= 512 takes the fused-qkv kernel; outputs must
    still match the XLA path (incl. padding)."""
    from dial_rag_tpu.ops.flash_attention import supports_fused_qkv

    assert supports_fused_qkv(48) and not supports_fused_qkv(1024)
    config = BertConfig.tiny()
    params = init_params(jax.random.PRNGKey(4), config)
    rng = np.random.default_rng(14)
    ids = rng.integers(0, config.vocab_size, size=(3, 48)).astype(np.int32)
    mask = np.ones((3, 48), dtype=np.int32)
    mask[1, 9:] = 0
    enc_x = BertEncoder(config, attention_impl="xla")
    enc_p = BertEncoder(config, attention_impl="pallas")
    out_x = np.asarray(enc_x.encode(params, ids, mask))
    out_p = np.asarray(enc_p.encode(params, ids, mask))
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)


def test_kv_blocked_lse_is_finite_and_correct(monkeypatch):
    """The stored log-sum-exp equals logsumexp of the scaled+biased
    scores for real rows (the backward's correctness hinges on it)."""
    import dial_rag_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_Q_BLOCKED_MAX_S", 512)
    s = fa._KV_BLOCK * 2
    rng = np.random.default_rng(11)
    b, h, dh = 1, 1, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, s), dtype=np.int32))
    _, lse = fa._forward(q, k, v, mask)
    assert lse is not None and lse.shape == (b, h, s)
    scores = np.einsum(
        "bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)
    ) / np.sqrt(dh)
    expected = np.log(np.exp(scores).sum(-1))
    np.testing.assert_allclose(np.asarray(lse), expected, atol=1e-4)
