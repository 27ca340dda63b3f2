"""Fused transformer-layer blocks for the bge-small encoder (Pallas, TPU).

Why these exist: the round-4 per-op breakdown (tools/mfu_breakdown.py,
real v5e) showed the serving encoder is HBM-BANDWIDTH-bound, not
MXU-bound — the `vpu_only` ablation (LayerNorm + GELU + residual
streams alone) costs 566 ms where the full GEMM+VPU path costs 622 ms,
i.e. the GEMMs are nearly free and elementwise HBM streams dominate.
At B=128, S=256 the unfused layer moves ~625 MB of activations through
HBM (QKV out, [B,S,4H] FFN intermediate write+read, residual/LN
passes); arithmetic intensity sits below the v5e ridge point, which is
exactly the measured 44.7% MFU plateau of rounds 2-3.

The fix is structural, not micro: keep every intra-layer activation in
VMEM. Two kernels cover one encoder layer
(reference model: aidial_rag/embeddings/embeddings.py:38-66 runs the
same bge-small through sentence-transformers; the layer algebra is HF
BertLayer):

- ``fused_attention_block``: LN(x + W_out·Attention(W_qkv·x)) — one
  grid program per batch row computes the QKV projection, per-head
  single-tile attention (the qkv-layout-native design from
  ops/flash_attention.py), the output projection, the residual and the
  LayerNorm without materializing qkv/ctx/attn_out in HBM. HBM sees
  x in, y out: ~50 MB/layer instead of ~325 MB.
- ``fused_ffn_block``: LN(x + W2·GELU(W1·x)) — grid over row blocks of
  the flattened [B*S, H] activations; the [rows, 4H] intermediate
  lives only in VMEM. HBM: ~50 MB/layer instead of ~300 MB.

Both kernels accumulate matmuls in f32 on the MXU
(``preferred_element_type``), run GELU / softmax / LayerNorm in f32,
and write bf16 — the same numerical contract as the unfused bf16 path
(models/bert.py), to which tests pin them within bf16 tolerance.

Training: both blocks carry a ``jax.custom_vjp`` whose backward
re-derives gradients from the plain-jnp reference composition
(recompute-from-inputs, the same policy as flash_attention's
recompute-P backward) — so ``jax.grad`` through ``bert_forward`` works
unchanged and the fused forward can serve the training loop too.

On non-TPU backends the kernels run in interpreter mode (hermetic CPU
tests); the serving encode path only routes here on real TPUs.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LAYERNORM_EPS = 1e-12

# Row-block for the FFN kernel: [512, 4H] f32 intermediate = 3 MiB VMEM
# at H=384, alongside both weight panels (2.4 MiB bf16) — comfortably
# inside the 16 MiB budget with double-buffered x/o blocks.
_FFN_ROW_BLOCK = 512


def _interpret():
    return jax.default_backend() == "cpu"


def _layernorm_f32(r, scale, bias):
    """LayerNorm on an f32 tile; returns f32 (caller casts)."""
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r - mean), axis=-1, keepdims=True)
    return (r - mean) * jax.lax.rsqrt(var + LAYERNORM_EPS) * scale + bias


# --------------------------------------------------------------------------
# fused FFN block
# --------------------------------------------------------------------------


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, beta_ref, o_ref):
    x = x_ref[:]  # [MB, H] compute dtype
    h = (
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    )  # [MB, I] f32, never leaves VMEM
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = (
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )  # [MB, H] f32
    r = x.astype(jnp.float32) + y
    o_ref[:] = _layernorm_f32(
        r, g_ref[0][None, :], beta_ref[0][None, :]
    ).astype(o_ref.dtype)


def _ffn_forward(x, w1, b1, w2, b2, g, beta):
    b, s, hid = x.shape
    m = b * s
    mb = _FFN_ROW_BLOCK
    while m % mb:
        mb //= 2
    x2 = x.reshape(m, hid)
    inter = w1.shape[1]

    def row2(a):
        return a.reshape(1, -1).astype(jnp.float32)

    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weight panel, constant index
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _ffn_kernel,
        grid=(m // mb,),
        in_specs=[
            pl.BlockSpec((mb, hid), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((hid, inter)),
            full((1, inter)),
            full((inter, hid)),
            full((1, hid)),
            full((1, hid)),
            full((1, hid)),
        ],
        out_specs=pl.BlockSpec(
            (mb, hid), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, hid), x.dtype),
        interpret=_interpret(),
    )(
        x2,
        w1.astype(x.dtype),
        row2(b1),
        w2.astype(x.dtype),
        row2(b2),
        row2(g),
        row2(beta),
    )
    return out.reshape(b, s, hid)


def _ffn_reference(x, w1, b1, w2, b2, g, beta):
    """Plain-jnp composition (mirrors models/bert.py's unfused bf16 path);
    the custom backward differentiates THIS function."""
    h = (
        jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
        + b1
    ).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    y = (
        jnp.dot(h, w2.astype(x.dtype), preferred_element_type=jnp.float32)
        + b2
    ).astype(x.dtype)
    r = (x + y).astype(jnp.float32)
    return _layernorm_f32(r, g, beta).astype(x.dtype)


@jax.custom_vjp
def fused_ffn_block(x, w1, b1, w2, b2, g, beta):
    """LN(x + W2·GELU_tanh(W1·x + b1) + b2) with the [rows, 4H]
    intermediate VMEM-resident. x: [B, S, H]; returns same shape/dtype."""
    return _ffn_forward(x, w1, b1, w2, b2, g, beta)


def _ffn_fwd(x, w1, b1, w2, b2, g, beta):
    return _ffn_forward(x, w1, b1, w2, b2, g, beta), (x, w1, b1, w2, b2, g, beta)


def _ffn_bwd(residuals, dout):
    _, vjp = jax.vjp(_ffn_reference, *residuals)
    return vjp(dout)


fused_ffn_block.defvjp(_ffn_fwd, _ffn_bwd)


# --------------------------------------------------------------------------
# fused attention block
# --------------------------------------------------------------------------


def _attn_block_kernel(
    bias_ref,
    x_ref,
    wqkv_ref,
    bqkv_ref,
    wout_ref,
    bout_ref,
    g_ref,
    beta_ref,
    o_ref,
    *,
    num_heads,
    scale,
):
    x = x_ref[0]  # [S, H]
    hid = x.shape[1]
    dh = hid // num_heads
    qkv = (
        jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[0][None, :]
    ).astype(x.dtype)  # [S, 3H], VMEM-resident
    bias = bias_ref[0, 0][None, :]
    outs = []
    # per-head single-tile attention, unrolled like the qkv-native
    # kernel in ops/flash_attention.py (measured identical to a
    # head-batched dot_general: the MXU pass count at Dh=32 is the same)
    for j in range(num_heads):
        q = qkv[:, j * dh : (j + 1) * dh]
        k = qkv[:, hid + j * dh : hid + (j + 1) * dh]
        v = qkv[:, 2 * hid + j * dh : 2 * hid + (j + 1) * dh]
        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] f32, never leaves VMEM
        scores = scores * scale + bias
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(
                probs.astype(x.dtype), v, preferred_element_type=jnp.float32
            )
        )
    ctx = jnp.concatenate(outs, axis=1).astype(x.dtype)  # [S, H]
    attn_out = (
        jnp.dot(ctx, wout_ref[:], preferred_element_type=jnp.float32)
        + bout_ref[0][None, :]
    )
    r = x.astype(jnp.float32) + attn_out
    o_ref[0] = _layernorm_f32(
        r, g_ref[0][None, :], beta_ref[0][None, :]
    ).astype(o_ref.dtype)


def _attn_block_forward(x, attention_mask, wqkv, bqkv, wout, bout, g, beta, num_heads):
    b, s, hid = x.shape
    scale = 1.0 / math.sqrt(hid // num_heads)
    mask_bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(
        jnp.float32
    ).min
    mask_bias = mask_bias[:, None, :]  # [B, 1, S]

    def row2(a):
        return a.reshape(1, -1).astype(jnp.float32)

    x_spec = pl.BlockSpec(
        (1, s, hid), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_attn_block_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            x_spec,
            full((hid, 3 * hid)),
            full((1, 3 * hid)),
            full((hid, hid)),
            full((1, hid)),
            full((1, hid)),
            full((1, hid)),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hid), x.dtype),
        interpret=_interpret(),
    )(
        mask_bias,
        x,
        wqkv.astype(x.dtype),
        row2(bqkv),
        wout.astype(x.dtype),
        row2(bout),
        row2(g),
        row2(beta),
    )


def _attn_block_reference(
    x, attention_mask, wqkv, bqkv, wout, bout, g, beta, num_heads
):
    b, s, hid = x.shape
    dh = hid // num_heads
    qkv = (
        jnp.dot(x, wqkv.astype(x.dtype), preferred_element_type=jnp.float32)
        + bqkv
    ).astype(x.dtype)
    qkv4 = qkv.reshape(b, s, 3, num_heads, dh)
    q, k, v = (qkv4[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    mask_bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(
        jnp.float32
    ).min
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores / math.sqrt(dh) + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, hid)
    attn_out = (
        jnp.dot(ctx, wout.astype(x.dtype), preferred_element_type=jnp.float32)
        + bout
    ).astype(x.dtype)
    r = (x + attn_out).astype(jnp.float32)
    return _layernorm_f32(r, g, beta).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_attention_block(
    x, attention_mask, wqkv, bqkv, wout, bout, g, beta, num_heads
):
    """LN(x + W_out·Attention(W_qkv·x + b) + b_out) with qkv, scores,
    probabilities, ctx and attn_out all VMEM-resident; only x and the
    block output touch HBM. x: [B, S, H], mask: [B, S] (1 = real token);
    returns [B, S, H] in x's dtype. Single-tile design point — callers
    gate on ``supports_fused_block(s)``."""
    return _attn_block_forward(
        x, attention_mask, wqkv, bqkv, wout, bout, g, beta, num_heads
    )


def _attn_block_fwd(x, attention_mask, wqkv, bqkv, wout, bout, g, beta, num_heads):
    out = _attn_block_forward(
        x, attention_mask, wqkv, bqkv, wout, bout, g, beta, num_heads
    )
    return out, (x, attention_mask, wqkv, bqkv, wout, bout, g, beta)


def _attn_block_bwd(num_heads, residuals, dout):
    x, attention_mask, wqkv, bqkv, wout, bout, g, beta = residuals
    _, vjp = jax.vjp(
        lambda *args: _attn_block_reference(*args, num_heads),
        x,
        attention_mask,
        wqkv,
        bqkv,
        wout,
        bout,
        g,
        beta,
    )
    grads = vjp(dout)
    # the mask is data, not a differentiable input
    return (grads[0], None) + grads[2:]


fused_attention_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def supports_fused_block(s: int) -> bool:
    """Same single-tile bound as ops.flash_attention.supports_fused_qkv:
    a full [S, S] f32 score tile per head must fit VMEM next to the
    layer's weight panels."""
    return s <= 512


# --------------------------------------------------------------------------
# fused whole-layer megakernel (attention block + FFN block in ONE program)
# --------------------------------------------------------------------------


def _layer_kernel(
    bias_ref,
    x_ref,
    wqkv_ref,
    bqkv_ref,
    wout_ref,
    bout_ref,
    g1_ref,
    beta1_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    g2_ref,
    beta2_ref,
    o_ref,
    *,
    num_heads,
    scale,
):
    x = x_ref[0]  # [S, H]
    hid = x.shape[1]
    dh = hid // num_heads
    qkv = (
        jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[0][None, :]
    ).astype(x.dtype)
    bias = bias_ref[0, 0][None, :]
    outs = []
    for j in range(num_heads):
        q = qkv[:, j * dh : (j + 1) * dh]
        k = qkv[:, hid + j * dh : hid + (j + 1) * dh]
        v = qkv[:, 2 * hid + j * dh : 2 * hid + (j + 1) * dh]
        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale + bias
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(
                probs.astype(x.dtype), v, preferred_element_type=jnp.float32
            )
        )
    ctx = jnp.concatenate(outs, axis=1).astype(x.dtype)
    attn_out = (
        jnp.dot(ctx, wout_ref[:], preferred_element_type=jnp.float32)
        + bout_ref[0][None, :]
    )
    a = _layernorm_f32(
        x.astype(jnp.float32) + attn_out,
        g1_ref[0][None, :],
        beta1_ref[0][None, :],
    ).astype(x.dtype)  # post-attention hidden, stays in VMEM
    h = (
        jnp.dot(a, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    )
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = (
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )
    o_ref[0] = _layernorm_f32(
        a.astype(jnp.float32) + y, g2_ref[0][None, :], beta2_ref[0][None, :]
    ).astype(o_ref.dtype)


def _layer_forward(x, attention_mask, weights, num_heads):
    (wqkv, bqkv, wout, bout, g1, beta1, w1, b1, w2, b2, g2, beta2) = weights
    b, s, hid = x.shape
    inter = w1.shape[1]
    scale = 1.0 / math.sqrt(hid // num_heads)
    mask_bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(
        jnp.float32
    ).min
    mask_bias = mask_bias[:, None, :]

    def row2(a):
        return a.reshape(1, -1).astype(jnp.float32)

    x_spec = pl.BlockSpec(
        (1, s, hid), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_layer_kernel, num_heads=num_heads, scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            x_spec,
            full((hid, 3 * hid)),
            full((1, 3 * hid)),
            full((hid, hid)),
            full((1, hid)),
            full((1, hid)),
            full((1, hid)),
            full((hid, inter)),
            full((1, inter)),
            full((inter, hid)),
            full((1, hid)),
            full((1, hid)),
            full((1, hid)),
        ],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, hid), x.dtype),
        interpret=_interpret(),
    )(
        mask_bias,
        x,
        wqkv.astype(x.dtype),
        row2(bqkv),
        wout.astype(x.dtype),
        row2(bout),
        row2(g1),
        row2(beta1),
        w1.astype(x.dtype),
        row2(b1),
        w2.astype(x.dtype),
        row2(b2),
        row2(g2),
        row2(beta2),
    )


def _layer_reference(x, attention_mask, weights, num_heads):
    (wqkv, bqkv, wout, bout, g1, beta1, w1, b1, w2, b2, g2, beta2) = weights
    a = _attn_block_reference(
        x, attention_mask, wqkv, bqkv, wout, bout, g1, beta1, num_heads
    )
    return _ffn_reference(a, w1, b1, w2, b2, g2, beta2)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_block(x, attention_mask, weights, num_heads):
    """One FULL encoder layer — LN(a + FFN(a)) where
    a = LN(x + Attention(x)) — in a single Pallas program per batch
    row; the post-attention hidden state ``a`` never touches HBM
    (saves the 2x[B, S, H] inter-block round-trip the two-kernel
    composition pays, a ~5% traffic bound at serving shapes).
    ``weights`` is the 12-tuple
    (wqkv, bqkv, wout, bout, attn_ln_scale, attn_ln_bias,
    w1, b1, w2, b2, ffn_ln_scale, ffn_ln_bias).

    Status: measured EQUAL to the two-block composition within
    measurement noise (docs/mfu_dh32.md, round-4 megakernel section),
    so bert_forward's "auto" keeps routing to the two-block path;
    select explicitly with attention_impl="fused_layer"."""
    return _layer_forward(x, attention_mask, weights, num_heads)


def _layer_fwd(x, attention_mask, weights, num_heads):
    return _layer_forward(x, attention_mask, weights, num_heads), (
        x,
        attention_mask,
        weights,
    )


def _layer_bwd(num_heads, residuals, dout):
    x, attention_mask, weights = residuals
    _, vjp = jax.vjp(
        lambda x, w: _layer_reference(x, attention_mask, w, num_heads),
        x,
        weights,
    )
    dx, dw = vjp(dout)
    return dx, None, dw


fused_layer_block.defvjp(_layer_fwd, _layer_bwd)
