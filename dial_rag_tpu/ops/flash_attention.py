"""Fused attention kernel for the encoder (Pallas, TPU).

Replaces the two-matmul XLA attention path in the bge-small encoder
(dial_rag_tpu/models/bert.py) — the TPU counterpart of the reference's
torch SDPA / OpenVINO attention (aidial_rag/embeddings/embeddings.py:
38-49). The XLA path materializes the ``[B, H, S, S]`` score tensor in
HBM between the QK^T and PV matmuls (two unfusable dots); at the
encoder's serving shapes (B=128, H=12, S=512) that is ~1.6 GB of HBM
traffic per layer. This kernel keeps scores and probabilities entirely
in VMEM: one grid program per (batch, head) computes QK^T on the MXU,
a numerically-safe softmax on the VPU, and PV on the MXU, so HBM sees
only Q/K/V/O.

Design notes:

- Encoder sequence lengths are bucketed to <=512 (tokenizer buckets),
  so a full ``[S, S]`` score tile fits comfortably in VMEM (1 MiB f32 at
  S=512) and no online-softmax KV blocking is needed. The single-tile
  formulation *is* the flash design point for these shapes — blocking
  would only add rescaling traffic.
- Padding-token masking uses the same additive ``finfo(f32).min`` bias
  as the XLA path / HF semantics: fully-masked query rows yield uniform
  probabilities (never NaN), and pooling reads only the always-real CLS
  row.
- Softmax runs in f32 regardless of compute dtype; both dots accumulate
  in f32 on the MXU (``preferred_element_type``), probabilities are cast
  back to the compute dtype for PV exactly like the XLA reference path,
  so the two implementations agree to float tolerance (bit-equal
  reductions are not guaranteed across backends).
- On non-TPU backends (the hermetic CPU test mesh) the kernel runs in
  interpreter mode; numerics are identical.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, 0]  # [S, Dh]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, S] in f32, never leaves VMEM
    scores = scores * scale + bias_ref[0, 0][None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(
        probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _mask_to_bias(attention_mask):
    bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(
        jnp.float32
    ).min
    # [B, 1, S]: the trailing (1, S) block satisfies Mosaic's tile rules
    return bias[:, None, :]


def _qkv_spec(s, dh):
    return pl.BlockSpec(
        (1, 1, s, dh),
        lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _bias_spec(s):
    return pl.BlockSpec(
        (1, 1, s), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )


# sequences up to this length use one [S, S] score tile per (b, h);
# longer ones block the query dimension so VMEM holds [Q_BLOCK, S]
_FULL_TILE_MAX_S = 512
_Q_BLOCK = 256


def _attention_q_blocked_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    """Query-blocked fused attention: K/V stay whole in VMEM (512 KB at
    S=4096, Dh=64) while scores materialize only [Q_BLOCK, S] per step —
    the long-context design point up to ~8k tokens. Softmax is exact per
    query row (full row in VMEM), so no online rescaling is needed."""
    q = q_ref[0, 0]  # [Q_BLOCK, Dh]
    k = k_ref[0, 0]  # [S, Dh]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q_BLOCK, S]
    scores = scores * scale + bias_ref[0, 0][None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(
        probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _q_blocked_specs(s, dh, qb):
    q_spec = pl.BlockSpec(
        (1, 1, qb, dh),
        lambda i, j, g: (i, j, g, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, s, dh),
        lambda i, j, g: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, 1, s), lambda i, j, g: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return bias_spec, q_spec, kv_spec


def _forward(q, k, v, attention_mask):
    b, h, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    interpret = jax.default_backend() == "cpu"
    if s <= _FULL_TILE_MAX_S or s % _Q_BLOCK != 0:
        kernel = partial(_attention_kernel, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(b, h),
            in_specs=[_bias_spec(s), _qkv_spec(s, dh), _qkv_spec(s, dh),
                      _qkv_spec(s, dh)],
            out_specs=_qkv_spec(s, dh),
            out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
            interpret=interpret,
        )(_mask_to_bias(attention_mask), q, k, v)
    bias_spec, q_spec, kv_spec = _q_blocked_specs(s, dh, _Q_BLOCK)
    kernel = partial(_attention_q_blocked_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b, h, s // _Q_BLOCK),
        in_specs=[bias_spec, q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
        interpret=interpret,
    )(_mask_to_bias(attention_mask), q, k, v)


def _attention_bwd_kernel(
    bias_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale
):
    """Recompute-P backward: P and dS live only in VMEM.

    S = scale*QK^T + bias; P = softmax(S); O = PV
    dV = P^T dO;  dP = dO V^T;  dS = P * (dP - rowsum(dP * P))
    dQ = scale * dS K;  dK = scale * dS^T Q
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale + bias_ref[0, 0][None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [S, S] f32

    p_c = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        p_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, Dh] = P^T dO
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, S] = dO V^T
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
    ds_c = (ds * scale).astype(q.dtype)
    dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S, Dh] = dS^T Q
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _attention_bwd_q_blocked_kernel(
    bias_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale
):
    """Query-blocked recompute backward. dq is per-block; dk/dv accumulate
    across the (innermost) q-block grid dimension — their output blocks
    map to the same (b, h) slot, so they stay VMEM-resident while the
    q-block index varies. Accumulation runs in f32 output buffers."""
    g = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale + bias_ref[0, 0][None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    p_c = p.astype(q.dtype)
    dv_part = jax.lax.dot_general(
        p_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_c = (ds * scale).astype(q.dtype)
    dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
    dk_part = jax.lax.dot_general(
        ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(g == 0)
    def _():
        dk_ref[0, 0] = dk_part
        dv_ref[0, 0] = dv_part

    @pl.when(g != 0)
    def _():
        dk_ref[0, 0] += dk_part
        dv_ref[0, 0] += dv_part


def _backward(attention_mask, q, k, v, do):
    b, h, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    interpret = jax.default_backend() == "cpu"
    if s <= _FULL_TILE_MAX_S or s % _Q_BLOCK != 0:
        kernel = partial(_attention_bwd_kernel, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(b, h),
            in_specs=[_bias_spec(s)] + [_qkv_spec(s, dh)] * 4,
            out_specs=(_qkv_spec(s, dh),) * 3,
            out_shape=(
                jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
                jax.ShapeDtypeStruct((b, h, s, dh), k.dtype),
                jax.ShapeDtypeStruct((b, h, s, dh), v.dtype),
            ),
            interpret=interpret,
        )(_mask_to_bias(attention_mask), q, k, v, do)
    bias_spec, q_spec, kv_spec = _q_blocked_specs(s, dh, _Q_BLOCK)
    kv_out_spec = pl.BlockSpec(
        (1, 1, s, dh),
        lambda i, j, g: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = partial(_attention_bwd_q_blocked_kernel, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h, s // _Q_BLOCK),
        in_specs=[bias_spec, q_spec, kv_spec, kv_spec, q_spec],
        out_specs=(q_spec, kv_out_spec, kv_out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
        ),
        interpret=interpret,
    )(_mask_to_bias(attention_mask), q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@jax.custom_vjp
def flash_attention(q, k, v, attention_mask):
    """Fused encoder self-attention with a fused recompute backward.

    q, k, v: ``[B, H, S, Dh]`` (any float dtype); attention_mask:
    ``[B, S]`` with 1 = real token. Returns ``[B, H, S, Dh]`` in the
    dtype of ``q``. Differentiable w.r.t. q/k/v (mask is data).
    """
    return _forward(q, k, v, attention_mask)


def _fwd_rule(q, k, v, attention_mask):
    return _forward(q, k, v, attention_mask), (q, k, v, attention_mask)


def _bwd_rule(residuals, do):
    q, k, v, attention_mask = residuals
    dq, dk, dv = _backward(attention_mask, q, k, v, do)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
