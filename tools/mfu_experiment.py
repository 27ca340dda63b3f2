"""Encoder-MFU experiment at Dh=32 (round-2 review item).

Round 2 measured 44.7% encoder MFU at serving shapes (B=128, S=256)
against a ~75% dense-GEMM ceiling, attributing the gap to the attention
kernel's MXU-pass bound at Dh=32 (contraction/output tiles 32 wide vs
the MXU's 128). This experiment runs the remaining untried variants
head-to-head on the real chip, each timed as ONE lax.scan dispatch with
on-device-generated inputs (the only timing the remote tunnel cannot
contaminate — see bench.bench_encoder_mfu):

A. baseline — the serving encoder (qkv-layout-native pallas kernel);
B. lane-packed block-diagonal attention — all H heads' scores computed
   as one [S, H*S] matmul whose contraction runs over the full 128
   lanes (K laid out block-diagonally in [H*S, H*Dh]), and the AV
   product as one [S, H*S] x [H*S, H*Dh] matmul; if zeros conserve
   MXU passes this matches the baseline, if the compiler schedules the
   wide contraction better it wins;
C. baseline at double batch (pipeline-fill check);
D. XLA einsum attention (compiler-scheduled reference point).

    python -m tools.mfu_experiment          # runs on the active backend

Writes a row per variant; the conclusion lands in docs/mfu_dh32.md.
"""

import time

import numpy as np


def _timed_scan_mfu(step_tokens_fn, flops_per_token, tokens, reps=3):
    import jax

    best = float("inf")
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        float(step_tokens_fn(1000 + rep))
        if rep > 0:
            best = min(best, time.perf_counter() - t0)
    from bench import chip_peak_flops

    peak = chip_peak_flops(jax.devices()[0].device_kind)
    return (
        tokens * flops_per_token / best / peak if peak else None,
        tokens / best,
        best,
    )


def lane_packed_attention(q, k, v):
    """[B, H, S, Dh] attention with all heads' score/AV matmuls packed
    into two full-width MXU contractions per batch row.

    scores: q_packed [B, S, H*Dh] x k_blockdiag [B, H*Dh, H*S]
            -> [B, S, H*S]  (block h = that head's S columns)
    AV:     probs [B, S, H*S] x v_stacked_blockdiag [B, H*S, H*Dh]
            -> [B, S, H*Dh] (block h = that head's Dh lanes)
    """
    import jax
    import jax.numpy as jnp

    b, h, s, dh = q.shape
    scale = 1.0 / np.sqrt(dh)
    # q packed along lanes: [B, S, H*Dh]
    qp = q.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    # k block-diagonal: [B, H*Dh, H*S] where block (h) is k_h^T
    kt = k.transpose(0, 1, 3, 2)  # [B, H, Dh, S]
    eye = jnp.eye(h, dtype=k.dtype)  # [H, H]
    # kbd[b, i*Dh+d, j*S+t] = kt[b, j, d, t] * eye[i, j]
    kbd = jnp.einsum("bjdt,ij->bidjt", kt, eye).reshape(
        b, h * dh, h * s
    )
    scores = (
        jnp.einsum(
            "bsk,bkt->bst", qp, kbd, preferred_element_type=jnp.float32
        )
        * scale
    )  # [B, S, H*S]
    probs = jax.nn.softmax(
        scores.reshape(b, s, h, s).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    probs_flat = probs.reshape(b, s, h * s)
    # v stacked block-diagonally: [B, H*S, H*Dh]
    vbd = jnp.einsum("bjtd,ij->bjtid", v, eye).reshape(
        b, h * s, h * dh
    )
    out = jnp.einsum(
        "bst,btk->bsk", probs_flat, vbd, preferred_element_type=jnp.float32
    )  # [B, S, H*Dh]
    return out.astype(q.dtype)


def run(batch=128, s=256, reps=3, n_batches=32):
    import jax
    import jax.numpy as jnp

    from bench import encoder_flops_per_token
    from dial_rag_tpu.models.bert import (
        BertConfig,
        bert_forward,
        init_params,
    )

    config = BertConfig.bge_small_en()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    fpt = encoder_flops_per_token(config, s)
    results = {}

    def encoder_variant(name, impl, b):
        @jax.jit
        def run_scan(seed):
            ids = jax.random.randint(
                jax.random.PRNGKey(seed),
                (n_batches, b, s),
                5,
                config.vocab_size,
                dtype=jnp.int32,
            )
            mask = jnp.ones_like(ids)

            def step(carry, batch_io):
                hidden = bert_forward(
                    params,
                    batch_io[0],
                    batch_io[1],
                    num_heads=config.num_heads,
                    compute_dtype=jnp.bfloat16,
                    attention_impl=impl,
                )
                cls = hidden[:, 0, :].astype(jnp.float32)
                return carry + jnp.sum(cls), None

            return jax.lax.scan(step, jnp.float32(0), (ids, mask))[0]

        tokens = n_batches * b * s
        mfu, tps, dt = _timed_scan_mfu(run_scan, fpt, tokens, reps)
        results[name] = {
            "mfu": round(mfu, 4) if mfu else None,
            "tokens_per_sec": round(tps, 1),
            "batch": b,
            "seconds": round(dt, 3),
        }
        print(name, results[name], flush=True)

    encoder_variant("A_baseline_pallas", "auto", batch)
    encoder_variant("C_double_batch", "auto", batch * 2)
    encoder_variant("D_xla_einsum", "xla", batch)

    # B: isolated attention-op comparison (lane-packed vs per-head XLA
    # vs the serving pallas kernel) at the serving shape — per-op
    # timing makes the pass-bound question direct
    h, dh = config.num_heads, config.head_dim

    def attention_op_variant(name, fn):
        @jax.jit
        def run_scan(seed):
            qkv = jax.random.normal(
                jax.random.PRNGKey(seed),
                (n_batches, 3, batch, h, s, dh),
                jnp.bfloat16,
            )

            def step(carry, x):
                out = fn(x[0], x[1], x[2])
                return carry + jnp.sum(out.astype(jnp.float32)), None

            return jax.lax.scan(step, jnp.float32(0), qkv)[0]

        # analytic attention flops: 2*S*Dh per score element + 2 for AV
        flops = n_batches * batch * h * (4 * s * s * dh)
        best = float("inf")
        for rep in range(reps + 1):
            t0 = time.perf_counter()
            float(run_scan(2000 + rep))
            if rep > 0:
                best = min(best, time.perf_counter() - t0)
        from bench import chip_peak_flops

        peak = chip_peak_flops(jax.devices()[0].device_kind)
        results[name] = {
            "attn_mfu": round(flops / best / peak, 4) if peak else None,
            "seconds": round(best, 3),
        }
        print(name, results[name], flush=True)

    def xla_per_head(q, k, v):
        from dial_rag_tpu.models.bert import _xla_attention

        return _xla_attention(q, k, v, jnp.zeros((), jnp.bfloat16))

    attention_op_variant("B1_attn_xla_per_head", xla_per_head)
    attention_op_variant("B2_attn_lane_packed", lane_packed_attention)
    return results


if __name__ == "__main__":
    import json

    print(json.dumps(run(), indent=2))
