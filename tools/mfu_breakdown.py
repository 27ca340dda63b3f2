"""Per-op device-time breakdown of one encode batch (VERDICT r3 item 1).

Times ablated variants of the serving encoder layer, each as ONE
lax.scan dispatch over on-device-generated inputs (the only timing the
remote tunnel cannot contaminate — see bench.bench_encoder_mfu), and
attributes the measured wall time to attention / GEMMs / VPU epilogue
work. Prints a table plus a pass-count accounting of the theoretical
ceiling at these shapes.

Run: python -m tools.mfu_breakdown  (~5-10 min on a v5e, mostly compiles)
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bench import chip_peak_flops, encoder_flops_per_token
from dial_rag_tpu.models.bert import (
    BertConfig,
    _dense,
    _layernorm,
    _split_qkv,
    _xla_attention,
    bert_forward,
    init_params,
)

B, S = 128, 256
N_BATCHES = 64
REPS = 3


def _gen_ids(seed, config):
    ids = jax.random.randint(
        jax.random.PRNGKey(seed),
        (N_BATCHES, B, S),
        5,
        config.vocab_size,
        dtype=jnp.int32,
    )
    return ids, jnp.ones_like(ids)


def _timed(fn, params, config, label, results):
    """min-over-reps wall time of one scan dispatch (fresh seed/rep)."""
    best = float("inf")
    for rep in range(REPS + 1):
        t0 = time.perf_counter()
        float(fn(params, jnp.int32(1000 + rep)))
        if rep > 0:
            best = min(best, time.perf_counter() - t0)
    tokens = N_BATCHES * B * S
    results[label] = {
        "ms": best * 1e3,
        "tokens_per_s": tokens / best,
    }
    print(f"{label:28s} {best * 1e3:9.1f} ms", flush=True)
    return best


def _make_runner(config, layer_mode: str, gelu: str = "tanh"):
    """A scan-dispatch encoder with the layer body ablated per mode."""
    num_heads = config.num_heads
    h = config.hidden_size

    def layer_fn(x, layer, mask, mode):
        b, s = x.shape[0], x.shape[1]
        dh = h // num_heads
        if mode in ("full", "no_attn", "xla_attn"):
            qkv = _dense(x, layer["qkv"])
            if mode == "full":
                from dial_rag_tpu.ops.flash_attention import (
                    fused_qkv_attention,
                )

                ctx = fused_qkv_attention(qkv, mask, num_heads)
            elif mode == "xla_attn":
                mask_bias = (1.0 - mask.astype(jnp.float32)) * jnp.finfo(
                    jnp.float32
                ).min
                q, k, v = _split_qkv(qkv, b, s, num_heads, dh)
                ctx = _xla_attention(q, k, v, mask_bias[:, None, None, :])
                ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
            else:  # no_attn: attention replaced by a zero-cost slice
                ctx = qkv[:, :, :h]
            attn_out = _dense(ctx, layer["attn_out"])
            x = _layernorm(
                x + attn_out,
                layer["attn_ln"]["scale"],
                layer["attn_ln"]["bias"],
            )
        elif mode == "attn_only":
            from dial_rag_tpu.ops.flash_attention import (
                fused_qkv_attention,
            )

            qkv = jnp.concatenate([x, x, x], axis=-1)
            x = fused_qkv_attention(qkv, mask, num_heads)
            return x
        elif mode == "qkv_attn_only":
            from dial_rag_tpu.ops.flash_attention import (
                fused_qkv_attention,
            )

            qkv = _dense(x, layer["qkv"])
            return fused_qkv_attention(qkv, mask, num_heads)
        elif mode == "vpu_only":
            # the non-GEMM epilogue work at the real activation shapes:
            # two residual+LN on [B,S,H] and a GELU on [B,S,4H]
            x = _layernorm(
                x + x, layer["attn_ln"]["scale"], layer["attn_ln"]["bias"]
            )
            big = jnp.broadcast_to(
                x[:, :, :, None], (b, s, h, 4)
            ).reshape(b, s, 4 * h)
            big = jax.nn.gelu(big, approximate=True)
            x = x + big[:, :, :h]
            return _layernorm(
                x, layer["ffn_ln"]["scale"], layer["ffn_ln"]["bias"]
            )

        if mode in ("full", "no_attn", "xla_attn"):
            ffn = _dense(x, layer["ffn_in"])
            if gelu == "exact":
                ffn = jax.nn.gelu(
                    ffn.astype(jnp.float32), approximate=False
                ).astype(x.dtype)
            elif gelu == "tanh":
                ffn = jax.nn.gelu(ffn, approximate=True)
            # gelu == "none": identity
            ffn = _dense(ffn, layer["ffn_out"])
            x = _layernorm(
                x + ffn, layer["ffn_ln"]["scale"], layer["ffn_ln"]["bias"]
            )
        return x

    @jax.jit
    def run(params, seed):
        ids, mask_all = _gen_ids(seed, config)

        def step(carry, batch):
            ids_b, mask_b = batch
            emb = params["embeddings"]
            x = (
                emb["word"][ids_b]
                + emb["position"][jnp.arange(S)][None, :, :]
                + emb["token_type"][0][None, None, :]
            )
            x = _layernorm(
                x, emb["layernorm"]["scale"], emb["layernorm"]["bias"]
            ).astype(jnp.bfloat16)
            for layer in params["layers"]:
                x = layer_fn(x, layer, mask_b, layer_mode)
            cls = x[:, 0, :].astype(jnp.float32)
            return carry + jnp.sum(cls), None

        return jax.lax.scan(step, jnp.float32(0), (ids, mask_all))[0]

    return run


def _shipped_runner(config, attention_impl: str = "auto"):
    """The real serving path. ``attention_impl`` is passed EXPLICITLY so
    the row labels stay faithful: since round 4, "auto" routes to the
    fused whole-layer blocks at these shapes — measuring it under a
    "pallas" label would misattribute the breakdown's headline row."""

    @jax.jit
    def run(params, seed):
        ids, mask_all = _gen_ids(seed, config)

        def step(carry, batch):
            hidden = bert_forward(
                params,
                batch[0],
                batch[1],
                num_heads=config.num_heads,
                compute_dtype=jnp.bfloat16,
                attention_impl=attention_impl,
            )
            cls = hidden[:, 0, :].astype(jnp.float32)
            return carry + jnp.sum(cls), None

        return jax.lax.scan(step, jnp.float32(0), (ids, mask_all))[0]

    return run


def pass_accounting(config, s=S):
    """MXU 128x128x128 pass counts per token block [B*S] for one layer,
    and the implied ceiling."""
    import math

    h, i = config.hidden_size, config.intermediate_size
    nh, dh = config.num_heads, config.head_dim
    m = B * s

    def passes(mm, kk, nn):
        return (
            math.ceil(mm / 128) * math.ceil(kk / 128) * math.ceil(nn / 128)
        )

    gemm = (
        passes(m, h, 3 * h)
        + passes(m, h, h)
        + passes(m, h, i)
        + passes(m, i, h)
    )
    attn = B * nh * (passes(s, dh, s) + passes(s, s, dh))
    useful_attn_passes = B * nh * 2 * (s / 128) ** 2 * (dh / 128)
    total = gemm + attn
    ceiling = (gemm + useful_attn_passes) / total
    return {
        "gemm_passes_per_layer": gemm,
        "attn_passes_per_layer": attn,
        "attn_useful_fraction": useful_attn_passes / attn,
        "mxu_ceiling": ceiling,
    }


def main():
    config = BertConfig.bge_small_en()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(
        lambda x: x, params
    )
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    tokens = N_BATCHES * B * S
    peak = chip_peak_flops(jax.devices()[0].device_kind)
    flops = tokens * encoder_flops_per_token(config, S)

    results: dict = {}
    t_full = _timed(
        _shipped_runner(config, "fused"),
        params,
        config,
        "shipped (fused blocks, round-4 auto route)",
        results,
    )
    _timed(
        _shipped_runner(config, "pallas"),
        params,
        config,
        "pallas attention (rounds 2-3 shipped path)",
        results,
    )
    variants = [
        ("full (rebuilt)", _make_runner(config, "full")),
        ("no_attn (GEMMs+VPU)", _make_runner(config, "no_attn")),
        ("xla_attn", _make_runner(config, "xla_attn")),
        ("attn_only", _make_runner(config, "attn_only")),
        ("qkv+attn_only", _make_runner(config, "qkv_attn_only")),
        ("vpu_only (LN+GELU+res)", _make_runner(config, "vpu_only")),
        ("full, gelu=none", _make_runner(config, "full", gelu="none")),
        ("full, gelu=exact", _make_runner(config, "full", gelu="exact")),
    ]
    for label, fn in variants:
        _timed(fn, params, config, label, results)

    acct = pass_accounting(config)
    mfu = flops / t_full / peak
    summary = {
        "mfu_shipped": round(mfu, 4),
        "accounting": acct,
        "results_ms": {k: round(v["ms"], 1) for k, v in results.items()},
    }
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
