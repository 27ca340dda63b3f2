"""Headline benchmark: index-build throughput (chunks/sec), TPU vs reference path.

Measures the end-to-end semantic index build hot loop — host WordPiece
tokenization + device transfer + bge-small-class encoder forward + device
index append — on the real TPU chip, and compares against the reference's
compute path (HF BERT on CPU torch, standing in for sentence-transformers/
OpenVINO which is the same model on the same cores; reference batch size
128 per aidial_rag/embeddings/embeddings.py:24-26). ``vs_baseline`` is
therefore "TPU pipeline vs the same architecture on this container's
CPU cores", not vs the reference's tuned OpenVINO deployment.

Prints ONE JSON line. The headline build timing ends with a D2H fetch
of bytes derived from the last index row, so the remote tunnel's
optimistic completion acks cannot deflate it (round 1's 15,810 chunks/s
was such an artifact: it implied 4M tokens/s through an encoder whose
device-honest rate was 0.7M; the honest number that round was ~3k).
Besides the headline chunks/s it reports:
- ``tokens_per_sec``: real (attention-mask) tokens through the full
  pipeline per wall second — same honest clock as the headline;
- ``mfu`` / ``device_tokens_per_sec``: pure MXU utilization of the
  encoder, measured by a single-dispatch scan over synthetic all-real
  batches (analytic forward FLOPs/token for the bge-small
  architecture over the chip's bf16 peak) — see bench_encoder_mfu for
  why nothing weaker survives the tunnel's timing artifacts;
- ``query_device_ms``: amortized per-query device time of a top-7
  dense lookup over a 100k x 384 f32 index — 256 sequential finds
  inside ONE dispatch (lax.scan), so the remote-tunnel RTT cannot
  contaminate it (BASELINE.md target: < 2 ms).
"""

import json
import sys
import time

import numpy as np

N_CHUNKS = 16384  # 128 batches / 16 transfer groups: enough for the host
# tokenize -> transfer -> encode pipeline to reach steady state AND to
# amortize the fixed per-build costs (pipeline fill + the final ~80ms
# D2H honesty fetch through the tunnel) below ~10%
BATCH = 128  # reference EMBEDDINGS_BATCH_SIZE
CPU_CHUNKS = 128  # baseline sample (scaled)
WORDS_PER_CHUNK = 180  # ~1000 chars, the reference chunk size

# bf16 dense peak FLOPs/s per chip by jax device_kind substring
_CHIP_PEAK_FLOPS = (
    ("v6", 918e12),  # Trillium / v6e
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # v5e
    ("v5e", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def chip_peak_flops(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for marker, peak in _CHIP_PEAK_FLOPS:
        if marker in kind:
            return peak
    return None


def encoder_flops_per_token(config, s_bucket: int) -> float:
    """Analytic forward matmul FLOPs per token at padded seq length S:
    per layer QKV (2*H*3H) + attn out (2*H*H) + FFN (4*H*I) + the two
    attention einsums (4*S*H)."""
    h, i = config.hidden_size, config.intermediate_size
    return config.num_layers * (8 * h * h + 4 * h * i + 4 * s_bucket * h)


def count_real_tokens(texts, tok):
    """Attention-mask token count of the corpus as the embedder batches
    it (BATCH chunks per encode at that batch's seq bucket)."""
    real_tokens = 0
    for i in range(0, len(texts), BATCH):
        _, mask = tok.encode_batch(texts[i : i + BATCH])
        real_tokens += int(mask.sum())
    return real_tokens


def make_corpus(rng, n):
    words = (
        "the alps are highest most extensive mountain range that entirely in "
        "europe stretching approximately across eight alpine countries france "
        "switzerland italy austria climate glaciers snow peaks pass valley "
        "formed over tens of millions years as african and eurasian tectonic "
        "plates collided extreme shortening caused by event resulted marine "
        "sedimentary rocks rising thrusting folding into high points like mont "
        "blanc matterhorn elevation meters region water supply rivers rhine "
        "rhone danube po tourism winter summer population cities culture"
    ).split()
    return [
        " ".join(rng.choice(words, size=WORDS_PER_CHUNK)) for _ in range(n)
    ]


def bench_tpu(texts, tok, params, config, transfer_format="wide"):
    """Drives the real TPU-native indexing pipeline end to end: host
    tokenization (pipelined on the parse pool) -> grouped host->device
    transfer -> jitted encode -> embeddings appended to the HBM-resident
    dense index (no device->host round-trip on the hot path) -> ready to
    query. Timing stops when the index is queryable; a query is then run
    to confirm it works."""
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.index.dense_index import DenseIndex
    from dial_rag_tpu.index.records import RetrievalType
    from dial_rag_tpu.models.bert import BertEncoder
    from dial_rag_tpu.runtime.host_pools import init_host_pools

    init_host_pools()
    embedder = BgeEmbedder(
        tokenizer=tok,
        encoder=BertEncoder(config, compute_dtype=jnp.bfloat16),
        params=params,
        batch_size=BATCH,
        transfer_format=transfer_format,
    )

    def build(texts):
        emb = embedder.embed_documents_device(texts)
        index = DenseIndex.from_device_matrix(
            RetrievalType.TEXT, emb, limit=7
        )
        # fetch real bytes derived from the last row: through the remote
        # tunnel, block_until_ready can ack before execution finishes
        # (round-1's 15.8k chunks/s implied 4M tokens/s through a 0.7M
        # tokens/s encoder — physically impossible); a D2H read of the
        # final row cannot complete until every encode actually ran
        np.asarray(index._emb[-1])
        return index

    # warm with a distinct corpus of the SAME shape structure so every
    # program (encode, group concat, index pad) is compiled before timing
    warm_texts = make_corpus(np.random.default_rng(1), len(texts))
    build(warm_texts)
    # best of 3: the remote-TPU tunnel adds high run-to-run variance that
    # is environment noise, not pipeline cost (inputs differ per run so
    # nothing is served from a dispatch cache)
    dt = float("inf")
    best_texts = texts
    for run in range(3):
        run_texts = make_corpus(np.random.default_rng(100 + run), len(texts))
        t0 = time.perf_counter()
        index = build(run_texts)
        run_dt = time.perf_counter() - t0
        if run_dt < dt:
            dt, best_texts = run_dt, run_texts

    # the index is live: nearest neighbor of a row's own embedding is
    # that row
    probe = np.asarray(index._emb[7])
    hits = index.find(probe)
    assert hits[0].chunk_id == 7, hits[:3]
    return len(texts) / dt, dt, best_texts


def bench_encoder_mfu(params, config, reps=3, n_batches=64, s=256):
    """Device-honest encoder MFU: encode ``n_batches`` [BATCH, s] token
    batches inside ONE dispatch (lax.scan). Two tunnel artifacts make
    naive wall timing of the pipeline untrustworthy here (they implied
    >100% of chip peak, which is physically impossible): completion
    acks can return optimistically, and dispatches whose input bytes
    were seen before are served from a transport cache. So the token
    ids are generated ON DEVICE from a per-rep seed inside the timed
    dispatch (fresh bytes every rep, ~zero FLOPs), and one dispatch
    carries ~n_batches*BATCH*s tokens (~250 ms of roofline compute at
    the defaults) so launch latency amortizes away. Returns
    (mfu, tokens_per_sec) on the dispatched (padded) tokens — the mask
    is all-real here, so mfu is exactly MXU utilization."""
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.models.bert import bert_forward

    @jax.jit
    def encode_all(params, seed):
        ids = jax.random.randint(
            jax.random.PRNGKey(seed),
            (n_batches, BATCH, s),
            5,
            config.vocab_size,
            dtype=jnp.int32,
        )
        mask = jnp.ones_like(ids)

        def step(carry, batch):
            hidden = bert_forward(
                params,
                batch[0],
                batch[1],
                num_heads=config.num_heads,
                compute_dtype=jnp.bfloat16,
            )
            cls = hidden[:, 0, :].astype(jnp.float32)
            emb = cls / jnp.maximum(
                jnp.sqrt(jnp.sum(cls * cls, -1, keepdims=True)), 1e-12
            )
            return carry + jnp.sum(emb), emb

        # return ONLY a scalar that depends on every output: through
        # the tunnel, block_until_ready acks before remote execution
        # finishes, so the timed section must FETCH bytes derived from
        # the full computation (4 bytes; transfer latency ~60-95 ms,
        # small next to the ~250 ms of compute in the dispatch)
        return jax.lax.scan(step, jnp.float32(0), (ids, mask))[0]

    best = float("inf")
    for rep in range(reps + 1):  # rep 0 warms the compile
        t0 = time.perf_counter()
        float(encode_all(params, jnp.int32(1000 + rep)))
        if rep > 0:
            best = min(best, time.perf_counter() - t0)

    tokens = n_batches * BATCH * s
    flops = tokens * encoder_flops_per_token(config, s)
    peak = chip_peak_flops(jax.devices()[0].device_kind)
    mfu = flops / best / peak if peak else None
    return mfu, tokens / best


def bench_dense_scale(k=7, d=384, m=64, reps=2, n_rows=1_000_000):
    """Dense top-k at corpus scale (1M x 384): f32 storage, bf16
    storage, and the two_pass f32-EXACT mode (bf16 prefilter + f32
    candidate rescore, DenseIndex(storage_dtype='two_pass')) — the
    north-star '<2 ms f32-exact' row measured where it is stressed.
    Same single-dispatch lax.scan pattern as bench_query_device_time."""
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.index.dense_index import (
        _find_two_pass_kernel,
        _row_norm_terms,
        _two_pass_error_terms,
    )
    from dial_rag_tpu.ops.metrics import Metric, pairwise_distances
    from dial_rag_tpu.ops.stable_topk import stable_topk_argmin

    out = {}
    for storage in ("float32", "bfloat16"):

        @jax.jit
        def gen(seed):
            kq, ke = jax.random.split(jax.random.PRNGKey(seed))
            emb = jax.random.normal(ke, (n_rows, d), jnp.float32).astype(
                jnp.dtype(storage)
            )
            queries = jax.random.normal(kq, (m, d), jnp.float32)
            return emb, queries

        @jax.jit
        def scan_find(emb, rn, queries):
            def step(carry, q):
                # the serving path caches row norms at build
                # (DenseIndex._rn2_cache): the norm term otherwise
                # costs a second full matrix pass per query at scale
                dists = pairwise_distances(
                    q, emb, Metric.SQEUCLIDEAN_DIST, rn
                )
                vals, idx = stable_topk_argmin(dists, k)
                return (
                    carry + jnp.sum(vals) + jnp.sum(idx.astype(jnp.float32)),
                    None,
                )

            return jax.lax.scan(step, jnp.float32(0), queries)[0]

        best = float("inf")
        for rep in range(reps + 1):
            emb, queries = jax.block_until_ready(gen(rep))
            rn = jax.block_until_ready(_row_norm_terms(emb))[0]
            t0 = time.perf_counter()
            float(scan_find(emb, rn, queries))
            if rep > 0:
                best = min(best, time.perf_counter() - t0)
        out[storage] = best / m * 1e3

    # two_pass: the f32-exact serving path (one fused dispatch per query:
    # bf16 scan + block-min candidate window + f32 rescore + check).
    # Rows pad to the same bucket DenseIndex uses (a _TP_BLK multiple).
    n_pad = 1 << (n_rows - 1).bit_length()

    @jax.jit
    def gen_tp(seed):
        kq, ke = jax.random.split(jax.random.PRNGKey(seed))
        emb32 = jax.random.normal(ke, (n_pad, d), jnp.float32)
        queries = jax.random.normal(kq, (m, d), jnp.float32)
        return emb32, emb32.astype(jnp.bfloat16), queries

    @jax.jit
    def scan_find_tp(emb16, emb32, err, queries):
        def step(carry, q):
            ok, vals, idx = _find_two_pass_kernel(
                emb16,
                emb32,
                q,
                jnp.int32(n_rows),
                *err,
                metric=Metric.SQEUCLIDEAN_DIST,
                k=k,
            )
            return (
                carry
                + jnp.sum(vals)
                + jnp.sum(idx.astype(jnp.float32))
                + ok.astype(jnp.float32),
                None,
            )

        return jax.lax.scan(step, jnp.float32(0), queries)[0]

    best = float("inf")
    for rep in range(reps + 1):
        emb32, emb16, queries = jax.block_until_ready(gen_tp(rep))
        err = jax.block_until_ready(_two_pass_error_terms(emb32))
        t0 = time.perf_counter()
        float(scan_find_tp(emb16, emb32, err, queries))
        if rep > 0:
            best = min(best, time.perf_counter() - t0)
    out["two_pass"] = best / m * 1e3
    return out["float32"], out["bfloat16"], out["two_pass"]


def bench_scale_10m(reps=2):
    """Single-chip order-of-magnitude scale proof (SURVEY §5 corpus
    scaling; index/bm25.py's '>10M-chunk layout' claim):

    - dense bf16 10M x 384 (7.4 GiB in HBM), per-query top-7 ms;
    - sparse BM25 at 10M items: dense band [10M, 128] + ~27M-posting
      CSC tail with a Zipf term profile. The arrays are synthesized ON
      DEVICE with the exact layout Bm25Index.build produces (term-major
      postings, item-ascending rows per term — the sorted-scatter
      contract): shipping a real 10M-item host build through the
      ~MB/s tunnel would add many minutes and measure nothing extra —
      query latency touches only the band matvec + tail windows;
    - late-interaction MaxSim at 1M chunks x 16 tokens bf16 (11.4 GiB).

    Runs sequentially, freeing each index before the next (together
    they exceed the 16 GiB chip). Returns a dict of bench keys + the
    HBM high-water mark if the backend exposes memory_stats."""
    import gc

    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.ops.metrics import Metric, pairwise_distances
    from dial_rag_tpu.ops.stable_topk import stable_topk_argmin

    out = {}
    hbm_peaks = []

    def note_hbm():
        try:
            stats = jax.devices()[0].memory_stats()
            hbm_peaks.append(stats.get("peak_bytes_in_use", 0))
        except Exception:
            pass

    # ---- dense bf16 @ 10M ------------------------------------------------
    n_rows, d, m, k = 10_000_000, 384, 16, 7

    @jax.jit
    def gen_dense10(seed):
        kq, ke = jax.random.split(jax.random.PRNGKey(seed))
        emb = jax.random.normal(ke, (n_rows, d), jnp.bfloat16)
        queries = jax.random.normal(kq, (m, d), jnp.float32)
        return emb, queries

    @jax.jit
    def scan_find10(emb, rn, queries):
        def step(carry, q):
            # serving caches row norms at build (DenseIndex._rn2_cache):
            # without them the norm term costs a SECOND full pass over
            # the 7.4 GiB matrix per query (measured 22.4 vs ~11 ms)
            dists = pairwise_distances(q, emb, Metric.SQEUCLIDEAN_DIST, rn)
            vals, idx = stable_topk_argmin(dists, k)
            return (
                carry + jnp.sum(vals) + jnp.sum(idx.astype(jnp.float32)),
                None,
            )

        return jax.lax.scan(step, jnp.float32(0), queries)[0]

    from dial_rag_tpu.index.dense_index import _row_norm_terms

    best = float("inf")
    emb = queries = None
    for rep in range(reps + 1):
        del emb, queries  # free the previous rep's 7.4 GiB first
        emb = queries = None
        emb, queries = jax.block_until_ready(gen_dense10(rep))
        rn = jax.block_until_ready(_row_norm_terms(emb))[0]
        t0 = time.perf_counter()
        float(scan_find10(emb, rn, queries))
        if rep > 0:
            best = min(best, time.perf_counter() - t0)
    out["query_10m_bf16_ms"] = best / m * 1e3

    # batched variant: the serving path under concurrency — the
    # micro-batcher coalesces in-flight queries into ONE
    # _find_batch_kernel dispatch whose [N, D] x [D, m] matmul reads
    # the corpus from HBM once for all m queries, so the per-query
    # bandwidth cost is 1/m of the sequential row above
    from dial_rag_tpu.index.dense_index import _find_batch_kernel

    best_b = float("inf")
    for rep in range(reps + 1):
        del emb, queries
        emb = queries = None
        emb, queries = jax.block_until_ready(gen_dense10(rep + 100))
        rn_b = jax.block_until_ready(_row_norm_terms(emb))[0]
        t0 = time.perf_counter()
        vals_b, _ = _find_batch_kernel(
            emb,
            queries,
            jnp.int32(n_rows),
            rn_b,
            metric=Metric.SQEUCLIDEAN_DIST,
            k=k,
            use_sort=False,
        )
        float(vals_b[0, 0])
        if rep > 0:
            best_b = min(best_b, time.perf_counter() - t0)
    out["query_10m_bf16_batch16_ms"] = best_b / m * 1e3
    note_hbm()
    del emb, queries
    gc.collect()

    # ---- dense int8 @ 10M and 30M -----------------------------------------
    # the quarter-byte capacity layout (DenseIndex storage_dtype="int8"):
    # s8 x s8 -> s32 MXU matmul over per-row absmax-quantized rows.
    # 30M x 384 int8 = 10.7 GiB — a corpus 3x the bf16 row's ceiling on
    # one chip (bf16 at 30M would be 21.5 GiB and OOM).
    from dial_rag_tpu.index.dense_index import (
        _int8_distances,
        _int8_quantize_query,
    )
    from dial_rag_tpu.ops.stable_topk import stable_topk_argmin as _tka

    for n_rows_i8, bench_key in (
        (10_000_000, "query_10m_int8_ms"),
        (30_000_000, "query_30m_int8_ms"),
    ):

        @jax.jit
        def gen_i8(seed, n_rows_i8=n_rows_i8):
            kq, ke, ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            # 16 slabs: the transient i32 randint slab must stay small
            # next to the 10.7 GiB int8 output at 30M rows
            n_chunks_gen = 16
            rows_per = n_rows_i8 // n_chunks_gen

            def gen_chunk(_, key):
                # draw int32 per slab (int8 randint is not supported on
                # all backends), cast down — the f32/i32 intermediate is
                # only rows_per x 384
                return None, jax.random.randint(
                    key, (rows_per, d), -127, 128, dtype=jnp.int32
                ).astype(jnp.int8)

            _, rows8 = jax.lax.scan(
                gen_chunk, None, jax.random.split(ke, n_chunks_gen)
            )
            rows8 = rows8.reshape(n_rows_i8, d)
            scales = jax.random.uniform(
                ks, (n_rows_i8,), jnp.float32, 0.005, 0.02
            )
            queries = jax.random.normal(kq, (m, d), jnp.float32)
            return rows8, scales, queries

        @jax.jit
        def norms_i8(rows8, scales):
            # sum of squares per row without materializing an f32 copy
            def body(_, slab):
                return None, jnp.sum(
                    slab.astype(jnp.float32) ** 2, axis=-1
                )

            slabs = rows8.reshape(16, -1, d)
            _, n2 = jax.lax.scan(body, None, slabs)
            return scales * scales * n2.reshape(-1)

        @jax.jit
        def scan_find_i8(rows8, scales, norm2, queries):
            def step(carry, q):
                q8, sq = _int8_quantize_query(q[None, :])
                qn2 = jnp.sum(q.astype(jnp.float32) ** 2)
                dists = _int8_distances(
                    rows8, scales, norm2, q8, sq, qn2,
                    Metric.SQEUCLIDEAN_DIST,
                )[0]
                vals, idx = _tka(dists, k)
                return (
                    carry + jnp.sum(vals) + jnp.sum(idx.astype(jnp.float32)),
                    None,
                )

            return jax.lax.scan(step, jnp.float32(0), queries)[0]

        best = float("inf")
        rows8 = scales = norm2 = queries = None
        for rep in range(reps + 1):
            del rows8, scales, norm2, queries
            rows8 = scales = norm2 = queries = None
            rows8, scales, queries = jax.block_until_ready(gen_i8(rep))
            norm2 = jax.block_until_ready(norms_i8(rows8, scales))
            t0 = time.perf_counter()
            float(scan_find_i8(rows8, scales, norm2, queries))
            if rep > 0:
                best = min(best, time.perf_counter() - t0)
        out[bench_key] = best / m * 1e3
        note_hbm()
        del rows8, scales, norm2, queries
        gc.collect()

    # ---- sparse BM25 @ 10M -----------------------------------------------
    from dial_rag_tpu.index.bm25 import _VSLICE, Bm25Index

    # 16 queries/dispatch: the sparse batch kernel materializes
    # [q_pad, n_pad] f32 scores — 128 queries at 10M rows would be
    # 5.1 GB of scores on top of the 5.1 GB band (measured OOM)
    #
    # Two term profiles, same 10M items / ~12 tokens per item:
    # - stress (v=512): every non-band query term still carries ~67k
    #   postings — an upper bound on tail-scatter work per query;
    # - realistic (v=64k): an English-scale vocabulary, so uniform
    #   query draws land on genuinely rare terms (median df ~300) and
    #   the high-df head rides the dense band — the serving-shaped row.
    n, q_terms, n_queries = 10_000_000, 4, 16
    rng = np.random.default_rng(17)

    def bm25_profile(v, key):
        ranks = np.arange(1, v + 1, dtype=np.float64)
        p = (1.0 / ranks) / (1.0 / ranks).sum()
        df = (n * (1.0 - (1.0 - p) ** 12)).astype(np.int64)
        heavy_mask = df >= max(n // 64, 64)
        heavy = np.nonzero(heavy_mask)[0]
        k_band = -(-len(heavy) // 128) * 128
        tail_df = np.where(heavy_mask, 0, df)
        nnz = int(tail_df.sum())

        @jax.jit
        def gen_band(seed):
            return jax.random.uniform(
                jax.random.PRNGKey(seed), (n, k_band), jnp.float32
            ) * 8.0

        cum = np.zeros(v + 1, dtype=np.int64)
        np.cumsum(tail_df, out=cum[1:])

        @jax.jit
        def gen_postings(seed):
            # term-major postings with item-ascending rows per term,
            # built without any host transfer: term_of[j] from the df
            # cumsum, then one 2-key lexicographic sort groups by term
            # and sorts rows within each term
            # nnz stays well under 2^31 for both profiles (~27M / ~71M
            # postings), so int32 positions are exact
            term_of = jnp.searchsorted(
                jnp.asarray(cum[1:].astype(np.int32)),
                jnp.arange(nnz, dtype=jnp.int32),
                "right",
            )
            row = jax.random.randint(
                jax.random.PRNGKey(seed), (nnz,), 0, n, dtype=jnp.int32
            )
            _, rows = jax.lax.sort((term_of, row), num_keys=2)
            vals = jax.random.uniform(
                jax.random.PRNGKey(seed + 1), (nnz,), jnp.float32
            )
            return (
                jnp.pad(rows, (0, _VSLICE)),
                jnp.pad(vals, (0, _VSLICE)),
            )

        index = Bm25Index(
            vocab={f"t{i}": i for i in range(v)},
            idf=np.ones(v, dtype=np.float64),
            n_items=n,
        )
        index._band_cols = {int(t): c for c, t in enumerate(heavy)}
        index._band_dev = gen_band(0)
        index._postings = (cum, *gen_postings(1))
        jax.block_until_ready((index._band_dev, index._postings[1]))

        best = float("inf")
        for rep in range(reps + 1):
            qs = [
                [f"t{t}" for t in rng.integers(0, v, size=q_terms)]
                for _ in range(n_queries)
            ]
            t0 = time.perf_counter()
            res = index.top_n_batch(qs, 7)
            assert len(res) == n_queries
            if rep > 0:
                best = min(
                    best, (time.perf_counter() - t0) / n_queries * 1e3
                )
        out[key] = best
        note_hbm()
        del index
        gc.collect()

    bm25_profile(512, "bm25_sparse_10m_ms")
    bm25_profile(65536, "bm25_sparse_10m_64kv_ms")

    # ---- MaxSim @ 1M chunks ----------------------------------------------
    from dial_rag_tpu.index.late_interaction import _maxsim_find_batch_kernel

    li_rows, t, nq, qp = 1_000_000, 16, 4, 8

    @jax.jit
    def gen_li(seed):
        # generate the 11.4 GiB bf16 tensor in chunks: a single
        # jax.random.normal materializes its f32 draw (22.9 GiB) before
        # the bf16 cast — measured OOM
        kx, kq = jax.random.split(jax.random.PRNGKey(seed))
        n_chunks_gen = 8
        rows_per = li_rows // n_chunks_gen

        def gen_chunk(_, key):
            return None, jax.random.normal(
                key, (rows_per, t, d), jnp.float32
            ).astype(jnp.bfloat16)

        _, x = jax.lax.scan(
            gen_chunk, None, jax.random.split(kx, n_chunks_gen)
        )
        x = x.reshape(li_rows, t, d)
        counts = jnp.full((li_rows,), t, jnp.int32)
        q = jax.random.normal(kq, (nq, qp, d), jnp.float32)
        q_counts = jnp.full((nq,), qp, jnp.int32)
        return x, counts, q, q_counts

    best = float("inf")
    x = counts = q = q_counts = None
    for rep in range(reps + 1):
        del x, counts, q, q_counts  # free the previous 11.4 GiB tensor
        x = counts = q = q_counts = None
        x, counts, q, q_counts = jax.block_until_ready(gen_li(rep))
        t0 = time.perf_counter()
        _, idx = _maxsim_find_batch_kernel(
            x, counts, jnp.int32(li_rows), q, q_counts, k=7, use_sort=False
        )
        np.asarray(idx)
        if rep > 0:
            best = min(best, (time.perf_counter() - t0) / nq * 1e3)
    out["maxsim_1m_ms"] = best
    note_hbm()
    del x, counts, q, q_counts
    gc.collect()

    # ---- MaxSim int8 @ 1M and 2M chunks ------------------------------------
    # the LI capacity layout (LateInteractionIndex storage_dtype="int8",
    # per-token absmax scales): 2M chunks x 16 tokens = 11.4 GiB int8 —
    # a corpus the bf16 tensor (22.9 GiB) cannot hold on one chip.
    # row counts are 512-multiples so _maxsim_scores' blocked streaming
    # engages (the serving index pads to 512 multiples via
    # _bucket_rows_li; a non-multiple falls back to ONE whole-corpus
    # block whose [N*T, lanes] sim transient measured OOM at 2M rows)
    for li_rows_i8, bench_key in (
        (999_424, "maxsim_1m_int8_ms"),
        (1_998_848, "maxsim_2m_int8_ms"),
    ):

        @jax.jit
        def gen_li8(seed, li_rows_i8=li_rows_i8):
            kx, ks, kq = jax.random.split(jax.random.PRNGKey(seed), 3)
            # in-place fori_loop writes into ONE preallocated int8
            # buffer: a lax.scan stacks its slab outputs and reshapes,
            # which peaked ~19 GiB at 2M rows (measured OOM) — here the
            # peak is the 11.4 GiB buffer + one 1.5 GiB i32 slab
            n_slabs = 32
            rows_per = li_rows_i8 // n_slabs
            buf = jnp.zeros((li_rows_i8, t, d), jnp.int8)

            def body(i, buf):
                slab = jax.random.randint(
                    jax.random.fold_in(kx, i),
                    (rows_per, t, d),
                    -127,
                    128,
                    dtype=jnp.int32,
                ).astype(jnp.int8)
                return jax.lax.dynamic_update_slice(
                    buf, slab, (i * rows_per, 0, 0)
                )

            x8 = jax.lax.fori_loop(0, n_slabs, body, buf)
            scales = jax.random.uniform(
                ks, (li_rows_i8, t), jnp.float32, 0.005, 0.02
            )
            counts = jnp.full((li_rows_i8,), t, jnp.int32)
            q = jax.random.normal(kq, (nq, qp, d), jnp.float32)
            q_counts = jnp.full((nq,), qp, jnp.int32)
            return x8, scales, counts, q, q_counts

        best = float("inf")
        x8 = scales = counts = q = q_counts = None
        for rep in range(reps + 1):
            del x8, scales, counts, q, q_counts
            x8 = scales = counts = q = q_counts = None
            x8, scales, counts, q, q_counts = jax.block_until_ready(
                gen_li8(rep)
            )
            t0 = time.perf_counter()
            _, idx = _maxsim_find_batch_kernel(
                x8,
                counts,
                jnp.int32(li_rows_i8),
                q,
                q_counts,
                scales,
                k=7,
                use_sort=False,
            )
            np.asarray(idx)
            if rep > 0:
                best = min(best, (time.perf_counter() - t0) / nq * 1e3)
        out[bench_key] = best
        note_hbm()
        del x8, scales, counts, q, q_counts
        gc.collect()

    if hbm_peaks:
        out["hbm_peak_gib"] = max(hbm_peaks) / 2**30
    return out


def _bm25_corpus(rng, n_items, vocab_size, tokens_per_item=12):
    """Synthetic tokenized corpus with a Zipf-ish term distribution."""
    ranks = np.arange(1, vocab_size + 1)
    p = 1.0 / ranks
    p /= p.sum()
    draws = rng.choice(vocab_size, size=(n_items, tokens_per_item), p=p)
    return [[f"t{t}" for t in row] for row in draws]


def bench_bm25_scale(n_items=1_000_000, q_terms=4, n_queries=128, reps=2):
    """BM25 query latency at 1M items for BOTH device layouts:

    - dense [N, V] weights (one MXU matmul for the whole query batch) —
      the weight matrix is GENERATED ON DEVICE (shipping a real 2 GB
      host build through the ~MB/s tunnel would add minutes per bench
      run and measure nothing extra: query latency only touches the
      matmul + top-k kernel);
    - row-sharded CSC postings (REAL build) on a 1-device mesh — the
      same scatter-add kernel the >10M-chunk sharded layout runs, which
      executes each query batch in ONE dispatch (the single-chip
      bucketed path dispatches per posting-length bucket and would
      measure tunnel RTT, not chip time).

    Both paths return host arrays (an honest D2H) and amortize the
    dispatch over ``n_queries`` queries.
    """
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.index.bm25 import (
        Bm25Index,
        _bm25_topk_batch_kernel,
    )
    from dial_rag_tpu.ops.stable_topk import _ARGMIN_MAX_K
    from dial_rag_tpu.parallel.sharded_index import ShardedBm25SparseIndex
    from jax.sharding import Mesh

    rng = np.random.default_rng(3)
    v_pad = 512
    n_pad = -(-n_items // 8) * 8

    @jax.jit
    def gen_dense(seed):
        kw, kq = jax.random.split(jax.random.PRNGKey(seed))
        w = jax.random.uniform(kw, (n_pad, v_pad), jnp.float32) * 8.0
        qmat = (
            jax.random.uniform(kq, (v_pad, n_queries), jnp.float32) < 0.01
        ).astype(jnp.float32)
        return w, qmat

    dense_ms = float("inf")
    for rep in range(reps + 1):
        w, qmat = jax.block_until_ready(gen_dense(rep))
        t0 = time.perf_counter()
        _, idx = _bm25_topk_batch_kernel(
            w, qmat, jnp.int32(n_items), k=7, use_sort=7 > _ARGMIN_MAX_K
        )
        np.asarray(idx)
        if rep > 0:
            dense_ms = min(
                dense_ms, (time.perf_counter() - t0) / n_queries * 1e3
            )

    items = _bm25_corpus(rng, n_items, vocab_size=512)
    queries = [
        [f"t{t}" for t in rng.integers(0, 512, size=q_terms)]
        for _ in range(n_queries)
    ]

    # single-chip CSC with the dense band (high-df terms ride an MXU
    # matvec; the tail scatters) — the serving layout past the dense
    # [N, V] byte cap
    banded = Bm25Index.build(items, max_dense_bytes=0)
    banded_ms = float("inf")
    for rep in range(reps + 1):
        qs = (
            queries
            if rep == 0
            else [
                [f"t{t}" for t in rng.integers(0, 512, size=q_terms)]
                for _ in range(n_queries)
            ]
        )
        t0 = time.perf_counter()
        out = banded.top_n_batch(qs, 7)
        assert len(out) == n_queries
        if rep > 0:
            banded_ms = min(
                banded_ms, (time.perf_counter() - t0) / n_queries * 1e3
            )
    del banded

    sparse_base = Bm25Index.build(items, max_dense_bytes=0, device=False)
    mesh = Mesh(np.array(jax.devices()[:1]), ("idx",))
    sparse = ShardedBm25SparseIndex(sparse_base, mesh, limit=7)
    sparse_ms = float("inf")
    for rep in range(reps + 1):
        qs = (
            queries
            if rep == 0
            else [
                [f"t{t}" for t in rng.integers(0, 512, size=q_terms)]
                for _ in range(n_queries)
            ]
        )
        t0 = time.perf_counter()
        out = sparse.top_n_batch(qs, 7)
        assert len(out) == n_queries
        if rep > 0:
            sparse_ms = min(
                sparse_ms, (time.perf_counter() - t0) / n_queries * 1e3
            )
    return dense_ms, banded_ms, sparse_ms


def bench_maxsim_scale(
    n_rows=100_000, t=16, d=384, nq=16, qp=8, k=7, reps=2
):
    """Late-interaction (MaxSim) ms/query at 100k chunks x 16 tokens,
    bf16 storage: one batched kernel dispatch scores all ``nq`` queries
    against the full token tensor (the serving find_batch path), timed
    around a D2H of the result indices."""
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.index.late_interaction import (
        _maxsim_find_batch_kernel,
    )

    @jax.jit
    def gen(seed):
        kx, kq = jax.random.split(jax.random.PRNGKey(seed))
        x = jax.random.normal(kx, (n_rows, t, d), jnp.float32).astype(
            jnp.bfloat16
        )
        counts = jnp.full((n_rows,), t, jnp.int32)
        q = jax.random.normal(kq, (nq, qp, d), jnp.float32)
        q_counts = jnp.full((nq,), qp, jnp.int32)
        return x, counts, q, q_counts

    best = float("inf")
    for rep in range(reps + 1):
        x, counts, q, q_counts = jax.block_until_ready(gen(rep))
        t0 = time.perf_counter()
        vals, idx = _maxsim_find_batch_kernel(
            x, counts, jnp.int32(n_rows), q, q_counts, k=k, use_sort=False
        )
        np.asarray(idx)  # honest fetch
        if rep > 0:
            best = min(best, time.perf_counter() - t0)
    return best / nq * 1e3


def bench_query_device_time(k=7, n_rows=100_000, d=384, m=256, reps=3):
    """Amortized per-query device time for a dense top-k lookup.

    The remote-TPU tunnel adds ~100 ms RTT per dispatch, so a naive
    per-call timing measures the tunnel, not the chip (ROADMAP item 5).
    Instead m sequential single-query finds run inside ONE dispatch via
    lax.scan — same ops as DenseIndex.find (HIGHEST-precision distance
    pass + stable top-k) — and the dispatch is timed end to end.
    Inputs are regenerated per rep (the tunnel memoizes identical
    dispatches); min over reps is reported."""
    import jax
    import jax.numpy as jnp

    from dial_rag_tpu.ops.metrics import Metric, pairwise_distances
    from dial_rag_tpu.ops.stable_topk import stable_topk_argmin

    @jax.jit
    def gen(seed):
        kq, ke = jax.random.split(jax.random.PRNGKey(seed))
        emb = jax.random.normal(ke, (n_rows, d), jnp.float32)
        queries = jax.random.normal(kq, (m, d), jnp.float32)
        return emb, queries

    @jax.jit
    def scan_find(emb, rn, queries):
        def step(carry, q):
            # serving caches row norms at build (DenseIndex._rn2_cache)
            dists = pairwise_distances(q, emb, Metric.SQEUCLIDEAN_DIST, rn)
            vals, idx = stable_topk_argmin(dists, k)
            return carry + jnp.sum(vals) + jnp.sum(idx.astype(jnp.float32)), None
        # scalar result: forces a real fetch (see bench_encoder_mfu)
        return jax.lax.scan(step, jnp.float32(0), queries)[0]

    from dial_rag_tpu.index.dense_index import _row_norm_terms

    best = float("inf")
    for rep in range(reps + 1):  # rep 0 is compile warmup
        emb, queries = jax.block_until_ready(gen(rep))
        rn = jax.block_until_ready(_row_norm_terms(emb))[0]
        t0 = time.perf_counter()
        float(scan_find(emb, rn, queries))
        if rep > 0:
            best = min(best, time.perf_counter() - t0)
    return best / m * 1e3  # ms per query


def bench_service_level():
    """End-to-end service latency (tools/bench_service.py): the real
    aiohttp app + fake Dial core, retrieval-type requests over
    pre-persisted 100k- and 1M-chunk indexes. NOTE: through the remote
    TPU tunnel each device dispatch pays ~60-100 ms RTT that a
    locally-attached chip does not — see the module docstring."""
    import asyncio

    from tools.bench_service import run_service_bench

    out = {}
    for n, reps in ((100_000, 15), (1_000_000, 8)):
        # the 100k profile also runs a 16-in-flight concurrent phase:
        # QPS under load is the production serving number (the query
        # micro-batcher coalesces concurrent encodes into one dispatch,
        # amortizing the tunnel RTT that dominates the serial p50)
        conc = 16 if n == 100_000 else 0
        r = asyncio.run(run_service_bench(n, reps=reps, concurrency=conc))
        tag = "100k" if n == 100_000 else "1m"
        out[f"service_retrieval_p50_ms_{tag}"] = round(r["p50_ms"], 2)
        out[f"service_retrieval_p95_ms_{tag}"] = round(r["p95_ms"], 2)
        if "qps" in r:
            out[f"service_retrieval_qps_c16_{tag}"] = r["qps"]
            out[f"service_retrieval_c16_p95_ms_{tag}"] = round(
                r["concurrent_p95_ms"], 2
            )
    # three-arm profile (dense + BM25 + late interaction): exercises the
    # device-resident MaxSim query path end to end. 20k chunks keeps the
    # one-time LI index upload through the tunnel bounded (~123 MB bf16).
    # Best-effort: a tunnel hiccup here must not cost the headline line
    try:
        r = asyncio.run(run_service_bench(20_000, reps=10, with_li=True))
        out["service_retrieval_li_p50_ms_20k"] = round(r["p50_ms"], 2)
        out["service_retrieval_li_p95_ms_20k"] = round(r["p95_ms"], 2)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"LI service profile failed: {e!r}", file=sys.stderr)
    # char-n-gram arm profile (dense + BM25 + chargram): the round-4
    # tuned zero-egress profile's model-free component, end to end —
    # REAL gram index build (native core) + its device scan per request
    try:
        r = asyncio.run(
            run_service_bench(20_000, reps=10, with_chargram=True)
        )
        out["service_retrieval_cg_p50_ms_20k"] = round(r["p50_ms"], 2)
        out["service_retrieval_cg_p95_ms_20k"] = round(r["p95_ms"], 2)
    except Exception as e:  # noqa: BLE001
        import sys

        print(f"chargram service profile failed: {e!r}", file=sys.stderr)
    return out


def bench_cpu_reference(texts, tok, config):
    """Reference compute path: the same encoder architecture on CPU torch."""
    import torch
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_layers,
        num_attention_heads=config.num_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_cfg)
    model.eval()

    def build(texts):
        outs = []
        with torch.no_grad():
            for i in range(0, len(texts), BATCH):
                ids, mask = tok.encode_batch(texts[i : i + BATCH])
                h = model(
                    input_ids=torch.from_numpy(ids.astype(np.int64)),
                    attention_mask=torch.from_numpy(mask.astype(np.int64)),
                ).last_hidden_state
                cls = h[:, 0, :]
                outs.append(torch.nn.functional.normalize(cls, dim=1))
        return torch.cat(outs)

    build(texts[:8])  # warm
    t0 = time.perf_counter()
    build(texts)
    dt = time.perf_counter() - t0
    return len(texts) / dt


def main():
    import jax

    from dial_rag_tpu.runtime.compile_cache import (
        default_cache_dir,
        init_compilation_cache,
    )

    # Persist compiled executables across runs: through the remote-TPU
    # tunnel a cold compile of the fused encoder costs many minutes, and
    # the remote compile service's own cache does not survive restarts.
    # The jax persistent cache verifiably round-trips axon executables,
    # so the pain is paid once per machine.
    init_compilation_cache(default_cache_dir())

    from dial_rag_tpu.models.bert import BertConfig, init_params
    from dial_rag_tpu.models.tokenizer import (
        WordPieceTokenizer,
        build_test_vocab,
    )

    rng = np.random.default_rng(0)
    texts = make_corpus(rng, N_CHUNKS)
    vocab = build_test_vocab(sorted(set(" ".join(texts).split())), size=4096)
    tok = WordPieceTokenizer(vocab=vocab)

    config = BertConfig.bge_small_en()

    def _stage(name):
        # progress to stderr (stdout stays one JSON line for the driver);
        # remote compiles through the tunnel can block silently for
        # minutes, so each stage announces itself up front
        print(f"[bench] {name}", file=sys.stderr, flush=True)

    # init on host, transfer once: eager per-op RNG dispatches through the
    # remote-TPU tunnel are ~100ms each, which would add minutes here
    _stage("init params + transfer")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    _stage("index build throughput (bench_tpu)")
    tpu_rate, dt, timed_texts = bench_tpu(texts, tok, params, config)
    _stage("encoder MFU")
    mfu, device_tokens_per_sec = bench_encoder_mfu(params, config)
    _stage("dense query 100k")
    query_ms = bench_query_device_time()
    _stage("dense 1M scale")
    dense_1m_f32_ms, dense_1m_bf16_ms, dense_1m_exact_ms = bench_dense_scale()
    _stage("BM25 1M scale")
    bm25_dense_1m_ms, bm25_sparse_1m_ms, bm25_sparse_sharded_1m_ms = bench_bm25_scale()
    _stage("MaxSim 100k")
    maxsim_100k_ms = bench_maxsim_scale()
    # service before the 10M churn: the tunnel's throughput drifts
    # within long windows, and the concurrent-QPS row is the most
    # variance-sensitive measurement in the run
    _stage("service-level latency")
    service = bench_service_level()
    _stage("10M/30M scale proofs")
    scale_10m = bench_scale_10m()
    _stage("CPU reference rate")
    cpu_rate = bench_cpu_reference(texts[:CPU_CHUNKS], tok, config)

    real_tokens = count_real_tokens(timed_texts, tok)
    device_kind = jax.devices()[0].device_kind
    peak = chip_peak_flops(device_kind)

    print(
        json.dumps(
            {
                "metric": "index_build_chunks_per_sec",
                "value": round(tpu_rate, 1),
                "unit": "chunks/s",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
                # end-to-end pipeline token rate (host tokenize +
                # transfer + encode + index append); rides the tunnel's
                # wall clock like the headline number
                "tokens_per_sec": round(real_tokens / dt, 1),
                # device-honest figures from single-dispatch scans
                "mfu": round(mfu, 4) if mfu is not None else None,
                "device_tokens_per_sec": round(device_tokens_per_sec, 1),
                "device_kind": device_kind,
                "peak_tflops_bf16": peak / 1e12 if peak else None,
                "query_device_ms": round(query_ms, 4),
                # corpus-scale retrieval rows (1M items; single-dispatch
                # honest — see bench_dense_scale/bench_bm25_scale/
                # bench_maxsim_scale)
                "query_1m_f32_ms": round(dense_1m_f32_ms, 4),
                "query_1m_bf16_ms": round(dense_1m_bf16_ms, 4),
                # f32-EXACT two-pass (bf16 prefilter + f32 rescore,
                # storage_dtype='two_pass') — the north-star <2 ms row
                # with full f32 semantics
                "query_1m_f32_exact_ms": round(dense_1m_exact_ms, 4),
                "bm25_dense_1m_ms": round(bm25_dense_1m_ms, 4),
                "bm25_sparse_1m_ms": round(bm25_sparse_1m_ms, 4),
                "bm25_sparse_sharded_1m_ms": round(
                    bm25_sparse_sharded_1m_ms, 4
                ),
                "maxsim_100k_ms": round(maxsim_100k_ms, 4),
                # 10M-item single-chip scale proofs (bench_scale_10m)
                **{
                    key: round(value, 4)
                    for key, value in scale_10m.items()
                },
                # end-to-end service latency (remote-tunnel RTT floor
                # applies: ~60-100 ms per device dispatch — see
                # tools/bench_service.py)
                **service,
            }
        )
    )


if __name__ == "__main__":
    main()
