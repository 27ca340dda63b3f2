"""Row-sharded dense retrieval index over a device mesh.

Scale-out of the dense scan (SURVEY §7 step 10). The single-chip path
(dial_rag_tpu/index/dense_index.py) keeps one flat ``[N, D]`` matrix in
HBM; here the matrix is sharded row-wise across ALL mesh devices, each
device computes distances + a *stable* local top-k over its rows via
``shard_map``, and the tiny ``[n_shards, k]`` winner lists ride one ICI
all-gather into a replicated stable merge. Equivalence with the
reference's per-document numpy scan (aidial_rag/retrievers/
embeddings_index.py:51-89) carries over from the flat index argument
(see dense_index.py module docstring) plus one observation:

* ties across shards — the concatenated winner lists are ordered by
  (shard, local stable rank). For equal distances, local stable rank
  equals local row order, so concatenation order equals *global* row
  order; the final stable merge therefore breaks ties by global row,
  exactly like one big stable argsort.

The memory-bound distance matvec streams each shard's rows from its own
HBM, so query bandwidth scales linearly with the number of chips; the
merge moves only ``n_shards * k * 8`` bytes over ICI.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dial_rag_tpu.index.dense_index import (
    DocEmbeddings,
    _int8_distances,
    _int8_quantize_query,
    _two_pass_bound,
    _two_pass_error_terms,
    _two_pass_select,
    hits_from_topk,
)
from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.ops.metrics import Metric, pairwise_distances
from dial_rag_tpu.ops.stable_topk import (
    _ARGMIN_MAX_K,
    stable_topk_argmin,
    stable_topk_sort,
)

_ROW_BLOCK = 512  # per-shard row padding quantum (jit-cache friendly)


def _bucket_rows_sharded(n: int, n_shards: int) -> int:
    """Pad total rows so every shard holds the same _ROW_BLOCK-aligned count."""
    per_shard = -(-max(n, 1) // n_shards)
    per_shard = -(-per_shard // _ROW_BLOCK) * _ROW_BLOCK
    return per_shard * n_shards


def _merge_shard_winners(vals, idx, k):
    """[n_shards, k] winner lists -> global (vals[:k], idx[:k]) via one
    replicated stable sort. Concatenation order == global row order
    among ties (module docstring), so stability finishes the job."""
    flat_vals = vals.reshape(-1)
    flat_idx = idx.reshape(-1)
    order = jnp.arange(flat_vals.shape[0], dtype=jnp.int32)
    merged_vals, merged_order = jax.lax.sort(
        (flat_vals, order), num_keys=1, is_stable=True
    )
    return merged_vals[:k], flat_idx[merged_order[:k]]


def _merge_shard_winners_batch(vals, idx, k):
    """Per-query variant: [n_shards, Q, k] winner lists -> ([Q, k],
    [Q, k]), one stable merge per query."""
    q = vals.shape[1]
    flat_vals = vals.transpose(1, 0, 2).reshape(q, -1)
    flat_idx = idx.transpose(1, 0, 2).reshape(q, -1)
    order = jnp.broadcast_to(
        jnp.arange(flat_vals.shape[1], dtype=jnp.int32), flat_vals.shape
    )
    merged_vals, merged_order = jax.lax.sort(
        (flat_vals, order), num_keys=1, is_stable=True, dimension=-1
    )
    merged_idx = jnp.take_along_axis(flat_idx, merged_order, axis=-1)
    return merged_vals[:, :k], merged_idx[:, :k]


@partial(
    jax.jit,
    static_argnames=("mesh", "metric", "k", "use_sort"),
)
def _sharded_find_kernel(
    emb, query, n_valid, row_norm2=None, *, mesh, metric, k, use_sort
):
    n_shards = mesh.devices.size
    rows_per_shard = emb.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(emb_local, query, n_valid, *rn):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        dists = pairwise_distances(
            query, emb_local, metric, rn[0] if rn else None
        )
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row < n_valid, dists, jnp.inf)
        vals, idx = topk(dists, k)
        # keepdims: out_specs concatenate along the leading shard axis
        return vals[None], (base + idx)[None]

    operands = (emb, query, n_valid)
    in_specs = [P("idx", None), P(), P()]
    if row_norm2 is not None:
        operands = operands + (row_norm2,)
        in_specs.append(P("idx"))
    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx")),
    )(*operands)

    return _merge_shard_winners(vals, idx, k)


@partial(
    jax.jit,
    static_argnames=("mesh", "metric", "k", "use_sort"),
)
def _sharded_find_batch_kernel(
    emb, queries, n_valid, row_norm2=None, *, mesh, metric, k, use_sort
):
    """[Q, D] queries: per-shard batched scan + vmapped local top-k, then
    a per-query stable merge of the gathered winner lists."""
    from dial_rag_tpu.ops.metrics import pairwise_distances_batch

    n_shards = mesh.devices.size
    rows_per_shard = emb.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(emb_local, queries, n_valid, *rn):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        dists = pairwise_distances_batch(
            queries, emb_local, metric, rn[0] if rn else None
        )
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row[None, :] < n_valid, dists, jnp.inf)
        vals, idx = jax.vmap(lambda d: topk(d, k))(dists)  # [Q, k]
        return vals[None], (base + idx)[None]

    operands = (emb, queries, n_valid)
    in_specs = [P("idx", None), P(), P()]
    if row_norm2 is not None:
        operands = operands + (row_norm2,)
        in_specs.append(P("idx"))
    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx")),
    )(*operands)  # [n_shards, Q, k]

    return _merge_shard_winners_batch(vals, idx, k)


@partial(jax.jit, static_argnames=("mesh", "metric", "k", "use_sort"))
def _sharded_find_int8_kernel(
    emb_i8, scales, row_norm2, query, n_valid, *, mesh, metric, k, use_sort
):
    """Row-sharded int8 capacity scan: the quantized rows, per-row
    scales, and exact dequantized norms shard together row-wise; each
    shard runs the same s8 x s8 -> s32 MXU scan as the single-chip
    kernel (dense_index._int8_distances) over its own quarter-size
    slice, so 8 chips serve 8x the single-chip 30M-row capacity."""
    n_shards = mesh.devices.size
    rows_per_shard = emb_i8.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(emb_l, scales_l, norm2_l, query, n_valid):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        q8, sq = _int8_quantize_query(query[None, :])
        q_norm2 = jnp.sum(query.astype(jnp.float32) ** 2)
        dists = _int8_distances(
            emb_l, scales_l, norm2_l, q8, sq, q_norm2, metric
        )[0]
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row < n_valid, dists, jnp.inf)
        vals, idx = topk(dists, k)
        return vals[None], (base + idx)[None]

    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P("idx", None), P("idx"), P("idx"), P(), P()),
        out_specs=(P("idx"), P("idx")),
    )(emb_i8, scales, row_norm2, query, n_valid)

    return _merge_shard_winners(vals, idx, k)


@partial(jax.jit, static_argnames=("mesh", "metric", "k", "use_sort"))
def _sharded_find_int8_batch_kernel(
    emb_i8, scales, row_norm2, queries, n_valid, *, mesh, metric, k, use_sort
):
    n_shards = mesh.devices.size
    rows_per_shard = emb_i8.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(emb_l, scales_l, norm2_l, queries, n_valid):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        q8, sq = _int8_quantize_query(queries)
        q_norm2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)[
            :, None
        ]
        dists = _int8_distances(
            emb_l, scales_l, norm2_l, q8, sq, q_norm2, metric
        )  # [Q, rows]
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row[None, :] < n_valid, dists, jnp.inf)
        vals, idx = jax.vmap(lambda d: topk(d, k))(dists)  # [Q, k]
        return vals[None], (base + idx)[None]

    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P("idx", None), P("idx"), P("idx"), P(), P()),
        out_specs=(P("idx"), P("idx")),
    )(emb_i8, scales, row_norm2, queries, n_valid)

    return _merge_shard_winners_batch(vals, idx, k)


@partial(jax.jit, static_argnames=("mesh", "metric", "k"))
def _sharded_find_two_pass_kernel(
    emb_bf16, emb_f32, query, n_valid, err_a, err_b, norm_max,
    *, mesh, metric, k,
):
    """Row-sharded f32-exact two-pass scan. Both copies shard together
    row-wise; every shard runs the single-chip certified pipeline
    (dense_index._two_pass_select) against its own rows with a LOCAL
    validity bound, producing an exact local top-k plus an ok flag.
    Exactness composition: the global top-k is contained in the union of
    exact local top-ks, and local stable rank == local row order among
    ties, so the replicated stable merge reproduces the full f32 scan's
    selection AND tie order. ``ok`` is the AND over shards — any shard's
    containment failure routes the caller to the sharded full f32 scan.
    The error terms are GLOBAL maxima (computed over the whole matrix at
    build), sound for every shard."""
    sel_metric = (
        Metric.SQEUCLIDEAN_DIST
        if metric == Metric.EUCLIDEAN_DIST
        else metric
    )
    n_shards = mesh.devices.size
    rows_per_shard = emb_bf16.shape[0] // n_shards

    def local(bf16_l, f32_l, query, n_valid, err_a, err_b, norm_max):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        n_valid_local = jnp.clip(n_valid - base, 0, rows_per_shard)
        s1 = pairwise_distances(query, bf16_l, sel_metric)
        row = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        s1 = jnp.where(row < n_valid_local, s1, jnp.inf)
        e_bound = _two_pass_bound(
            query, err_a, err_b, norm_max, bf16_l.shape[1], sel_metric
        )
        ok, vals, idx = _two_pass_select(
            f32_l, s1, query, n_valid_local, e_bound, metric=metric, k=k
        )
        # a shard with no valid rows (tiny corpus, all padding) is
        # trivially exact, but its all-inf scores make the containment
        # check compare inf > inf -> False; don't let it force fallback
        ok = jnp.logical_or(n_valid_local == 0, ok)
        return ok[None], vals[None], (base + idx)[None]

    ok, vals, idx = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("idx", None), P("idx", None), P(), P(), P(), P(), P()),
        out_specs=(P("idx"), P("idx"), P("idx")),
    )(emb_bf16, emb_f32, query, n_valid, err_a, err_b, norm_max)

    mvals, midx = _merge_shard_winners(vals, idx, k)
    return jnp.all(ok), mvals, midx


@partial(jax.jit, static_argnames=("mesh", "metric", "k"))
def _sharded_find_two_pass_batch_kernel(
    emb_bf16, emb_f32, queries, n_valid, err_a, err_b, norm_max,
    *, mesh, metric, k,
):
    """Batched sharded two-pass: one bf16 matmul per shard shared across
    queries, vmapped candidate select/rescore, per-query stable merge.
    Returns (ok[Q] — ANDed over shards per query, vals[Q,k], idx[Q,k])."""
    from dial_rag_tpu.ops.metrics import pairwise_distances_batch

    sel_metric = (
        Metric.SQEUCLIDEAN_DIST
        if metric == Metric.EUCLIDEAN_DIST
        else metric
    )
    n_shards = mesh.devices.size
    rows_per_shard = emb_bf16.shape[0] // n_shards

    def local(bf16_l, f32_l, queries, n_valid, err_a, err_b, norm_max):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        n_valid_local = jnp.clip(n_valid - base, 0, rows_per_shard)
        s1 = pairwise_distances_batch(queries, bf16_l, sel_metric)
        row = jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        s1 = jnp.where(row[None, :] < n_valid_local, s1, jnp.inf)

        def per_query(query, s1_q):
            e_bound = _two_pass_bound(
                query, err_a, err_b, norm_max, bf16_l.shape[1], sel_metric
            )
            return _two_pass_select(
                f32_l,
                s1_q,
                query,
                n_valid_local,
                e_bound,
                metric=metric,
                k=k,
            )

        ok, vals, idx = jax.vmap(per_query)(queries, s1)
        ok = jnp.logical_or(n_valid_local == 0, ok)  # empty-shard guard
        return ok[None], vals[None], (base + idx)[None]

    ok, vals, idx = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("idx", None), P("idx", None), P(), P(), P(), P(), P()),
        out_specs=(P("idx"), P("idx"), P("idx")),
    )(emb_bf16, emb_f32, queries, n_valid, err_a, err_b, norm_max)

    mvals, midx = _merge_shard_winners_batch(vals, idx, k)
    return jnp.all(ok, axis=0), mvals, midx


class ShardedDenseIndex:
    """Dense index with rows sharded over every device of a mesh.

    Same host-facing API as ``DenseIndex`` (find / find_with_distances);
    construction places each row shard on its device via
    ``jax.device_put`` with a NamedSharding so no resharding happens at
    query time.
    """

    def __init__(
        self,
        retrieval_type: RetrievalType,
        doc_embeddings: list[DocEmbeddings],
        mesh: Mesh,
        metric: Metric | str = Metric.SQEUCLIDEAN_DIST,
        limit: int = 1,
        storage_dtype: str = "float32",
    ):
        self.retrieval_type = retrieval_type
        self.metric = Metric(metric)
        self.limit = limit
        self.storage_dtype = storage_dtype
        self._emb_f32 = None  # two_pass: sharded f32 rescore copy
        self._scales = None  # int8: sharded per-row scales
        self._row_norm2 = None
        if (
            storage_dtype in ("two_pass", "int8")
            and self.metric == Metric.COSINE_SIM
        ):
            raise ValueError(
                f"{storage_dtype} storage does not support cosine_sim "
                "(see DenseIndex); use float32"
            )
        # one flat shard axis over every device in the mesh
        self._mesh = Mesh(
            mesh.devices.reshape(-1), ("idx",)
        )
        self.n_shards = self._mesh.devices.size

        non_empty = [(i, d) for i, d in enumerate(doc_embeddings) if d.num_rows]
        self.n_rows = sum(d.num_rows for _, d in non_empty)
        if self.n_rows == 0:
            self._emb = None
            return

        doc_ids = np.concatenate(
            [np.full(d.num_rows, i, dtype=np.int64) for i, d in non_empty]
        )
        chunk_ids = np.concatenate([d.chunk_ids for _, d in non_empty])
        emb = np.concatenate([d.embeddings for _, d in non_empty], axis=0)

        n_pad = _bucket_rows_sharded(self.n_rows, self.n_shards)
        if n_pad != self.n_rows:
            emb = np.pad(emb, ((0, n_pad - self.n_rows), (0, 0)))
        self._doc_ids = doc_ids
        self._chunk_ids = chunk_ids
        row_sharding = NamedSharding(self._mesh, P("idx", None))
        vec_sharding = NamedSharding(self._mesh, P("idx"))
        if storage_dtype == "two_pass":
            # both copies shard together row-wise; the error terms are
            # global maxima (sound for every shard's local certificate)
            self._emb_f32 = jax.device_put(
                emb.astype(np.float32), row_sharding
            )
            self._emb = self._emb_f32.astype(jnp.bfloat16)
            self._err = _two_pass_error_terms(self._emb_f32)
        elif storage_dtype == "int8":
            # same host-side per-row absmax quantization + exact
            # dequantized norms as DenseIndex, uploaded pre-sharded
            emb = emb.astype(np.float32)
            absmax = np.max(np.abs(emb), axis=1)
            scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(
                np.float32
            )
            q = np.rint(emb / scales[:, None]).astype(np.int8)
            norm2 = (
                scales.astype(np.float64) ** 2
                * (q.astype(np.float64) ** 2).sum(axis=1)
            ).astype(np.float32)
            self._emb = jax.device_put(q, row_sharding)
            self._scales = jax.device_put(scales, vec_sharding)
            self._row_norm2 = jax.device_put(norm2, vec_sharding)
        else:
            self._emb = jax.device_put(
                emb.astype(np.dtype(storage_dtype)), row_sharding
            )
            # cached row norms (sharded with their rows): the norm term
            # otherwise costs each shard a second full pass over its
            # slice per query (see dense_index._row_norm_terms)
            x = self._emb.astype(jnp.float32)
            self._rn2_sh = jax.jit(
                lambda x: jnp.sum(x * x, axis=1)
            )(x)

    @property
    def nbytes(self) -> int:
        if self._emb is None:
            return 0
        total = self._emb.size * self._emb.dtype.itemsize
        if self._emb_f32 is not None:
            total += self._emb_f32.size * self._emb_f32.dtype.itemsize
        if self._scales is not None:
            total += self._scales.size * 4 + self._row_norm2.size * 4
        return total

    def find(self, query: np.ndarray) -> list[SearchHit]:
        hits, _ = self.find_with_distances(query)
        return hits

    def warm_query_buckets(self, max_q: int = 64) -> None:
        """Compile-ahead of the sharded single + batched scan kernels
        at every power-of-two wave bucket (same serving rationale as
        DenseIndex.warm_query_buckets; mesh deployments pay the same
        mid-request jit compiles without it)."""
        if self._emb is None:
            return
        d = self._emb.shape[1]
        self.find(np.zeros(d, dtype=np.float32))
        q = 8
        while q <= max_q:
            self.find_batch(np.zeros((q, d), dtype=np.float32))
            q *= 2

    def find_batch(self, queries: np.ndarray) -> list[list[SearchHit]]:
        """Per-query hits for ``queries`` [Q, D] in one sharded dispatch
        (same semantics as DenseIndex.find_batch)."""
        queries = np.asarray(queries, dtype=np.float32)
        q = queries.shape[0]
        if q == 0 or self._emb is None:
            return [[] for _ in range(q)]
        q_pad = 1 << max(3, (q - 1).bit_length())
        if q_pad != q:
            queries = np.pad(queries, ((0, q_pad - q), (0, 0)))
        k = min(self.limit, self.n_rows)
        if self._emb_f32 is not None:
            ok, vals, idx = _sharded_find_two_pass_batch_kernel(
                self._emb,
                self._emb_f32,
                jnp.asarray(queries),
                jnp.int32(self.n_rows),
                *self._err,
                mesh=self._mesh,
                metric=self.metric,
                k=k,
            )
            ok, vals, idx = jax.device_get((ok, vals, idx))
            if not bool(ok[:q].all()):
                # containment failed on some shard: the sharded full f32
                # scan keeps the exactness guarantee
                vals, idx = jax.device_get(
                    _sharded_find_batch_kernel(
                        self._emb_f32,
                        jnp.asarray(queries),
                        jnp.int32(self.n_rows),
                        mesh=self._mesh,
                        metric=self.metric,
                        k=k,
                        use_sort=k > _ARGMIN_MAX_K,
                    )
                )
        elif self._scales is not None:
            vals, idx = _sharded_find_int8_batch_kernel(
                self._emb,
                self._scales,
                self._row_norm2,
                jnp.asarray(queries),
                jnp.int32(self.n_rows),
                mesh=self._mesh,
                metric=self.metric,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        else:
            vals, idx = _sharded_find_batch_kernel(
                self._emb,
                jnp.asarray(queries),
                jnp.int32(self.n_rows),
                getattr(self, "_rn2_sh", None),
                mesh=self._mesh,
                metric=self.metric,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        vals = np.asarray(vals)[:q]
        idx = np.asarray(idx)[:q]
        return [
            hits_from_topk(
                vals[qi],
                idx[qi],
                self.n_rows,
                self._doc_ids,
                self._chunk_ids,
                self.retrieval_type,
            )[0]
            for qi in range(q)
        ]

    def find_with_distances(self, query):
        if self._emb is None:
            return [], []
        query = jnp.asarray(np.asarray(query, dtype=np.float32).reshape(-1))
        k = min(self.limit, self.n_rows)
        if self._emb_f32 is not None:
            ok, vals, idx = _sharded_find_two_pass_kernel(
                self._emb,
                self._emb_f32,
                query,
                jnp.int32(self.n_rows),
                *self._err,
                mesh=self._mesh,
                metric=self.metric,
                k=k,
            )
            ok, vals, idx = jax.device_get((ok, vals, idx))
            if not bool(ok):
                vals, idx = jax.device_get(
                    _sharded_find_kernel(
                        self._emb_f32,
                        query,
                        jnp.int32(self.n_rows),
                        mesh=self._mesh,
                        metric=self.metric,
                        k=k,
                        use_sort=k > _ARGMIN_MAX_K,
                    )
                )
        elif self._scales is not None:
            vals, idx = _sharded_find_int8_kernel(
                self._emb,
                self._scales,
                self._row_norm2,
                query,
                jnp.int32(self.n_rows),
                mesh=self._mesh,
                metric=self.metric,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        else:
            vals, idx = _sharded_find_kernel(
                self._emb,
                query,
                jnp.int32(self.n_rows),
                getattr(self, "_rn2_sh", None),
                mesh=self._mesh,
                metric=self.metric,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        return hits_from_topk(
            np.asarray(vals),
            np.asarray(idx),
            self.n_rows,
            self._doc_ids,
            self._chunk_ids,
            self.retrieval_type,
        )


@partial(jax.jit, static_argnames=("mesh", "k", "use_sort"))
def _sharded_maxsim_find_kernel(
    x, counts, n_valid, q_tokens, q_count, x_scales=None,
    *, mesh, k, use_sort,
):
    """Row-sharded MaxSim: each shard scores its own [rows, T, D] token
    tensor (blocked matmul + masked max/sum, index/late_interaction.py)
    and takes a local stable top-k over negated scores; the [n_shards, k]
    winners merge with one replicated stable sort. Tie equivalence with
    the single-chip kernel follows the dense-index argument: local stable
    rank == local row order for equal scores, so concatenation order ==
    global row order. ``x_scales`` [N, T] marks the int8 capacity layout
    (per-token dequantization scales, sharded with their rows)."""
    from dial_rag_tpu.index.late_interaction import _maxsim_scores

    n_shards = mesh.devices.size
    rows_per_shard = x.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(x_local, counts_local, n_valid, q_tokens, q_count, *s):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        scores = _maxsim_scores(
            x_local, counts_local, q_tokens, q_count, *s
        )
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row < n_valid, -scores, jnp.inf)
        vals, idx = topk(dists, k)
        return vals[None], (base + idx)[None]

    operands = (x, counts, n_valid, q_tokens, q_count)
    in_specs = [P("idx", None, None), P("idx"), P(), P(), P()]
    if x_scales is not None:
        operands = operands + (x_scales,)
        in_specs.append(P("idx", None))
    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx")),
    )(*operands)

    return _merge_shard_winners(vals, idx, k)


@partial(jax.jit, static_argnames=("mesh", "k", "use_sort"))
def _sharded_maxsim_find_batch_kernel(
    x, counts, n_valid, q_tokens, q_counts, x_scales=None,
    *, mesh, k, use_sort,
):
    """Batched sharded MaxSim: every shard scores all Q queries against
    its own rows (one corpus pass per shard, shared across queries),
    then one per-query stable merge of the winner lists — same ordering
    proof as the single-query kernel."""
    from dial_rag_tpu.index.late_interaction import _maxsim_scores_batch

    n_shards = mesh.devices.size
    rows_per_shard = x.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(x_local, counts_local, n_valid, q_tokens, q_counts, *s):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        scores = _maxsim_scores_batch(
            x_local, counts_local, q_tokens, q_counts, *s
        )  # [rows, Q]
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row[:, None] < n_valid, -scores, jnp.inf)
        vals, idx = jax.vmap(lambda dq: topk(dq, k))(dists.T)  # [Q, k]
        return vals[None], (base + idx)[None]

    operands = (x, counts, n_valid, q_tokens, q_counts)
    in_specs = [P("idx", None, None), P("idx"), P(), P(), P()]
    if x_scales is not None:
        operands = operands + (x_scales,)
        in_specs.append(P("idx", None))
    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx")),
    )(*operands)  # [n_shards, Q, k]

    return _merge_shard_winners_batch(vals, idx, k)


class ShardedLateInteractionIndex:
    """Late-interaction (MaxSim) index with chunk rows sharded over a
    device mesh — same host-facing API as LateInteractionIndex. Both the
    token tensor's HBM footprint (the reason to shard: T token vectors
    per chunk) and the scan bandwidth scale linearly with chips; the
    merge moves n_shards * k winner pairs over ICI.
    """

    def __init__(
        self,
        retrieval_type: RetrievalType,
        doc_token_embeddings: list[list[np.ndarray]],
        mesh: Mesh,
        max_chunk_tokens: int = 256,
        limit: int = 1,
        storage_dtype: str = "float32",
    ):
        from dial_rag_tpu.index.late_interaction import (
            _bucket_rows_li,
            pack_ragged_token_embeddings,
        )

        self.retrieval_type = retrieval_type
        self.limit = limit
        self.t = max_chunk_tokens
        self.storage_dtype = storage_dtype
        self._mesh = Mesh(mesh.devices.reshape(-1), ("idx",))
        n_shards = self._mesh.devices.size

        # pack entirely on HOST (the single-chip constructor would
        # materialize the full unsharded tensor on one device — the
        # exact thing sharding exists to avoid) and upload once, already
        # sharded. Per-shard rows use the token-row bucket so every
        # shard's count is a shape _maxsim_scores can block.
        def row_bucket(n):
            per_shard = _bucket_rows_li(-(-max(n, 1) // n_shards))
            return per_shard * n_shards

        x, counts, doc_ids, chunk_ids, self.n_rows, self.dim = (
            pack_ragged_token_embeddings(
                doc_token_embeddings, max_chunk_tokens, row_bucket
            )
        )
        if x is None:
            self._x = None
            self._x_scales = None
            return
        self._doc_ids = doc_ids
        self._chunk_ids = chunk_ids
        sharding = NamedSharding(self._mesh, P("idx", None, None))
        if storage_dtype == "int8":
            # same per-TOKEN absmax quantization as the single-chip
            # capacity layout (LateInteractionIndex), with the scale
            # plane sharded alongside its rows: 8 chips x the 2M-chunk
            # single-chip int8 capacity
            absmax = np.max(np.abs(x), axis=2)  # [N, T]
            scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(
                np.float32
            )
            self._x = jax.device_put(
                np.rint(x / scales[:, :, None]).astype(np.int8), sharding
            )
            self._x_scales = jax.device_put(
                scales, NamedSharding(self._mesh, P("idx", None))
            )
        else:
            self._x = jax.device_put(
                x.astype(np.dtype(storage_dtype)), sharding
            )
            self._x_scales = None
        self._counts = jax.device_put(
            counts, NamedSharding(self._mesh, P("idx"))
        )

    @property
    def nbytes(self) -> int:
        if self._x is None:
            return 0
        total = self._x.size * self._x.dtype.itemsize + self._counts.nbytes
        if self._x_scales is not None:
            total += self._x_scales.size * 4
        return total

    def find(self, query_tokens: np.ndarray) -> list[SearchHit]:
        return self.find_with_scores(query_tokens)[0]

    def warm_query_buckets(self, max_q: int = 16) -> None:
        """Compile-ahead of the sharded MaxSim kernels (same shapes as
        LateInteractionIndex.warm_query_buckets)."""
        if self._x is None:
            return
        for lanes in (8, 16, 32):
            self.find(np.zeros((lanes, self.dim), dtype=np.float32))
        probe = np.zeros((9, self.dim), dtype=np.float32)
        q = 4
        while q <= max_q:
            self.find_batch([probe] * q)
            q *= 2

    def find_batch(self, queries_tokens) -> list[list[SearchHit]]:
        """Per-query hits for a list of [q_i, D] token arrays in one (or
        a few memory-bounded) sharded dispatches; each shard's corpus
        pass is shared across its dispatch's queries. Same semantics as
        the single-chip find_batch."""
        from dial_rag_tpu.index.late_interaction import (
            batched_maxsim_lookup,
        )

        def invoke(q_tok, q_counts, k, use_sort):
            return _sharded_maxsim_find_batch_kernel(
                self._x,
                self._counts,
                jnp.int32(self.n_rows),
                jnp.asarray(q_tok),
                jnp.asarray(q_counts),
                self._x_scales,
                mesh=self._mesh,
                k=k,
                use_sort=use_sort,
            )

        return batched_maxsim_lookup(self, queries_tokens, invoke)

    def find_with_scores(self, query_tokens: np.ndarray):
        from dial_rag_tpu.index.late_interaction import (
            _MAX_Q_LANES,
            _bucket_q,
            finite_maxsim_hits,
        )

        if self._x is None:
            return [], []
        q_tokens = np.asarray(query_tokens, dtype=np.float32)
        if (
            q_tokens.ndim != 2
            or q_tokens.shape[0] == 0
            or q_tokens.shape[1] != self.dim
        ):
            # match the batch path's sanitization (pack_query_batch)
            return [], []
        # bound the per-shard sim transient exactly like the single-chip
        # path: truncate over-long queries to the lane cap
        q_tokens = q_tokens[:_MAX_Q_LANES]
        q = q_tokens.shape[0]
        q_pad = _bucket_q(q)
        if q_pad != q:
            q_tokens = np.pad(q_tokens, ((0, q_pad - q), (0, 0)))
        k = min(self.limit, self.n_rows)
        vals, idx = _sharded_maxsim_find_kernel(
            self._x,
            self._counts,
            jnp.int32(self.n_rows),
            jnp.asarray(q_tokens),
            jnp.int32(q),
            self._x_scales,
            mesh=self._mesh,
            k=k,
            use_sort=k > _ARGMIN_MAX_K,
        )
        return finite_maxsim_hits(self, vals, idx)


@partial(
    jax.jit,
    static_argnames=("mesh", "k", "l_pad", "rows_per_shard", "use_sort"),
)
def _sharded_bm25_sparse_topk_kernel(
    rows_sh,  # [n_shards, nnz_pad] i32 shard-LOCAL row ids
    vals_sh,  # [n_shards, nnz_pad] f32 saturation weights
    starts_sh,  # [n_shards, t_pad] i32 into the shard's postings
    lens_sh,  # [n_shards, t_pad] i32
    counts,  # [n_shards, t_pad] f32 per-slice count multipliers
    n_valid,  # i32 global real item count
    band_sh=None,  # [n_shards, rows_per_shard, K] dense band weights
    band_q=None,  # [K] band term counts (replicated)
    *,
    mesh,
    k: int,
    l_pad: int,
    rows_per_shard: int,
    use_sort: bool,
):
    """Each shard gathers its own posting slices from its HBM, scatter-
    adds local scores (plus a shard-local MXU matvec over the dense
    band when present), and takes a local reference-exact top-k (flip
    trick: latest local row wins ties). The [n_shards, k] winners merge
    with ONE two-key stable sort on (-score, reversed global row) — the
    exact global ``argsort(kind="stable")[::-1]`` order."""
    from dial_rag_tpu.index.bm25 import _sparse_scores
    from dial_rag_tpu.ops.metrics import _PRECISION

    n_total_pad = rows_per_shard * mesh.devices.size
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(rows_l, vals_l, starts, lens, counts, n_valid, *band):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        scores = _sparse_scores(
            rows_l[0],
            vals_l[0],
            starts[0],
            lens[0],
            counts[0],
            n_pad=rows_per_shard,
            l_pad=l_pad,
        )
        if band:
            scores = scores + jnp.dot(
                band[0][0],
                band[1],
                preferred_element_type=jnp.float32,
                precision=_PRECISION,
            )
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        neg = jnp.where(row < n_valid, -scores, jnp.inf)
        vals_k, idx_k = topk(jnp.flip(neg), k)
        local_row = (rows_per_shard - 1) - idx_k
        global_row = base + local_row
        rev_row = (n_total_pad - 1) - global_row
        return vals_k[None], rev_row[None], global_row[None]

    in_specs = [
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P(),
    ]
    args = [rows_sh, vals_sh, starts_sh, lens_sh, counts, n_valid]
    if band_sh is not None:
        in_specs += [P("idx", None, None), P()]
        args += [band_sh, band_q]
    vals, rev, grow = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx"), P("idx")),
    )(*args)

    flat_vals = vals.reshape(-1)
    flat_rev = rev.reshape(-1)
    flat_row = grow.reshape(-1)
    merged_vals, _, merged_row = jax.lax.sort(
        (flat_vals, flat_rev, flat_row), num_keys=2, is_stable=False
    )
    return -merged_vals[:k], merged_row[:k]


@partial(
    jax.jit,
    static_argnames=("mesh", "k", "l_pad", "rows_per_shard", "use_sort"),
)
def _sharded_bm25_sparse_topk_uniform_kernel(
    rows_sh,  # [n_shards, nnz_pad]
    vals_sh,  # [n_shards, nnz_pad]
    starts_sh,  # [n_shards, Q, t_pad]
    lens_sh,  # [n_shards, Q, t_pad]
    counts,  # [n_shards, Q, t_pad] per-slice count multipliers
    n_valid,
    band_sh=None,  # [n_shards, rows_per_shard, K]
    band_q=None,  # [Q, K] (replicated)
    *,
    mesh,
    k: int,
    l_pad: int,
    rows_per_shard: int,
    use_sort: bool,
):
    """UNIFORM-profile batched variant: every shard scores all Q
    queries via a vmapped per-query scan over [Q, T] tables — each scan
    step scatters all Q queries at once, amortizing per-step overhead
    (the right shape when slice counts are similar across the batch;
    the flat kernel below wins under skew). Same ordering proof as the
    single-query kernel; the host picks per batch."""
    from dial_rag_tpu.index.bm25 import _sparse_scores
    from dial_rag_tpu.ops.metrics import _PRECISION

    n_total_pad = rows_per_shard * mesh.devices.size
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(rows_l, vals_l, starts, lens, counts, n_valid, *band):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        if band:
            # [rows_per_shard, K] @ [K, Q] -> all queries in one matmul
            band_scores = jnp.dot(
                band[0][0],
                band[1].T,
                preferred_element_type=jnp.float32,
                precision=_PRECISION,
            ).T  # [Q, rows_per_shard]
        else:
            band_scores = None

        def per_query(q_starts, q_lens, q_counts, q_band):
            scores = _sparse_scores(
                rows_l[0],
                vals_l[0],
                q_starts,
                q_lens,
                q_counts,
                n_pad=rows_per_shard,
                l_pad=l_pad,
            )
            if q_band is not None:
                scores = scores + q_band
            neg = jnp.where(row < n_valid, -scores, jnp.inf)
            vals_k, idx_k = topk(jnp.flip(neg), k)
            global_row = base + (rows_per_shard - 1) - idx_k
            return vals_k, (n_total_pad - 1) - global_row, global_row

        if band_scores is not None:
            vals, rev, grow = jax.vmap(per_query)(
                starts[0], lens[0], counts[0], band_scores
            )
        else:
            vals, rev, grow = jax.vmap(
                lambda a, b, c: per_query(a, b, c, None)
            )(starts[0], lens[0], counts[0])
        return vals[None], rev[None], grow[None]

    in_specs = [
        P("idx", None),
        P("idx", None),
        P("idx", None, None),
        P("idx", None, None),
        P("idx", None, None),
        P(),
    ]
    args = [rows_sh, vals_sh, starts_sh, lens_sh, counts, n_valid]
    if band_sh is not None:
        in_specs += [P("idx", None, None), P()]
        args += [band_sh, band_q]
    vals, rev, grow = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx"), P("idx")),
    )(*args)

    q = counts.shape[1]
    flat_vals = vals.transpose(1, 0, 2).reshape(q, -1)  # [Q, n_shards*k]
    flat_rev = rev.transpose(1, 0, 2).reshape(q, -1)
    flat_row = grow.transpose(1, 0, 2).reshape(q, -1)
    merged_vals, _, merged_row = jax.lax.sort(
        (flat_vals, flat_rev, flat_row),
        num_keys=2,
        is_stable=False,
        dimension=-1,
    )
    return -merged_vals[:, :k], merged_row[:, :k]


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "l_pad", "rows_per_shard", "q_pad", "use_sort"
    ),
)
def _sharded_bm25_sparse_topk_batch_kernel(
    rows_sh,  # [n_shards, nnz_pad]
    vals_sh,  # [n_shards, nnz_pad]
    starts_sh,  # [n_shards, S] flattened slice table per shard
    lens_sh,  # [n_shards, S]
    counts,  # [n_shards, S] per-slice count multipliers
    qoff_sh,  # [n_shards, S] owning query's accumulator base
    n_valid,
    band_sh=None,  # [n_shards, rows_per_shard, K]
    band_q=None,  # [Q, K] (replicated)
    *,
    mesh,
    k: int,
    l_pad: int,
    rows_per_shard: int,
    q_pad: int,
    use_sort: bool,
):
    """Batched variant over a FLATTENED per-shard slice table (the same
    redesign as the single-chip _bm25_sparse_topk_flat_kernel): each
    slice carries its owning query's accumulator offset, so a shard
    scans sum(T_q) slices instead of q_pad x the batch's worst
    per-query slice count. Scores are bit-identical to the per-query
    path (each query's slices stay contiguous and term-ascending, so
    every item's f32 accumulation order is unchanged); the local
    flip-top-k + two-key global merge reproduce the reference's
    later-item-wins order exactly as before."""
    from dial_rag_tpu.ops.metrics import _PRECISION

    n_total_pad = rows_per_shard * mesh.devices.size
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    stride = rows_per_shard + 8

    def local_topk(rows_l, vals_l, starts, lens, counts, qoff, n_valid, *band):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        iota = jax.lax.iota(jnp.int32, l_pad)

        def per_slice(acc, term):
            s, ln, c, qo = term
            r = jax.lax.dynamic_slice(rows_l[0], (s,), (l_pad,))
            v = jax.lax.dynamic_slice(vals_l[0], (s,), (l_pad,))
            v = jnp.where(iota < ln, v * c, 0.0)
            r = jnp.where(iota < ln, qo + r, qo + rows_per_shard)
            return acc.at[r].add(v, indices_are_sorted=True), None

        acc0 = (
            jnp.zeros(q_pad * stride, dtype=jnp.float32)
            + vals_l[0][0] * 0.0
        )
        flat, _ = jax.lax.scan(
            per_slice, acc0, (starts[0], lens[0], counts[0], qoff[0])
        )
        scores = flat.reshape(q_pad, stride)[:, :rows_per_shard]
        if band:
            # [rows_per_shard, K] @ [K, Q] -> all queries in one matmul
            scores = scores + jnp.dot(
                band[0][0],
                band[1].T,
                preferred_element_type=jnp.float32,
                precision=_PRECISION,
            ).T  # [Q, rows_per_shard]

        def per_query(q_scores):
            neg = jnp.where(row < n_valid, -q_scores, jnp.inf)
            vals_k, idx_k = topk(jnp.flip(neg), k)
            global_row = base + (rows_per_shard - 1) - idx_k
            return vals_k, (n_total_pad - 1) - global_row, global_row

        vals, rev, grow = jax.vmap(per_query)(scores)
        return vals[None], rev[None], grow[None]

    in_specs = [
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P(),
    ]
    args = [rows_sh, vals_sh, starts_sh, lens_sh, counts, qoff_sh, n_valid]
    if band_sh is not None:
        in_specs += [P("idx", None, None), P()]
        args += [band_sh, band_q]
    vals, rev, grow = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("idx"), P("idx"), P("idx")),
    )(*args)

    flat_vals = vals.transpose(1, 0, 2).reshape(q_pad, -1)  # [Q, S*k]
    flat_rev = rev.transpose(1, 0, 2).reshape(q_pad, -1)
    flat_row = grow.transpose(1, 0, 2).reshape(q_pad, -1)
    merged_vals, _, merged_row = jax.lax.sort(
        (flat_vals, flat_rev, flat_row),
        num_keys=2,
        is_stable=False,
        dimension=-1,
    )
    return -merged_vals[:, :k], merged_row[:, :k]


@partial(
    jax.jit, static_argnames=("mesh", "l_pad", "rows_per_shard")
)
def _sharded_bm25_sparse_scores_kernel(
    rows_sh, vals_sh, starts_sh, lens_sh, counts, band_sh=None,
    band_q=None, *, mesh, l_pad, rows_per_shard,
):
    from dial_rag_tpu.index.bm25 import _sparse_scores
    from dial_rag_tpu.ops.metrics import _PRECISION

    def local_scores(rows_l, vals_l, starts, lens, counts, *band):
        scores = _sparse_scores(
            rows_l[0],
            vals_l[0],
            starts[0],
            lens[0],
            counts[0],
            n_pad=rows_per_shard,
            l_pad=l_pad,
        )
        if band:
            scores = scores + jnp.dot(
                band[0][0],
                band[1],
                preferred_element_type=jnp.float32,
                precision=_PRECISION,
            )
        return scores[None]

    in_specs = [
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
        P("idx", None),
    ]
    args = [rows_sh, vals_sh, starts_sh, lens_sh, counts]
    if band_sh is not None:
        in_specs += [P("idx", None, None), P()]
        args += [band_sh, band_q]
    return jax.shard_map(
        local_scores,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P("idx"),
    )(*args)


class ShardedBm25SparseIndex:
    """CSC-postings BM25 with ITEM ROWS sharded over a device mesh.

    The single-device sparse path (index/bm25.py) keeps one term-major
    postings array in one chip's HBM — the layout that matters past
    ~10M chunks, where the dense [N, V] weights no longer fit. Here
    each device owns a contiguous row range and holds ONLY the postings
    whose item falls in its range (split at build time by binary search
    on each term's sorted row list). A query broadcasts the per-shard
    (starts, lens) slice tables — a few hundred bytes — and every shard
    scatter-adds its local scores in parallel; the reference-exact
    later-item-wins ranking survives via local flip + a two-key global
    merge. Per-query HBM traffic per chip is O(its own postings of the
    query terms): both memory AND bandwidth scale linearly with chips.
    """

    def __init__(
        self,
        base,
        mesh: Mesh,
        limit: int,
        max_band_bytes: int = 512 * 1024 * 1024,
    ):
        from dial_rag_tpu.index.bm25 import Bm25Index

        assert isinstance(base, Bm25Index)
        if base._postings_host is None:
            raise ValueError(
                "sharded sparse BM25 requires host postings "
                "(build with device=False)"
            )
        self._base = base
        self.limit = limit
        self._mesh = Mesh(mesh.devices.reshape(-1), ("idx",))
        n_shards = self._mesh.devices.size
        n = base.n_items
        rows_per_shard = -(-max(n, 8) // (8 * n_shards)) * 8
        self._rows_per_shard = rows_per_shard

        term_ptr, rows_flat, vals_flat = base._postings_host
        base._postings_host = None  # re-sharded below; free the original
        v = len(term_ptr) - 1
        df = np.diff(term_ptr)
        term_of = np.repeat(np.arange(v, dtype=np.int64), df)

        # dense band (same rationale as the single-chip layout,
        # index/bm25.py): high-df terms are TPU scatter-add poison, so
        # they move into a row-sharded [rows_per_shard, K] block scored
        # by a shard-local MXU matvec; extraction happens BEFORE the
        # re-shard so the CSC tail keeps only short postings
        self._band_sh = None
        self._band_cols: dict = {}
        k_cap = max(
            0, max_band_bytes // max(n_shards * rows_per_shard * 4, 1)
        )
        heavy = np.nonzero(df >= max(n // 64, 64))[0]
        heavy = heavy[np.argsort(-df[heavy])][:k_cap]
        if heavy.size:
            k_band = -(-int(heavy.size) // 128) * 128
            band = np.zeros(
                (n_shards, rows_per_shard, k_band), dtype=np.float32
            )
            for c, tid in enumerate(heavy):
                seg = slice(int(term_ptr[tid]), int(term_ptr[tid + 1]))
                r = rows_flat[seg].astype(np.int64)
                band[
                    r // rows_per_shard, r % rows_per_shard, c
                ] = vals_flat[seg]
            self._band_cols = {int(t): c for c, t in enumerate(heavy)}
            self._band_sh = jax.device_put(
                band, NamedSharding(self._mesh, P("idx", None, None))
            )
            is_heavy = np.zeros(v, dtype=bool)
            is_heavy[heavy] = True
            keep = ~is_heavy[term_of]
            rows_flat = rows_flat[keep]
            vals_flat = vals_flat[keep]
            term_of = term_of[keep]
            df = df.copy()
            df[heavy] = 0
            term_ptr = np.zeros(v + 1, dtype=np.int64)
            np.cumsum(df, out=term_ptr[1:])

        # Vectorized re-shard (a per-term Python loop would be millions
        # of iterations at the >10M-chunk scale this class targets).
        # Within a term the rows are ascending, so shard ids are too:
        # selecting one shard's postings preserves term-major order,
        # and per-(shard, term) counts come from one np.add.at.
        shard_of = rows_flat.astype(np.int64) // rows_per_shard
        counts = np.zeros((n_shards, v), dtype=np.int64)
        np.add.at(counts, (shard_of, term_of), 1)
        term_ptr_s = np.zeros((n_shards, v + 1), dtype=np.int64)
        np.cumsum(counts, axis=1, out=term_ptr_s[:, 1:])
        from dial_rag_tpu.index.bm25 import _VSLICE

        # +_VSLICE so the fixed-width virtual-slice dynamic_slice loads
        # never clamp (mirrors the single-chip build padding); padding
        # rows point at local row 0 with weight 0.0 — exact no-ops.
        nnz_pad = int(term_ptr_s[:, -1].max()) + _VSLICE
        rows_sh = np.zeros((n_shards, nnz_pad), dtype=np.int32)
        vals_sh = np.zeros((n_shards, nnz_pad), dtype=np.float32)
        for s in range(n_shards):
            mask = shard_of == s
            n_s = int(counts[s].sum())
            rows_sh[s, :n_s] = rows_flat[mask] - s * rows_per_shard
            vals_sh[s, :n_s] = vals_flat[mask]
        self._term_ptr_s = term_ptr_s  # host: per-shard slice lookup
        sharding = NamedSharding(self._mesh, P("idx", None))
        self._rows_sh = jax.device_put(rows_sh, sharding)
        self._vals_sh = jax.device_put(vals_sh, sharding)

    @property
    def vocab(self):
        return self._base.vocab

    @property
    def n_items(self) -> int:
        return self._base.n_items

    @property
    def nbytes(self) -> int:
        band = self._band_sh.size * 4 if self._band_sh is not None else 0
        return self._rows_sh.size * 4 + self._vals_sh.size * 4 + band

    def _query_slices(self, query_tokens: list[str]):
        """(starts [S, T], lens [S, T], counts [S, T], l_pad, band_q)
        for the query's unique in-vocab tail terms, split per shard
        into fixed <=_VSLICE posting windows (see index/bm25.py: the
        dynamic-slice load is ~10x a gather, padding waste is bounded
        per term, and l_pad — hence the jit cache — stays constant);
        band terms ride the [K] count vector instead of the tables.
        Slice counts differ per shard, so the count multipliers are a
        sharded [S, T] table, not a replicated vector."""
        from dial_rag_tpu.index.bm25 import _VSLICE, Bm25Index, _next_pow2

        counts: dict[int, float] = {}
        for t, w in Bm25Index._iter_term_weights(query_tokens):
            tid = self._base.vocab.get(t)
            if tid is not None:
                counts[tid] = counts.get(tid, 0.0) + w
        band_q = None
        if self._band_cols:
            band_q = np.zeros(self._band_sh.shape[2], dtype=np.float32)
            for tid in list(counts):
                col = self._band_cols.get(tid)
                if col is not None:
                    band_q[col] = counts.pop(tid)
        n_shards = self._mesh.devices.size
        per_shard: list[list[tuple[int, int, int]]] = [
            [] for _ in range(n_shards)
        ]
        for tid in sorted(counts):
            c = counts[tid]
            for s in range(n_shards):
                a = int(self._term_ptr_s[s, tid])
                b = int(self._term_ptr_s[s, tid + 1])
                while a < b:
                    per_shard[s].append((a, min(_VSLICE, b - a), c))
                    a += _VSLICE
        t_pad = _next_pow2(max((len(x) for x in per_shard), default=1))
        starts = np.zeros((n_shards, t_pad), dtype=np.int32)
        lens = np.zeros((n_shards, t_pad), dtype=np.int32)
        cnt = np.zeros((n_shards, t_pad), dtype=np.float32)
        for s, sl in enumerate(per_shard):
            for j, (a, ln, c) in enumerate(sl):
                starts[s, j] = a
                lens[s, j] = ln
                cnt[s, j] = c
        return starts, lens, cnt, _VSLICE, band_q

    def warm_query_buckets(self, k: int, max_q: int = 64) -> None:
        """Compile-ahead of the sharded single + batched scoring
        kernels for every wave bucket (see Bm25Index.warm_query_buckets
        for the serving rationale)."""
        if self.n_items == 0:
            return
        k = min(k, self.limit)
        term = next(iter(self.vocab), None)
        probe = [term] if term is not None else []
        self.top_n_with_scores(probe, k)
        q = 2
        while q <= max_q:
            self.top_n_batch_with_scores([probe] * q, k)
            q *= 2

    def get_scores(self, query_tokens: list[str]) -> np.ndarray:
        starts, lens, cnt, l_pad, band_q = self._query_slices(
            query_tokens
        )
        scores = _sharded_bm25_sparse_scores_kernel(
            self._rows_sh,
            self._vals_sh,
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(cnt),
            self._band_sh,
            jnp.asarray(band_q) if band_q is not None else None,
            mesh=self._mesh,
            l_pad=l_pad,
            rows_per_shard=self._rows_per_shard,
        )
        return np.asarray(scores).reshape(-1)[: self.n_items]

    def top_n(self, query_tokens: list[str], n: int) -> np.ndarray:
        return self.top_n_with_scores(query_tokens, n)[0]

    def top_n_with_scores(
        self, query_tokens: list[str], n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(indices, Okapi scores) — same dispatch as ``top_n``."""
        if n > self.limit:
            raise ValueError(f"n={n} exceeds the index limit {self.limit}")
        k = min(n, self.n_items)
        starts, lens, cnt, l_pad, band_q = self._query_slices(
            query_tokens
        )
        vals, idx = _sharded_bm25_sparse_topk_kernel(
            self._rows_sh,
            self._vals_sh,
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(cnt),
            jnp.int32(self.n_items),
            self._band_sh,
            jnp.asarray(band_q) if band_q is not None else None,
            mesh=self._mesh,
            k=k,
            l_pad=l_pad,
            rows_per_shard=self._rows_per_shard,
            use_sort=k > _ARGMIN_MAX_K,
        )
        return np.asarray(idx).astype(np.int64), np.asarray(vals)

    def top_n_batch(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[np.ndarray]:
        return [
            idx
            for idx, _ in self.top_n_batch_with_scores(queries_tokens, n)
        ]

    def top_n_batch_with_scores(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """All queries in ONE sharded dispatch (vmapped local scoring +
        per-query two-key merge). Query count and slice-table shapes are
        padded to powers of two to bound the jit cache."""
        if n > self.limit:
            raise ValueError(f"n={n} exceeds the index limit {self.limit}")
        if not queries_tokens:
            return []
        from dial_rag_tpu.index.bm25 import _next_pow2

        k = min(n, self.n_items)
        q = len(queries_tokens)
        q_pad = _next_pow2(q)
        per_query = [self._query_slices(toks) for toks in queries_tokens]
        l_pad = max(lp for _, _, _, lp, _ in per_query)
        n_shards = self._mesh.devices.size
        stride = self._rows_per_shard + 8
        # flatten each shard's slices across queries (the kernel scans
        # sum(T_q) slices with per-slice accumulator offsets instead of
        # q_pad x the batch's worst per-query slice count)
        flat: list[list[tuple[int, int, float, int]]] = [
            [] for _ in range(n_shards)
        ]
        band_mat = (
            np.zeros((q_pad, self._band_sh.shape[2]), dtype=np.float32)
            if self._band_sh is not None
            else None
        )
        for qi, (st, ln, cn, _, bq) in enumerate(per_query):
            if bq is not None:
                band_mat[qi] = bq
            base = qi * stride
            for s in range(n_shards):
                for j in range(st.shape[1]):
                    if ln[s, j] > 0:
                        flat[s].append(
                            (st[s, j], ln[s, j], cn[s, j], base)
                        )
        # same shape choice as the single-chip batch path: the flat
        # table wins under SKEWED slice counts (work tracks actual
        # postings), the vmapped [Q, T] form wins under UNIFORM counts
        # (each scan step scatters all Q queries, amortizing per-step
        # overhead — measured 1.5 vs 25 ms at 1M items on one chip)
        s_total_max = max((len(x) for x in flat), default=1)
        t_max = max(
            (
                int((pq[1][s] > 0).sum())
                for pq in per_query
                for s in range(n_shards)
            ),
            default=1,
        )
        t_pad = _next_pow2(
            max((pq[0].shape[1] for pq in per_query), default=1)
        )
        # same empirically-calibrated shape choice as the single-chip
        # batch path (index/bm25.py), with the per-SHARD row count as
        # the locality scale
        per_entry_ratio = (
            16.0 if self._rows_per_shard <= 4_000_000 else 0.5
        )
        use_flat = s_total_max * per_entry_ratio < q_pad * t_max
        if use_flat:
            s_pad = _next_pow2(s_total_max)
            starts = np.zeros((n_shards, s_pad), dtype=np.int32)
            lens = np.zeros((n_shards, s_pad), dtype=np.int32)
            counts = np.zeros((n_shards, s_pad), dtype=np.float32)
            qoff = np.zeros((n_shards, s_pad), dtype=np.int32)
            for s, sl in enumerate(flat):
                for j, (a, ln_, c, base) in enumerate(sl):
                    starts[s, j] = a
                    lens[s, j] = ln_
                    counts[s, j] = c
                    qoff[s, j] = base
            vals, idx = _sharded_bm25_sparse_topk_batch_kernel(
                self._rows_sh,
                self._vals_sh,
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(counts),
                jnp.asarray(qoff),
                jnp.int32(self.n_items),
                self._band_sh,
                jnp.asarray(band_mat) if band_mat is not None else None,
                mesh=self._mesh,
                k=k,
                l_pad=l_pad,
                rows_per_shard=self._rows_per_shard,
                q_pad=q_pad,
                use_sort=k > _ARGMIN_MAX_K,
            )
        else:
            starts = np.zeros((n_shards, q_pad, t_pad), dtype=np.int32)
            lens = np.zeros((n_shards, q_pad, t_pad), dtype=np.int32)
            counts = np.zeros((n_shards, q_pad, t_pad), dtype=np.float32)
            for qi, (st, ln, cn, _, _bq) in enumerate(per_query):
                t = st.shape[1]
                starts[:, qi, :t] = st
                lens[:, qi, :t] = ln
                counts[:, qi, :t] = cn
            vals, idx = _sharded_bm25_sparse_topk_uniform_kernel(
                self._rows_sh,
                self._vals_sh,
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(counts),
                jnp.int32(self.n_items),
                self._band_sh,
                jnp.asarray(band_mat) if band_mat is not None else None,
                mesh=self._mesh,
                k=k,
                l_pad=l_pad,
                rows_per_shard=self._rows_per_shard,
                use_sort=k > _ARGMIN_MAX_K,
            )
        idx = np.asarray(idx).astype(np.int64)
        vals = np.asarray(vals)
        return [(idx[qi], vals[qi]) for qi in range(q)]


class ShardedBm25Index:
    """BM25 weights row-sharded over a device mesh.

    Reuses the sharded dense scan: BM25 scoring is the inner product of
    the saturation-weight matrix with the query term-count vector, and
    the reference's descending-with-LATER-index-ties ranking
    (``argsort(kind="stable")[::-1]``) maps onto the dense index's
    earliest-row-stable ascending top-k by storing the weight rows
    FLIPPED — the earliest flipped row is the latest real item.
    """

    def __init__(self, base, mesh: Mesh, limit: int):
        from dial_rag_tpu.index.bm25 import Bm25Index

        assert isinstance(base, Bm25Index)
        if base._weights_host is None:
            raise ValueError(
                "sharded BM25 requires the dense weights path "
                "(build with device=False)"
            )
        self._base = base
        self.limit = limit
        n = base.n_items
        flipped = np.ascontiguousarray(base._weights_host[:n][::-1])
        base._weights_host = None  # uploaded below; free the host copy
        self._dense = ShardedDenseIndex(
            RetrievalType.TEXT,
            [
                DocEmbeddings(
                    chunk_ids=np.arange(n)[::-1], embeddings=flipped
                )
            ],
            mesh,
            metric=Metric.INNER_PRODUCT,
            limit=limit,
        )

    @property
    def vocab(self):
        return self._base.vocab

    @property
    def n_items(self) -> int:
        return self._base.n_items

    @property
    def nbytes(self) -> int:
        return self._dense.nbytes

    def top_n(self, query_tokens: list[str], n: int) -> np.ndarray:
        return self.top_n_with_scores(query_tokens, n)[0]

    def warm_query_buckets(self, k: int, max_q: int = 64) -> None:
        """Compile-ahead via the inner sharded dense scan (the flipped
        weight layout shares its kernels)."""
        if self.n_items == 0:
            return
        k = min(k, self.limit)
        term = next(iter(self.vocab), None)
        probe = [term] if term is not None else []
        self.top_n_with_scores(probe, k)
        q = 2
        while q <= max_q:
            self.top_n_batch_with_scores([probe] * q, k)
            q *= 2

    def top_n_with_scores(
        self, query_tokens: list[str], n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(indices, Okapi scores): the inner-product "distance" of the
        flipped-layout dense scan is the negated BM25 score, so each
        hit's ``score`` field is already the Okapi value."""
        if n > self.limit:
            raise ValueError(f"n={n} exceeds the index limit {self.limit}")
        v_pad = self._dense._emb.shape[1]
        q = self._base._query_vector(query_tokens, v_pad)
        hits = self._dense.find(q)[:n]
        return (
            np.array([h.chunk_id for h in hits], dtype=np.int64),
            # hits_from_topk emits score=None for a non-finite value at
            # a real index — surface it as nan, not a TypeError
            np.array(
                [np.nan if h.score is None else h.score for h in hits],
                dtype=np.float32,
            ),
        )

    def top_n_batch(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[np.ndarray]:
        return [
            idx
            for idx, _ in self.top_n_batch_with_scores(queries_tokens, n)
        ]

    def top_n_batch_with_scores(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        if n > self.limit:
            raise ValueError(f"n={n} exceeds the index limit {self.limit}")
        if not queries_tokens:
            return []
        v_pad = self._dense._emb.shape[1]
        qmat = np.stack(
            [
                self._base._query_vector(q, v_pad)
                for q in queries_tokens
            ]
        )  # [Q, V]
        results = self._dense.find_batch(qmat)
        return [
            (
                np.array([h.chunk_id for h in hits[:n]], dtype=np.int64),
                np.array(
                    [
                        np.nan if h.score is None else h.score
                        for h in hits[:n]
                    ],
                    dtype=np.float32,
                ),
            )
            for hits in results
        ]
