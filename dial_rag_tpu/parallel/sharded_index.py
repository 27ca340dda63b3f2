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

from dial_rag_tpu.index.dense_index import DocEmbeddings, hits_from_topk
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


@partial(
    jax.jit,
    static_argnames=("mesh", "metric", "k", "use_sort"),
)
def _sharded_find_kernel(emb, query, n_valid, *, mesh, metric, k, use_sort):
    n_shards = mesh.devices.size
    rows_per_shard = emb.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(emb_local, query, n_valid):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        dists = pairwise_distances(query, emb_local, metric)
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row < n_valid, dists, jnp.inf)
        vals, idx = topk(dists, k)
        # keepdims: out_specs concatenate along the leading shard axis
        return vals[None], (base + idx)[None]

    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P("idx", None), P(), P()),
        out_specs=(P("idx"), P("idx")),
    )(emb, query, n_valid)

    # [n_shards, k] -> [n_shards * k]; concatenation order == global row
    # order among ties, so one stable merge finishes the job.
    flat_vals = vals.reshape(-1)
    flat_idx = idx.reshape(-1)
    order = jnp.arange(flat_vals.shape[0], dtype=jnp.int32)
    merged_vals, merged_order = jax.lax.sort(
        (flat_vals, order), num_keys=1, is_stable=True
    )
    return merged_vals[:k], flat_idx[merged_order[:k]]


@partial(
    jax.jit,
    static_argnames=("mesh", "metric", "k", "use_sort"),
)
def _sharded_find_batch_kernel(
    emb, queries, n_valid, *, mesh, metric, k, use_sort
):
    """[Q, D] queries: per-shard batched scan + vmapped local top-k, then
    a per-query stable merge of the gathered winner lists."""
    from dial_rag_tpu.ops.metrics import pairwise_distances_batch

    n_shards = mesh.devices.size
    rows_per_shard = emb.shape[0] // n_shards
    topk = stable_topk_sort if use_sort else stable_topk_argmin

    def local_topk(emb_local, queries, n_valid):
        shard = jax.lax.axis_index("idx")
        base = (shard * rows_per_shard).astype(jnp.int32)
        dists = pairwise_distances_batch(queries, emb_local, metric)
        row = base + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_shard, 1), 0
        ).reshape(-1)
        dists = jnp.where(row[None, :] < n_valid, dists, jnp.inf)
        vals, idx = jax.vmap(lambda d: topk(d, k))(dists)  # [Q, k]
        return vals[None], (base + idx)[None]

    vals, idx = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P("idx", None), P(), P()),
        out_specs=(P("idx"), P("idx")),
    )(emb, queries, n_valid)  # [n_shards, Q, k]

    q = queries.shape[0]
    flat_vals = vals.transpose(1, 0, 2).reshape(q, -1)  # [Q, n_shards*k]
    flat_idx = idx.transpose(1, 0, 2).reshape(q, -1)
    order = jnp.broadcast_to(
        jnp.arange(flat_vals.shape[1], dtype=jnp.int32), flat_vals.shape
    )
    merged_vals, merged_order = jax.lax.sort(
        (flat_vals, order), num_keys=1, is_stable=True, dimension=-1
    )
    merged_idx = jnp.take_along_axis(flat_idx, merged_order, axis=-1)
    return merged_vals[:, :k], merged_idx[:, :k]


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
        self._emb = jax.device_put(
            emb.astype(np.dtype(storage_dtype)),
            NamedSharding(self._mesh, P("idx", None)),
        )

    @property
    def nbytes(self) -> int:
        return (
            0
            if self._emb is None
            else self._emb.size * self._emb.dtype.itemsize
        )

    def find(self, query: np.ndarray) -> list[SearchHit]:
        hits, _ = self.find_with_distances(query)
        return hits

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
        vals, idx = _sharded_find_batch_kernel(
            self._emb,
            jnp.asarray(queries),
            jnp.int32(self.n_rows),
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
        vals, idx = _sharded_find_kernel(
            self._emb,
            query,
            jnp.int32(self.n_rows),
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
        if n > self.limit:
            raise ValueError(f"n={n} exceeds the index limit {self.limit}")
        v_pad = self._dense._emb.shape[1]
        q = self._base._query_vector(query_tokens, v_pad)
        hits = self._dense.find(q)
        return np.array([h.chunk_id for h in hits[:n]], dtype=np.int64)

    def top_n_batch(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[np.ndarray]:
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
            np.array([h.chunk_id for h in hits[:n]], dtype=np.int64)
            for hits in results
        ]
