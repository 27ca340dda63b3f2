"""HBM-resident dense embedding index with fused distance + stable top-k.

TPU-first redesign of the reference's per-document numpy scan
(aidial_rag/retrievers/embeddings_index.py:33-89). The reference computes,
for each document, metric distances and a stable argsort top-``limit``,
then concatenates the per-doc winners in document order and takes a global
stable top-``limit``. We instead keep ONE flat, padded ``[N, D]`` matrix in
HBM (rows laid out in document order, then within-doc order) and take a
single global stable top-``limit`` over all rows. This is exactly
equivalent:

* selection — if a row is in the global top-``limit``, fewer than
  ``limit`` rows of *its own document* can precede it, so it is also in
  its document's top-``limit``; hence both pipelines select the same set;
* tie order — the reference's concatenation order is (doc order, within-
  doc stable rank), which for equal distances equals (doc order, within-
  doc position) — precisely the flat row order our single stable top-k
  breaks ties by.

The one-pass design removes the per-document Python loop, turns the whole
query into a single jitted kernel (distance matvec on the MXU + k argmin
sweeps on the VPU), and makes row-sharding across a device mesh trivial
(per-shard top-k + gather merge; see dial_rag_tpu/parallel/).

Shapes are padded to lane-aligned buckets so repeated queries and growing
corpora hit the jit cache instead of recompiling.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.ops.metrics import (
    Metric,
    pairwise_distances,
    pairwise_distances_batch,
)
from dial_rag_tpu.ops.stable_topk import (
    _ARGMIN_MAX_K,
    stable_topk_argmin,
    stable_topk_sort,
)

_LANE = 128


def _bucket_rows(n: int) -> int:
    """Pad row count to a bounded set of sizes to limit jit recompiles.

    Above 4096 the buckets are QUARTER-octave steps (p, 1.25p, 1.5p,
    1.75p, 2p): the scan is bandwidth-bound in the padded row count, so
    the previous next-power-of-two rule cost up to ~100% extra memory
    AND scan time at corpus scale (10M rows padded to 16.8M); quarter
    steps bound the waste at 25% (12.5% expected) for 4 jit shapes per
    octave. Every step is a 512-multiple, which the blocked kernels and
    the _TP_BLK=128 reshapes require."""
    n = max(n, 1)
    if n <= 4096:
        return -(-n // 512) * 512
    p = 4096
    while p < n:
        if n <= p + p // 4:
            return p + p // 4
        if n <= p + p // 2:
            return p + p // 2
        if n <= p + 3 * p // 4:
            return p + 3 * p // 4
        p *= 2
    return p


@dataclass
class DocEmbeddings:
    """Per-document flat embeddings: row i maps to chunk_ids[i].

    A chunk may own several rows (multi-embeddings per page/chunk), matching
    the reference's DocIndex (embeddings_index.py:14-30).
    """

    chunk_ids: np.ndarray  # [n] int
    embeddings: np.ndarray  # [n, D] f32

    def __post_init__(self):
        self.chunk_ids = np.asarray(self.chunk_ids, dtype=np.int64)
        self.embeddings = np.asarray(self.embeddings, dtype=np.float32)
        if self.embeddings.ndim == 1:  # empty
            self.embeddings = self.embeddings.reshape(0, 0)

    @property
    def num_rows(self) -> int:
        return self.embeddings.shape[0]


# Two-pass exact query: the bf16 prefilter selects candidate BLOCKS of
# _TP_BLK rows by block-minimum score, then the top _TP_CBLK blocks
# rescore in f32. Block selection replaces a global lax.top_k over N
# rows (measured 1.3 ms extra at 1M rows on the v5e — more than the
# bf16 scan itself) with a [N/BLK] block-min reduce + a 128x smaller
# top_k; the containment proof transfers (see _find_two_pass_kernel).
_TP_BLK = 128
_TP_CBLK = 64


@jax.jit
def _row_norm_terms(emb):
    """(row_norm2 [N] f32, max row norm scalar) of the stored matrix.

    One build-time pass; the cached squared norms remove the per-query
    second full read of the matrix from every norm-bearing metric
    (measured 19 -> 7.8 ms for a 10M x 384 bf16 sqeuclidean scan), and
    the max norm feeds the block-select rounding bound."""
    x = emb.astype(jnp.float32)
    rn = jnp.sum(x * x, axis=1)
    return rn, jnp.sqrt(jnp.max(rn))


@jax.jit
def _two_pass_error_terms(emb_f32):
    """Certified per-matrix error components of the bf16 prefilter scan,
    computed once at build time on device:

    - ``err_a`` = max_i ||x_i - bf16(x_i)||  (row perturbation norm)
    - ``err_b`` = max_i |  ||bf16(x_i)||^2 - ||x_i||^2 |
    - ``norm_max`` = max_i ||x_i||

    Padding rows are zero and contribute nothing. See
    ``_find_two_pass_kernel`` for how these bound the score error."""
    x = emb_f32
    xt = x.astype(jnp.bfloat16).astype(jnp.float32)
    e = x - xt
    err_a = jnp.sqrt(jnp.max(jnp.sum(e * e, axis=1)))
    err_b = jnp.max(
        jnp.abs(jnp.sum(xt * xt, axis=1) - jnp.sum(x * x, axis=1))
    )
    norm_max = jnp.sqrt(jnp.max(jnp.sum(x * x, axis=1)))
    return err_a, err_b, norm_max


def _two_pass_bound(query, err_a, err_b, norm_max, d, sel_metric):
    """Sound upper bound E on |s_bf16(q, x_i) - s_f32(q, x_i)| per row.

    With ``Precision.HIGHEST`` the prefilter matmul upcasts the bf16
    matrix and runs exact f32 passes, so the ONLY perturbation is the
    stored rows: x~ = bf16(x). For sqeuclidean (s = ||x||^2 - 2 q.x +
    ||q||^2; the ||q||^2 term is identical in both scans and cancels in
    comparisons):

        |s~ - s| <= | ||x~||^2 - ||x||^2 | + 2 |q . (x~ - x)|
                 <= err_b + 2 ||q|| err_a

    For inner product (s = -q.x): |s~ - s| <= ||q|| err_a.

    f32 accumulation rounding differs between the two scans by at most
    ~D * u_f32 * (magnitude); ``eps_round`` covers it with a 5x margin,
    and the whole bound is doubled once more for safety — E is only used
    to widen the candidate window, so slack costs nothing unless the
    window overflows the candidate budget (which falls back to the full
    f32 scan and stays exact)."""
    qn = jnp.sqrt(jnp.sum(query * query))
    scale = (qn + err_a) * (norm_max + err_a) + (norm_max + err_a) ** 2
    eps_round = 3e-7 * d * scale
    if sel_metric == Metric.SQEUCLIDEAN_DIST:
        e = err_b + 2.0 * qn * err_a + eps_round
    else:  # INNER_PRODUCT
        e = qn * err_a + eps_round
    return 2.0 * e


def _two_pass_select(
    emb_f32, s1, query, n_valid, e_bound, row_norm2=None, *, metric, k
):
    """Shared pass-2: block-min candidate selection + f32 rescore.

    Selection: s1 reshapes to [NB, BLK] blocks; the _TP_CBLK blocks
    with the smallest block-minimum are the candidate set (CBLK*BLK
    rows). Containment proof: every row r in the true stable top-k has
    s_r <= V (k-th smallest f32 score) and V <= s1_(k) + E, so
    s1_r <= s1_(k) + 2E. Each of the k globally-smallest s1 rows lives
    in a block whose min is <= that row's s1, so those blocks are
    among the CBLK selected (CBLK >= k). ``ok`` asserts the WORST
    selected block-min is STRICTLY above s1_(k) + 2E: any row outside
    the selection has s1 >= its block min >= that cut, hence cannot be
    in the true top-k (including boundary ties). ``ok`` False -> the
    caller falls back to the full f32 scan, so exactness never depends
    on the error bound being tight.

    The check intentionally has NO full-coverage shortcut: even when
    every block is selected, rows separated by less than the fusion
    rounding noise could order differently in the blocked rescore than
    in the full scan — and exactly those corpora (mass near-ties within
    2E) are the ones the check routes to the fallback."""
    n_pad = s1.shape[0]
    nb = n_pad // _TP_BLK
    cb = min(_TP_CBLK, nb)
    s1b = s1.reshape(nb, _TP_BLK)
    mins = jnp.min(s1b, axis=1)  # [NB]
    neg_vals, blk_idx = jax.lax.top_k(-mins, cb)
    cut = -neg_vals[cb - 1]  # worst selected block-min
    blk_sorted = jnp.sort(blk_idx)  # ascending -> stable row order
    cand_s1 = s1b[blk_sorted].reshape(cb * _TP_BLK)
    kth = stable_topk_argmin(cand_s1, min(k, cb * _TP_BLK))[0][-1]
    ok = cut > kth + 2.0 * e_bound
    rows = emb_f32.reshape(nb, _TP_BLK, emb_f32.shape[1])[
        blk_sorted
    ].reshape(cb * _TP_BLK, emb_f32.shape[1])
    orig = (
        blk_sorted[:, None] * _TP_BLK
        + jax.lax.broadcasted_iota(jnp.int32, (1, _TP_BLK), 1)
    ).reshape(cb * _TP_BLK)
    rn_sel = (
        row_norm2.reshape(nb, _TP_BLK)[blk_sorted].reshape(cb * _TP_BLK)
        if row_norm2 is not None
        else None
    )
    s2 = pairwise_distances(query, rows, metric, rn_sel)
    s2 = jnp.where(orig < n_valid, s2, jnp.inf)
    topk = stable_topk_sort if k > _ARGMIN_MAX_K else stable_topk_argmin
    vals, pos = topk(s2, min(k, cb * _TP_BLK))
    return ok, vals, orig[pos]


@partial(jax.jit, static_argnames=("metric", "k"))
def _find_two_pass_kernel(
    emb_bf16, emb_f32, query, n_valid, err_a, err_b, norm_max,
    rn2_bf16=None, rn2_f32=None, *, metric: Metric, k: int,
):
    """f32-EXACT top-k at near-bf16 scan cost, one dispatch.

    Pass 1 scans the half-size bf16 matrix; pass 2 rescores a certified
    candidate window against the f32 rows (see _two_pass_select). The
    result selects the same stable top-k as the full f32 scan whenever
    ``ok`` is true (values agree up to XLA fusion-order rounding, a few
    ulp — the same ambiguity the full kernel itself carries vs a numpy
    scan; exact ties are bitwise-equal rows and keep their earliest-row
    order in both paths)."""
    sel_metric = (
        Metric.SQEUCLIDEAN_DIST
        if metric == Metric.EUCLIDEAN_DIST
        else metric
    )
    s1 = pairwise_distances(query, emb_bf16, sel_metric, rn2_bf16)
    row = jax.lax.broadcasted_iota(
        jnp.int32, (emb_bf16.shape[0], 1), 0
    ).reshape(-1)
    s1 = jnp.where(row < n_valid, s1, jnp.inf)
    e_bound = _two_pass_bound(
        query, err_a, err_b, norm_max, emb_bf16.shape[1], sel_metric
    )
    return _two_pass_select(
        emb_f32, s1, query, n_valid, e_bound, rn2_f32, metric=metric, k=k
    )


@partial(jax.jit, static_argnames=("metric", "k"))
def _find_two_pass_batch_kernel(
    emb_bf16, emb_f32, queries, n_valid, err_a, err_b, norm_max,
    rn2_bf16=None, rn2_f32=None, *, metric: Metric, k: int,
):
    """Batched two-pass: one bf16 MXU matmul + per-query candidate
    selection/rescore (vmapped). Returns (ok[Q], vals[Q,k], idx[Q,k])."""
    sel_metric = (
        Metric.SQEUCLIDEAN_DIST
        if metric == Metric.EUCLIDEAN_DIST
        else metric
    )
    s1 = pairwise_distances_batch(
        queries, emb_bf16, sel_metric, rn2_bf16
    )  # [Q, N]
    row = jax.lax.broadcasted_iota(
        jnp.int32, (emb_bf16.shape[0], 1), 0
    ).reshape(-1)
    s1 = jnp.where(row[None, :] < n_valid, s1, jnp.inf)

    def per_query(query, s1_q):
        e_bound = _two_pass_bound(
            query, err_a, err_b, norm_max, emb_bf16.shape[1], sel_metric
        )
        return _two_pass_select(
            emb_f32, s1_q, query, n_valid, e_bound, rn2_f32,
            metric=metric, k=k,
        )

    return jax.vmap(per_query)(queries, s1)


@partial(jax.jit, static_argnames=("metric", "k", "use_sort"))
def _find_kernel(
    emb, query, n_valid, row_norm2=None,
    *, metric: Metric, k: int, use_sort: bool,
):
    dists = pairwise_distances(query, emb, metric, row_norm2)
    row = jax.lax.broadcasted_iota(jnp.int32, (emb.shape[0], 1), 0).reshape(-1)
    dists = jnp.where(row < n_valid, dists, jnp.inf)
    if use_sort:
        return stable_topk_sort(dists, k)
    return stable_topk_argmin(dists, k)


@partial(jax.jit, static_argnames=("metric", "k"))
def _find_blockselect_kernel(
    emb, query, n_valid, norm_max, row_norm2=None,
    *, metric: Metric, k: int,
):
    """Single-query top-k via block-min candidate selection on the
    STORED matrix itself (the two_pass machinery with zero storage
    perturbation).

    Measured motivation: at 10M rows the distance pass runs at HBM
    roofline (~9 ms for 7.7 GB bf16) but ``stable_topk_argmin``'s k
    masked [N]-wide argmin sweeps add ~11 ms — more than the scan.
    Block-min selection replaces them with one [N/128] block-min
    reduce + a 128x smaller top_k + an exact rescore of the selected
    rows, the same structure the two_pass layout already uses. Here
    pass 1 and the rescore read the SAME matrix, so the only
    perturbation is XLA fusion-order rounding between the fused [N]
    pass and the gathered-candidate pass — covered by the
    ``_two_pass_bound`` eps_round term with err_a = err_b = 0; the
    containment certificate + full-scan fallback make the result
    identical to ``_find_kernel`` (values and stable tie order), as
    the adversarial-tie tests pin."""
    sel_metric = (
        Metric.SQEUCLIDEAN_DIST
        if metric == Metric.EUCLIDEAN_DIST
        else metric
    )
    s1 = pairwise_distances(query, emb, sel_metric, row_norm2)
    row = jax.lax.broadcasted_iota(
        jnp.int32, (emb.shape[0], 1), 0
    ).reshape(-1)
    s1 = jnp.where(row < n_valid, s1, jnp.inf)
    e_bound = _two_pass_bound(
        query,
        jnp.float32(0.0),
        jnp.float32(0.0),
        norm_max,
        emb.shape[1],
        sel_metric,
    )
    return _two_pass_select(
        emb, s1, query, n_valid, e_bound, row_norm2, metric=metric, k=k
    )


def _int8_quantize_query(query):
    """Per-query absmax int8 quantization (zero-vector guarded)."""
    sq = jnp.max(jnp.abs(query), axis=-1, keepdims=True) / 127.0
    sq = jnp.where(sq > 0, sq, 1.0)
    q8 = jnp.rint(query / sq).astype(jnp.int8)
    return q8, sq


def _int8_distances(emb_i8, scales, row_norm2, q8, sq, q_norm2, metric):
    """Distance-like scores against an int8 index (lower is better,
    matching ops/metrics conventions). The q8 x emb_i8 product runs as
    one s8 x s8 -> s32 MXU matmul (half the HBM traffic of bf16 and
    double the MXU rate on v5e); scaling and the norm terms run in f32.
    ``row_norm2`` is the EXACT squared norm of each dequantized row, so
    the only approximation anywhere is the query's own quantization in
    the cross term."""
    prod = jax.lax.dot_general(
        q8,
        emb_i8,
        (((q8.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [..., N] s32
    dot = prod.astype(jnp.float32) * (sq * scales[None, :])
    if metric == Metric.INNER_PRODUCT:
        return -dot
    sqe = jnp.maximum(q_norm2 - 2.0 * dot + row_norm2[None, :], 0.0)
    if metric == Metric.EUCLIDEAN_DIST:
        return jnp.sqrt(sqe)
    return sqe


@partial(jax.jit, static_argnames=("metric", "k", "use_sort"))
def _find_int8_kernel(
    emb_i8, scales, row_norm2, query, n_valid, *, metric, k, use_sort
):
    q8, sq = _int8_quantize_query(query[None, :])
    q_norm2 = jnp.sum(query.astype(jnp.float32) ** 2)
    dists = _int8_distances(
        emb_i8, scales, row_norm2, q8, sq, q_norm2, metric
    )[0]
    row = jax.lax.broadcasted_iota(
        jnp.int32, (emb_i8.shape[0], 1), 0
    ).reshape(-1)
    dists = jnp.where(row < n_valid, dists, jnp.inf)
    if use_sort:
        return stable_topk_sort(dists, k)
    return stable_topk_argmin(dists, k)


@partial(jax.jit, static_argnames=("metric", "k", "use_sort"))
def _find_int8_batch_kernel(
    emb_i8, scales, row_norm2, queries, n_valid, *, metric, k, use_sort
):
    q8, sq = _int8_quantize_query(queries)
    q_norm2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)[:, None]
    dists = _int8_distances(
        emb_i8, scales, row_norm2, q8, sq, q_norm2, metric
    )  # [Q, N]
    row = jax.lax.broadcasted_iota(
        jnp.int32, (emb_i8.shape[0], 1), 0
    ).reshape(-1)
    dists = jnp.where(row[None, :] < n_valid, dists, jnp.inf)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    return jax.vmap(lambda d: topk(d, k))(dists)


@partial(jax.jit, static_argnames=("metric", "k", "use_sort"))
def _find_batch_kernel(
    emb, queries, n_valid, row_norm2=None,
    *, metric: Metric, k: int, use_sort: bool,
):
    """[Q, D] queries in one dispatch: one MXU matmul + vmapped top-k."""
    dists = pairwise_distances_batch(queries, emb, metric, row_norm2)  # [Q, N]
    row = jax.lax.broadcasted_iota(jnp.int32, (emb.shape[0], 1), 0).reshape(-1)
    dists = jnp.where(row[None, :] < n_valid, dists, jnp.inf)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    return jax.vmap(lambda d: topk(d, k))(dists)


@jax.jit
def _gather_rows_jit(parent, idx):
    """One-dispatch [q_pad]-row gather out of a DeviceRow wave parent
    (idx is traced, so ONE compile per (parent bucket, q_pad) pair —
    not one per distinct offset pattern like eager row slices)."""
    return jnp.take(parent, idx, axis=0).astype(jnp.float32)


def hits_from_topk(
    vals, idx, n_rows, doc_ids, chunk_ids, retrieval_type
) -> tuple[list[SearchHit], list[float]]:
    """(values, indices) from a top-k kernel -> SearchHits + distances,
    stopping at padding rows (shared by the dense and sharded indexes).
    ``vals`` are distance-like (lower is better; the MaxSim indexes
    negate their similarities before top-k), so each hit carries
    ``score=-v`` — the higher-is-better form score-aware fusion uses."""
    hits: list[SearchHit] = []
    dists: list[float] = []
    for v, i in zip(vals, idx):
        if i >= n_rows:
            # padding row (fewer valid rows than k): the top-k kernel
            # masks padded rows to +inf, so every later entry is also
            # padding. The index alone is the honest predicate — a
            # non-finite *score* at a real index must stay a hit.
            break
        v = float(v)
        hits.append(
            SearchHit(
                doc_id=int(doc_ids[i]),
                chunk_id=int(chunk_ids[i]),
                retrieval_type=retrieval_type,
                score=-v if np.isfinite(v) else None,
            )
        )
        dists.append(v)
    return hits, dists


class DenseIndex:
    """Flat dense index over multiple documents; query on device."""

    def __init__(
        self,
        retrieval_type: RetrievalType,
        doc_embeddings: list[DocEmbeddings],
        metric: Metric | str = Metric.SQEUCLIDEAN_DIST,
        limit: int = 1,
        storage_dtype: str = "float32",
    ):
        """``storage_dtype="bfloat16"`` stores the matrix half-size: the
        scan is HBM-bandwidth-bound, so query throughput roughly doubles.
        Distances still accumulate in f32; ranking differs from the f32
        index only between near-tied candidates (opt-in — the default
        keeps exact numpy parity).

        ``storage_dtype="two_pass"`` keeps BOTH matrices (bf16 + f32,
        1.5x the f32 memory): queries scan the bf16 copy, then re-score
        a certified candidate window against the f32 rows — provably
        identical (values AND stable tie order) to the f32 scan, at
        near-bf16 latency (see ``_find_two_pass_kernel``). Cosine is
        excluded: its eps-guarded denominator has no query-independent
        error bound.

        ``storage_dtype="int8"`` stores per-row absmax-quantized rows
        (quarter the f32 bytes — the capacity layout for >10M-chunk
        corpora on one chip) scanned as one s8 x s8 -> s32 MXU matmul;
        row norms are exact, so the only approximation is the query's
        own quantization in the cross term (opt-in; near ties can
        reorder). Cosine is excluded (zero-guard semantics)."""
        self.retrieval_type = retrieval_type
        self.metric = Metric(metric)
        self.limit = limit
        self.storage_dtype = storage_dtype
        self._scales = None
        self._row_norm2 = None
        if (
            storage_dtype in ("two_pass", "int8")
            and self.metric == Metric.COSINE_SIM
        ):
            raise ValueError(
                f"{storage_dtype} storage does not support cosine_sim "
                "(the eps-guarded denominator has no query-independent "
                "certified error bound); use float32"
            )

        non_empty = [(i, d) for i, d in enumerate(doc_embeddings) if d.num_rows]
        self.n_rows = sum(d.num_rows for _, d in non_empty)
        if self.n_rows == 0:
            self.dim = 0
            self._emb = None
            self._emb_f32 = None
            return

        self.dim = non_empty[0][1].embeddings.shape[1]
        doc_ids = np.concatenate(
            [np.full(d.num_rows, i, dtype=np.int64) for i, d in non_empty]
        )
        chunk_ids = np.concatenate([d.chunk_ids for _, d in non_empty])
        emb = np.concatenate([d.embeddings for _, d in non_empty], axis=0)

        n_pad = _bucket_rows(self.n_rows)
        if n_pad != self.n_rows:
            emb = np.pad(emb, ((0, n_pad - self.n_rows), (0, 0)))
        # Host-side row -> (doc, chunk) mapping; top-k indices come back small.
        self._doc_ids = doc_ids
        self._chunk_ids = chunk_ids
        if self.storage_dtype == "two_pass":
            self._emb_f32 = jnp.asarray(emb, dtype=jnp.float32)
            self._emb = self._emb_f32.astype(jnp.bfloat16)
            self._err = _two_pass_error_terms(self._emb_f32)
            # cached norms for both copies: pass 1 scans bf16, the
            # rescore + the fallback scan read f32 — each path must use
            # ITS OWN matrix's norms so results stay self-consistent
            self._rn2_bf16, _ = _row_norm_terms(self._emb)
            self._rn2_f32, _ = _row_norm_terms(self._emb_f32)
        elif self.storage_dtype == "int8":
            self._emb_f32 = None
            emb = emb.astype(np.float32)
            absmax = np.max(np.abs(emb), axis=1)
            scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(
                np.float32
            )
            q = np.rint(emb / scales[:, None]).astype(np.int8)
            # exact squared norm of each DEQUANTIZED row (f64 on host)
            norm2 = (
                scales.astype(np.float64) ** 2
                * (q.astype(np.float64) ** 2).sum(axis=1)
            ).astype(np.float32)
            self._emb = jnp.asarray(q)
            self._scales = jnp.asarray(scales)
            self._row_norm2 = jnp.asarray(norm2)
        else:
            self._emb_f32 = None
            self._emb = jnp.asarray(
                emb, dtype=jnp.dtype(self.storage_dtype)
            )  # [n_pad, D] in HBM
            # cached norms serve every metric; norm_max additionally
            # feeds the block-select rounding bound (non-cosine only)
            self._rn2_cache, self._norm_max = _row_norm_terms(self._emb)

    @classmethod
    def from_device_matrix(
        cls,
        retrieval_type: RetrievalType,
        emb,  # jax.Array [n, D], device-resident
        chunk_ids: np.ndarray | None = None,
        doc_ids: np.ndarray | None = None,
        metric: Metric | str = Metric.SQEUCLIDEAN_DIST,
        limit: int = 1,
    ) -> "DenseIndex":
        """Zero-copy index construction from embeddings already in HBM
        (the encode-append hot path: embed_documents_device -> here; no
        host round-trip of the [n, D] matrix)."""
        import jax.numpy as jnp_mod

        self = cls.__new__(cls)
        self.retrieval_type = retrieval_type
        self.metric = Metric(metric)
        self.limit = limit
        self.storage_dtype = str(emb.dtype)
        self._emb_f32 = None
        self._scales = None
        self._row_norm2 = None
        self.n_rows = int(emb.shape[0])
        if self.n_rows == 0:
            self.dim = 0
            self._emb = None
            return self
        self.dim = int(emb.shape[1])
        n_pad = _bucket_rows(self.n_rows)
        if n_pad != self.n_rows:
            emb = jnp_mod.pad(emb, ((0, n_pad - self.n_rows), (0, 0)))
        self._emb = emb
        self._rn2_cache, self._norm_max = _row_norm_terms(emb)
        self._chunk_ids = (
            np.arange(self.n_rows, dtype=np.int64)
            if chunk_ids is None
            else np.asarray(chunk_ids, dtype=np.int64)
        )
        self._doc_ids = (
            np.zeros(self.n_rows, dtype=np.int64)
            if doc_ids is None
            else np.asarray(doc_ids, dtype=np.int64)
        )
        return self

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
        """Compile-ahead for serving: run the single-query kernel plus
        the batched kernel at every power-of-two wave bucket up to
        ``max_q`` (the micro-batcher's max_batch) on dummy queries.

        Under concurrent load the cross-request coalescer
        (``afind`` -> ``find_batch``) produces wave sizes the serial
        warmup never sees; an uncompiled (corpus-bucket, q_pad) pair
        recompiles mid-request — measured seconds each through a remote
        TPU tunnel, the dominant term of the first minute of concurrent
        traffic. The device cache triggers this off the hot path right
        after an index is built (DeviceIndexCache.get_or_build(warm=));
        with the persistent compile cache the cost is once per machine."""
        if self._emb is None:
            return
        self.find(np.zeros(self.dim, dtype=np.float32))
        q = 8  # find_batch's smallest q_pad bucket
        while q <= max_q:
            self.find_batch(np.zeros((q, self.dim), dtype=np.float32))
            q *= 2

    async def afind(self, query) -> list[SearchHit]:
        """``find`` with cross-request coalescing.

        Concurrent callers' single queries (one per in-flight serving
        request) stack into ONE ``find_batch`` device dispatch with ONE
        host sync per wave instead of one each. Behind a high-latency
        device link the per-request sync round-trip — not device time —
        bounds serial latency, so sharing it across in-flight requests
        is what lets QPS scale past 1/RTT. Results are identical to
        ``find`` (find_batch parity is pinned by test_batch_find)."""
        return await self._scan_batcher.submit(query)

    @property
    def _scan_batcher(self):
        batcher = self.__dict__.get("_scan_batcher_cached")
        if batcher is None:
            from dial_rag_tpu.runtime.micro_batcher import (
                MicroBatcher,
                PerLoopBatcher,
            )

            async def scan_all(queries: list) -> list[list[SearchHit]]:
                import asyncio

                return await asyncio.get_running_loop().run_in_executor(
                    None, self._scan_wave, queries
                )

            batcher = PerLoopBatcher(
                lambda: MicroBatcher(scan_all, max_batch=64)
            )
            self.__dict__["_scan_batcher_cached"] = batcher
        return batcher

    def _scan_wave(self, queries: list) -> list[list[SearchHit]]:
        from dial_rag_tpu.utils.device_rows import DeviceRow, as_wave

        if len(queries) == 1:
            # a lone query keeps the single-row kernel (no extra stack
            # dispatch on the serial path)
            return [self.find(queries[0])]
        wave = as_wave(queries)
        if wave is not None:
            # the wave's rows all view ONE encode output [Qb, D]: scan
            # the parent array in place — zero row-level dispatches
            # between encode and scan (the whole point of DeviceRow;
            # per-row slice+restack costs one eager dispatch per row
            # plus, behind a remote link, one compile per distinct
            # (bucket, offset))
            parent, indices = wave
            q = len(indices)
            qb = int(parent.shape[0])
            q_pad = 1 << max(3, (q - 1).bit_length())
            if indices == list(range(q)) and qb >= q_pad and (
                qb & (qb - 1)
            ) == 0:
                return self.find_batch(parent, n_real=q)
            # same parent, subset/scrambled rows (e.g. one encode wave
            # feeding several per-document indexes): ONE gather dispatch
            idx = np.full((q_pad,), indices[0], dtype=np.int32)
            idx[:q] = indices
            rows = _gather_rows_jit(parent, jnp.asarray(idx))
            return self.find_batch(rows, n_real=q)
        rows = []
        for qv in queries:
            if isinstance(qv, DeviceRow):
                qv = qv.resolve()
            rows.append(
                qv.astype(jnp.float32).reshape(-1)
                if isinstance(qv, jax.Array)
                else jnp.asarray(
                    np.asarray(qv, dtype=np.float32).reshape(-1)
                )
            )
        # pad the stack to the power-of-two wave bucket BEFORE the
        # device stack: jnp.stack compiles per exact row count, so
        # unpadded waves of 2..max_batch would each pay a fresh compile
        # (seconds through a remote tunnel) the first time that size
        # occurs under load
        q = len(rows)
        q_pad = 1 << max(3, (q - 1).bit_length())
        rows.extend([rows[0]] * (q_pad - q))
        return self.find_batch(jnp.stack(rows), n_real=q)

    def find_batch(
        self, queries: np.ndarray, n_real: int | None = None
    ) -> list[list[SearchHit]]:
        """Per-query hits for ``queries`` [Q, D] in ONE device dispatch.

        Identical results to Q ``find`` calls; the doc matrix is read
        from HBM once instead of Q times. Q is padded to a power-of-two
        bucket so the jit cache stays small. ``n_real`` marks how many
        leading rows are real queries when the array is already padded
        (a DeviceRow wave parent carries encode-bucket padding rows that
        must be scanned-and-ignored, not sliced off — the slice would
        cost the eager dispatch the wave path exists to avoid).
        """
        if isinstance(queries, jax.Array):
            # device-resident queries stay on device (see
            # find_with_distances); padding happens in HBM
            queries = queries.astype(jnp.float32)
            q = queries.shape[0] if n_real is None else n_real
            if q == 0 or self._emb is None:
                return [[] for _ in range(q)]
            q_pad = 1 << max(3, (q - 1).bit_length())
            if queries.shape[0] < q_pad:
                queries = jnp.pad(
                    queries, ((0, q_pad - queries.shape[0]), (0, 0))
                )
            # shape[0] may EXCEED q_pad (encode-bucket padding): the
            # kernel scans the extra rows; wave-scale device time is
            # trivial next to one slice dispatch through a remote link
        else:
            queries = np.asarray(queries, dtype=np.float32)
            q = queries.shape[0] if n_real is None else n_real
            if q == 0 or self._emb is None:
                return [[] for _ in range(q)]
            q_pad = 1 << max(3, (q - 1).bit_length())
            if queries.shape[0] < q_pad:
                queries = np.pad(
                    queries, ((0, q_pad - queries.shape[0]), (0, 0))
                )
        k = min(self.limit, self.n_rows)
        if self._emb_f32 is not None:
            ok, vals, idx = _find_two_pass_batch_kernel(
                self._emb,
                self._emb_f32,
                jnp.asarray(queries),
                jnp.int32(self.n_rows),
                *self._err,
                self._rn2_bf16,
                self._rn2_f32,
                metric=self.metric,
                k=k,
            )
            # one batched D2H for all three outputs; only the q REAL
            # queries gate the fallback: the zero-vector padding rows
            # see an all-tied corpus (every score ~ ||d||^2 on
            # normalized embeddings) and would fail the containment
            # check on essentially every batch, silently forcing the
            # full f32 scan on top of the two-pass dispatch
            ok, vals, idx = jax.device_get((ok, vals, idx))
            if not bool(ok[:q].all()):
                # >c near-tied rows for some query: full f32 scan keeps
                # the exactness guarantee (rare; adversarial tie corpora)
                vals, idx = jax.device_get(
                    _find_batch_kernel(
                        self._emb_f32,
                        jnp.asarray(queries),
                        jnp.int32(self.n_rows),
                        self._rn2_f32,
                        metric=self.metric,
                        k=k,
                        use_sort=k > _ARGMIN_MAX_K,
                    )
                )
        elif self._scales is not None:
            vals, idx = jax.device_get(
                _find_int8_batch_kernel(
                    self._emb,
                    self._scales,
                    self._row_norm2,
                    jnp.asarray(queries),
                    jnp.int32(self.n_rows),
                    metric=self.metric,
                    k=k,
                    use_sort=k > _ARGMIN_MAX_K,
                )
            )
        else:
            vals, idx = jax.device_get(
                _find_batch_kernel(
                    self._emb,
                    jnp.asarray(queries),
                    jnp.int32(self.n_rows),
                    getattr(self, "_rn2_cache", None),
                    metric=self.metric,
                    k=k,
                    use_sort=k > _ARGMIN_MAX_K,
                )
            )
        vals = vals[:q]
        idx = idx[:q]
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
        from dial_rag_tpu.utils.device_rows import DeviceRow

        if self._emb is None:
            return [], []
        if isinstance(query, DeviceRow):
            # lone query off the coalesced encode path: one memoized
            # slice materializes the row (the wave fast path lives in
            # _scan_wave and never gets here)
            query = query.resolve()
        if isinstance(query, jax.Array):
            # device-resident query (embed_queries_device): the
            # encode->scan dependency resolves on the device, so the
            # request's only host sync is the final top-k fetch
            query = jnp.reshape(query.astype(jnp.float32), (-1,))
        else:
            query = jnp.asarray(
                np.asarray(query, dtype=np.float32).reshape(-1)
            )
        k = min(self.limit, self.n_rows)
        if self._emb_f32 is not None:
            ok, vals, idx = _find_two_pass_kernel(
                self._emb,
                self._emb_f32,
                query,
                jnp.int32(self.n_rows),
                *self._err,
                self._rn2_bf16,
                self._rn2_f32,
                metric=self.metric,
                k=k,
            )
            # ONE batched D2H for all three outputs (the async copies
            # overlap): fetching the ok flag alone first would serialize
            # an extra host round-trip on every query
            ok, vals, idx = jax.device_get((ok, vals, idx))
            if not bool(ok):
                vals, idx = jax.device_get(
                    _find_kernel(
                        self._emb_f32,
                        query,
                        jnp.int32(self.n_rows),
                        self._rn2_f32,
                        metric=self.metric,
                        k=k,
                        use_sort=k > _ARGMIN_MAX_K,
                    )
                )
        elif self._scales is not None:
            vals, idx = jax.device_get(
                _find_int8_kernel(
                    self._emb,
                    self._scales,
                    self._row_norm2,
                    query,
                    jnp.int32(self.n_rows),
                    metric=self.metric,
                    k=k,
                    use_sort=k > _ARGMIN_MAX_K,
                )
            )
        elif (
            self.metric != Metric.COSINE_SIM
            and getattr(self, "_norm_max", None) is not None
        ):
            # block-select path: the [N]-wide stable top-k costs more
            # than the roofline distance pass at corpus scale (measured
            # ~11 vs ~9 ms at 10M bf16); certificate + fallback keep
            # results identical to _find_kernel
            ok, vals, idx = _find_blockselect_kernel(
                self._emb,
                query,
                jnp.int32(self.n_rows),
                self._norm_max,
                getattr(self, "_rn2_cache", None),
                metric=self.metric,
                k=k,
            )
            ok, vals, idx = jax.device_get((ok, vals, idx))
            if not bool(ok):
                vals, idx = jax.device_get(
                    _find_kernel(
                        self._emb,
                        query,
                        jnp.int32(self.n_rows),
                        getattr(self, "_rn2_cache", None),
                        metric=self.metric,
                        k=k,
                        use_sort=k > _ARGMIN_MAX_K,
                    )
                )
        else:
            vals, idx = jax.device_get(
                _find_kernel(
                    self._emb,
                    query,
                    jnp.int32(self.n_rows),
                    getattr(self, "_rn2_cache", None),
                    metric=self.metric,
                    k=k,
                    use_sort=k > _ARGMIN_MAX_K,
                )
            )
        return hits_from_topk(
            vals,
            idx,
            self.n_rows,
            self._doc_ids,
            self._chunk_ids,
            self.retrieval_type,
        )
