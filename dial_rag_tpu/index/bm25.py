"""Okapi BM25 scoring on device.

Replaces the reference's rank-bm25 ``BM25Okapi`` (aidial_rag/retrievers/
bm25_retriever.py:78-84) with a TPU formulation: all per-(item, term)
saturation weights are precomputed at build time into a term-frequency
weight matrix ``W[i, t] = idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl_i/avgdl))``
so that scoring a query is a single MXU matvec ``W @ q`` where ``q[t]`` is
the query term count. This is exactly rank-bm25's score, including:

- idf = ln((N - df + 0.5) / (df + 0.5)) with the epsilon floor: negative
  idfs are replaced by ``epsilon * average_idf`` where average_idf is the
  mean over ALL terms (rank_bm25 BM25Okapi._calc_idf);
- repeated query terms contribute once per occurrence;
- out-of-vocabulary query terms contribute 0.

Top-n reproduces the reference's EXACT tie-break, which is subtle: it uses
``np.argsort(scores, kind="stable")[::-1][:n]`` — descending scores with
ties broken by the LATER index first (the reverse of stable). We map this
to the device stable top-k by scoring the flipped array and re-mapping
indices.

Dense [N, V] weights are used up to ``max_dense_bytes``; above that the
index switches to a device-resident CSC postings layout: rows/vals stay
in HBM and the host sends only slice offsets per query. Query terms are
grouped by posting-length bucket (so one ubiquitous term cannot inflate
the padding of rare terms); each group is one gather + scatter-add
kernel, and a final stable top-k finishes the ranking — per-query work
is O(postings of the query terms) instead of O(N·V).
"""

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dial_rag_tpu.ops.metrics import _PRECISION
from dial_rag_tpu.ops.stable_topk import (
    _ARGMIN_MAX_K,
    stable_topk_argmin,
    stable_topk_sort,
)

K1 = 1.5
B = 0.75
EPSILON = 0.25

_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(jax.jit, static_argnames=("k", "use_sort"))
def _bm25_topk_kernel(weights, query_vec, n_valid, *, k: int, use_sort: bool):
    scores = jnp.dot(
        weights,
        query_vec,
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
    n_pad = scores.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    # padding rows must lose to every real row: scores desc -> use -inf...
    # but the reference tie-break makes LATER real rows win ties, so flip
    # the array, take stable ascending top-k of the negated scores, and map
    # indices back.
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    flipped = jnp.flip(-scores)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    vals, idx = topk(flipped, k)
    return -vals, (n_pad - 1) - idx


# Fixed virtual-slice width for the CSC tail. Query prep splits every
# term's posting range into <= _VSLICE-length windows, so (a) the
# posting load is a run of lax.dynamic_slice reads — measured 10.8x
# faster than the equivalent arbitrary-index gather on TPU, whose
# lowering cannot see that the indices are contiguous; (b) scatter
# padding waste is bounded by _VSLICE per term instead of by the
# LONGEST posting list in the query; (c) l_pad is a constant, so the
# jit cache stops growing per distinct posting-length bucket. Postings
# arrays are zero-padded by _VSLICE at build time so slices never
# clamp (a clamped dynamic_slice would silently shift the window).
_VSLICE = 2048


def _sparse_scores(rows_dev, vals_dev, starts, lens, counts, *, n_pad, l_pad):
    """Score the query's virtual posting slices into [n_pad] items:
    a scan of dynamic-slice loads + scatter-adds. Entries beyond a
    slice's length are masked to value 0.0 AND redirected to a dump row
    at index ``n_pad`` (the accumulator carries 8 spare rows), which
    keeps every slice's scatter indices non-decreasing: a virtual slice
    windows ONE term's posting range, and postings are built item-
    ascending per term, so real rows are sorted and the dump rows
    append at the top. ``indices_are_sorted=True`` then lets XLA lower
    a parallel scatter instead of the serialized general path —
    measured 3.1x on a v5e at 131k postings/query over 1M items
    (94.5 -> 30.4 ms; exact same scores). Per-query host->device
    traffic is just the [t_pad] starts/lens/counts vectors."""
    iota = jax.lax.iota(jnp.int32, l_pad)

    def per_slice(acc, term):
        s, ln, c = term
        r = jax.lax.dynamic_slice(rows_dev, (s,), (l_pad,))
        v = jax.lax.dynamic_slice(vals_dev, (s,), (l_pad,))
        v = jnp.where(iota < ln, v * c, 0.0)
        r = jnp.where(iota < ln, r, n_pad)
        return acc.at[r].add(v, indices_are_sorted=True), None

    # The zero-mul term pins the carry's varying-manual-axes type to the
    # inputs' so the same scan traces both under plain jit and inside a
    # shard_map body (a plain zeros carry is unvarying there and scan
    # rejects the carry type mismatch); vals_dev is finite, so the added
    # term is exactly 0.0.
    acc0 = jnp.zeros(n_pad + 8, dtype=jnp.float32) + vals_dev[0] * 0.0
    scores, _ = jax.lax.scan(per_slice, acc0, (starts, lens, counts))
    return scores[:n_pad]


@partial(jax.jit, static_argnames=("n_pad", "l_pad"))
def _bm25_sparse_scores_kernel(
    rows_dev, vals_dev, starts, lens, counts, *, n_pad: int, l_pad: int
):
    return _sparse_scores(
        rows_dev, vals_dev, starts, lens, counts, n_pad=n_pad, l_pad=l_pad
    )


@partial(jax.jit, static_argnames=("n_pad", "l_pad"))
def _bm25_sparse_banded_scores_kernel(
    rows_dev,
    vals_dev,
    starts,
    lens,
    counts,
    band_w,
    band_q,
    *,
    n_pad: int,
    l_pad: int,
):
    """Single-query [n_pad] scores: tail virtual slices + the dense
    band matvec, fused into one dispatch."""
    scores = _sparse_scores(
        rows_dev, vals_dev, starts, lens, counts, n_pad=n_pad, l_pad=l_pad
    )
    if band_w is not None and band_q is not None:
        scores = scores + jnp.dot(
            band_w,
            band_q,
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
    return scores


@partial(jax.jit, static_argnames=("k", "use_sort"))
def _bm25_topk_batch_kernel(weights, query_mat, n_valid, *, k, use_sort):
    """[V, Q] query-count columns: one MXU matmul scores Q queries, then
    per-column reference-exact top-k (vmapped)."""
    scores = jnp.dot(
        weights,
        query_mat,
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )  # [N, Q]
    n_pad = scores.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    scores = jnp.where(row[:, None] < n_valid, scores, -jnp.inf)
    flipped = jnp.flip(-scores, axis=0)  # [N, Q]
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    vals, idx = jax.vmap(lambda col: topk(col, k))(flipped.T)
    return -vals, (n_pad - 1) - idx  # [Q, k]


@partial(jax.jit, static_argnames=("k", "use_sort", "n_pad", "l_pad"))
def _bm25_sparse_topk_batch_kernel(
    rows_dev,
    vals_dev,
    starts,  # [Q, T]
    lens,  # [Q, T]
    counts,  # [Q, T]
    n_valid,
    band_w=None,  # [n_pad, K] dense band weights
    band_q=None,  # [Q, K] band term counts
    *,
    n_pad: int,
    l_pad: int,
    k: int,
    use_sort: bool,
):
    """UNIFORM-profile batched kernel: vmapped per-query scan over
    [Q, T] slice tables. Each of the T scan steps scatters all Q
    queries' slices at once, amortizing the per-step overhead — the
    right shape when every query carries a similar slice count (the
    dense-vocab stress regime; measured 1.5 ms vs the flat kernel's
    25 ms at 1M items). The flat kernel below wins when slice counts
    are SKEWED (one heavy query would multiply every query's work
    here); top_n_batch_with_scores picks per batch by padded-vs-actual
    slice ratio."""
    scores = jax.vmap(
        lambda st, ln, cn: _sparse_scores(
            rows_dev, vals_dev, st, ln, cn, n_pad=n_pad, l_pad=l_pad
        )
    )(starts, lens, counts)  # [Q, n_pad]
    if band_w is not None and band_q is not None:
        scores = scores + jnp.dot(
            band_q,
            band_w.T,
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    scores = jnp.where(row[None, :] < n_valid, scores, -jnp.inf)
    flipped = jnp.flip(-scores, axis=1)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    vals, idx = jax.vmap(lambda srow: topk(srow, k))(flipped)
    return -vals, (n_pad - 1) - idx  # [Q, k]


@partial(
    jax.jit, static_argnames=("k", "use_sort", "n_pad", "l_pad", "q_pad")
)
def _bm25_sparse_topk_flat_kernel(
    rows_dev,
    vals_dev,
    starts,  # [S] flattened slice table across ALL queries
    lens,  # [S]
    counts,  # [S]
    qoff,  # [S] owning query's accumulator base (qid * stride)
    n_valid,
    band_w=None,  # [n_pad, K] dense band weights
    band_q=None,  # [Q, K] band term counts
    *,
    n_pad: int,
    l_pad: int,
    q_pad: int,
    k: int,
    use_sort: bool,
):
    """Q sparse-CSC queries scored and ranked in ONE dispatch over a
    FLATTENED slice table.

    The previous batched formulation vmapped the per-query scan over
    [Q, T_max] tables, so every query paid the batch's worst slice
    count: scatter work Q x T_max x l_pad. One query drawing a single
    near-band-threshold term (tens of slices) multiplied the whole
    batch's work — measured as the dominant term of the 10M-item
    realistic-vocabulary profile (150 ms/query, round-4 BENCH). Here
    each slice carries its owning query's accumulator offset and the
    batch scans sum(T_q) slices total — work proportional to the
    queries' ACTUAL postings.

    Exactness: per (item, term) there is exactly one posting, and the
    flattened table keeps each query's slices contiguous in the same
    term-ascending order as the per-query path, so every item's f32
    accumulation order is unchanged — scores are bit-identical. The
    sorted-scatter contract holds per slice: within a slice the offset
    is constant and rows ascend; masked entries redirect to the query's
    dump row at base + n_pad (stride = n_pad + 8 keeps it below the
    next query's base)."""
    stride = n_pad + 8
    iota = jax.lax.iota(jnp.int32, l_pad)

    def per_slice(acc, term):
        s, ln, c, qo = term
        r = jax.lax.dynamic_slice(rows_dev, (s,), (l_pad,))
        v = jax.lax.dynamic_slice(vals_dev, (s,), (l_pad,))
        v = jnp.where(iota < ln, v * c, 0.0)
        r = jnp.where(iota < ln, qo + r, qo + n_pad)
        return acc.at[r].add(v, indices_are_sorted=True), None

    acc0 = (
        jnp.zeros(q_pad * stride, dtype=jnp.float32) + vals_dev[0] * 0.0
    )
    flat, _ = jax.lax.scan(per_slice, acc0, (starts, lens, counts, qoff))
    scores = flat.reshape(q_pad, stride)[:, :n_pad]  # [Q, n_pad]
    if band_w is not None and band_q is not None:
        scores = scores + jnp.dot(
            band_q,
            band_w.T,
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    scores = jnp.where(row[None, :] < n_valid, scores, -jnp.inf)
    flipped = jnp.flip(-scores, axis=1)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    vals, idx = jax.vmap(lambda srow: topk(srow, k))(flipped)
    return -vals, (n_pad - 1) - idx  # [Q, k]


@partial(jax.jit, static_argnames=("k", "use_sort"))
def _bm25_topk_from_scores_kernel(scores, n_valid, *, k: int, use_sort: bool):
    """Reference-exact descending top-k over precomputed scores."""
    n_pad = scores.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    flipped = jnp.flip(-scores)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    out_vals, idx = topk(flipped, k)
    return -out_vals, (n_pad - 1) - idx


def _next_pow2(n: int, lo: int = 4) -> int:
    return max(lo, 1 << max(0, (n - 1)).bit_length())


@dataclass
class Bm25Index:
    """Device-resident BM25 index over flattened items."""

    vocab: dict[str, int]
    idf: np.ndarray  # [V] f64
    n_items: int
    _weights_dev: jnp.ndarray | None = field(default=None, repr=False)
    _weights_host: np.ndarray | None = field(default=None, repr=False)
    # device CSC postings: (term_ptr [V+1] host, rows dev [nnz] i32,
    # vals dev [nnz] f32)
    _postings: tuple | None = field(default=None, repr=False)
    # host CSC postings (device=False sparse build; consumed by the
    # sharded wrapper, which re-shards them row-wise per device)
    _postings_host: tuple | None = field(default=None, repr=False)
    # dense band over the highest-df terms of a sparse build (TPU
    # scatter-add costs ~cycles/posting; ubiquitous terms move to one
    # MXU matvec): [n_pad, K] weights + term_id -> column map
    _band_dev: jnp.ndarray | None = field(default=None, repr=False)
    _band_cols: dict | None = field(default=None, repr=False)

    @property
    def nbytes(self) -> int:
        if self._weights_dev is not None:
            return self._weights_dev.size * 4
        if self._postings is not None:
            _, rows, vals = self._postings
            band = (
                self._band_dev.size * 4 if self._band_dev is not None else 0
            )
            return rows.size * 4 + vals.size * 4 + band
        return 0

    @classmethod
    def build(
        cls,
        tokenized_items: list[list[str]],
        max_dense_bytes: int = 256 * 1024 * 1024,
        device: bool = True,
        max_band_bytes: int = 512 * 1024 * 1024,
    ) -> "Bm25Index":
        """``device=False`` keeps the dense weights host-side (the
        sharded wrapper uploads its own flipped copy instead)."""
        n = len(tokenized_items)
        if sum(map(len, tokenized_items)) == 0:
            raise ValueError("Text index is empty.")

        vocab: dict[str, int] = {}
        df: list[int] = []
        rows: list[dict[int, int]] = []
        dl = np.zeros(n, dtype=np.float64)
        for i, toks in enumerate(tokenized_items):
            dl[i] = len(toks)
            tf: dict[int, int] = {}
            for t in toks:
                tid = vocab.get(t)
                if tid is None:
                    tid = len(vocab)
                    vocab[t] = tid
                    df.append(0)
                tf[tid] = tf.get(tid, 0) + 1
            for tid in tf:
                df[tid] += 1
            rows.append(tf)

        v = len(vocab)
        df_arr = np.array(df, dtype=np.float64)
        idf = np.log(n - df_arr + 0.5) - np.log(df_arr + 0.5)
        average_idf = idf.sum() / v
        idf = np.where(idf < 0, EPSILON * average_idf, idf)

        avgdl = dl.sum() / n
        denom_norm = K1 * (1.0 - B + B * dl / avgdl)  # [N]

        index = cls(vocab=vocab, idf=idf, n_items=n)
        index._assemble(
            rows,
            lambda i, tid, f: idf[tid] * f * (K1 + 1.0) / (f + denom_norm[i]),
            max_dense_bytes=max_dense_bytes,
            device=device,
            max_band_bytes=max_band_bytes,
        )
        return index

    @classmethod
    def from_term_weights(
        cls,
        vocab: dict[str, int],
        idf: np.ndarray,
        weight_rows: list[dict[int, float]],
        max_dense_bytes: int = 256 * 1024 * 1024,
        device: bool = True,
        max_band_bytes: int = 512 * 1024 * 1024,
    ) -> "Bm25Index":
        """Assemble the device layouts from EXPLICIT per-item term
        weights instead of the Okapi formula. Every scoring path is the
        linear form ``score[i] = sum_t q[t] * W[i, t]``, so any retrieval
        model of that shape (e.g. the char-n-gram TF-IDF cosine arm,
        index/chargram.py) rides the same dense-band + CSC machinery,
        batching, coalescing, and sharded wrappers unchanged."""
        if not any(weight_rows):
            raise ValueError("Text index is empty.")
        index = cls(vocab=vocab, idf=idf, n_items=len(weight_rows))
        index._assemble(
            weight_rows,
            lambda i, tid, w: w,
            max_dense_bytes=max_dense_bytes,
            device=device,
            max_band_bytes=max_band_bytes,
        )
        return index

    @classmethod
    def from_term_weight_arrays(
        cls,
        vocab: dict,
        idf: np.ndarray,
        item_ids: np.ndarray,
        term_ids: np.ndarray,
        weights: np.ndarray,
        n_items: int,
        max_dense_bytes: int = 256 * 1024 * 1024,
        device: bool = True,
        max_band_bytes: int = 512 * 1024 * 1024,
    ) -> "Bm25Index":
        """Vectorized counterpart of ``from_term_weights``: explicit
        (item, term, weight) COO triples with unique (item, term) pairs.
        Produces the same layouts as ``_assemble`` (dense under the byte
        cap, else dense band over df >= n/64 terms + term-major CSC tail
        with item-ascending rows per term — the sorted-scatter contract)
        without the per-posting Python loop: the chargram arm carries
        ~1.5k grams per chunk, where dict assembly measured ~30 chunks/s
        against the 12k chunks/s indexing headline."""
        if weights.size == 0:
            raise ValueError("Text index is empty.")
        index = cls(vocab=vocab, idf=idf, n_items=n_items)
        item_ids = np.asarray(item_ids, dtype=np.int64)
        term_ids = np.asarray(term_ids, dtype=np.int64)
        weights = np.asarray(weights, dtype=np.float32)
        n, v = n_items, len(vocab)
        n_pad = _pad_to(max(n, 8), 8)
        v_pad = _pad_to(max(v, _LANE), _LANE)
        if n_pad * v_pad * 4 <= max_dense_bytes:
            w = np.zeros((n_pad, v_pad), dtype=np.float32)
            w[item_ids, term_ids] = weights
            index._weights_dev = jnp.asarray(w) if device else None
            index._weights_host = w
            return index

        df = np.bincount(term_ids, minlength=v)
        if device:
            k_cap = max(0, max_band_bytes // (n_pad * 4))
            heavy_mask = df >= max(n // 64, 64)
            heavy = np.nonzero(heavy_mask)[0]
            heavy = heavy[np.argsort(-df[heavy], kind="stable")][:k_cap]
        else:
            heavy = np.zeros(0, dtype=np.int64)
        band_col = np.full(v, -1, dtype=np.int64)
        if heavy.size:
            band_col[heavy] = np.arange(heavy.size)
            k_band = _pad_to(int(heavy.size), _LANE)
            w_band = np.zeros((n_pad, k_band), dtype=np.float32)
            in_band = band_col[term_ids] >= 0
            w_band[item_ids[in_band], band_col[term_ids[in_band]]] = (
                weights[in_band]
            )
            index._band_cols = {
                int(t): int(c) for c, t in enumerate(heavy)
            }
            index._band_dev = jnp.asarray(w_band)
            tail = ~in_band
            item_ids, term_ids, weights = (
                item_ids[tail],
                term_ids[tail],
                weights[tail],
            )
        # term-major CSC, item-ascending per term (the sorted-scatter
        # contract _query_vslices relies on)
        order = np.lexsort((item_ids, term_ids))
        rows_flat = item_ids[order].astype(np.int32)
        vals_flat = weights[order]
        tail_df = np.bincount(term_ids, minlength=v)
        term_ptr = np.zeros(v + 1, dtype=np.int64)
        np.cumsum(tail_df, out=term_ptr[1:])
        if device:
            index._postings = (
                term_ptr,
                jnp.asarray(np.pad(rows_flat, (0, _VSLICE))),
                jnp.asarray(np.pad(vals_flat, (0, _VSLICE))),
            )
        else:
            index._postings_host = (term_ptr, rows_flat, vals_flat)
        return index

    def _assemble(
        self,
        rows: list[dict[int, float]],
        weight_of,
        *,
        max_dense_bytes: int,
        device: bool,
        max_band_bytes: int,
    ) -> None:
        """Lay ``weight_of(item, term, rows[item][term])`` out as either
        a dense [n_pad, v_pad] matrix or band+CSC postings (the layout
        decision and device placement shared by ``build`` and
        ``from_term_weights``)."""
        n, v = self.n_items, len(self.vocab)
        n_pad = _pad_to(max(n, 8), 8)
        v_pad = _pad_to(max(v, _LANE), _LANE)
        if n_pad * v_pad * 4 <= max_dense_bytes:
            w = np.zeros((n_pad, v_pad), dtype=np.float32)
            for i, tf in enumerate(rows):
                for tid, f in tf.items():
                    w[i, tid] = weight_of(i, tid, f)
            self._weights_dev = jnp.asarray(w) if device else None
            self._weights_host = w
        else:
            # device CSC postings (term-major): rows/vals in HBM sorted by
            # term then item; term_ptr stays on host for slice lookup
            per_term_rows: list[list[int]] = [[] for _ in range(v)]
            per_term_vals: list[list[float]] = [[] for _ in range(v)]
            for i, tf in enumerate(rows):
                for tid, f in tf.items():
                    per_term_rows[tid].append(i)
                    per_term_vals[tid].append(weight_of(i, tid, f))
            # dense band: the highest-df terms are scatter-add poison on
            # TPU (one serialized update per posting; a ubiquitous term
            # can carry ~n postings). Terms with df >= n/64 move into a
            # dense [n_pad, K] column block scored by one MXU matvec
            # (bounded by max_band_bytes; measured 12x at 1M items over
            # scatter-only even at n/8); the CSC tail keeps short
            # postings where gather/scatter is cheap.
            if device:
                k_cap = max(0, max_band_bytes // (n_pad * 4))
                heavy = [
                    tid
                    for tid in range(v)
                    if len(per_term_rows[tid]) >= max(n // 64, 64)
                ]
                heavy.sort(key=lambda t: -len(per_term_rows[t]))
                heavy = heavy[:k_cap]
            else:
                heavy = []  # sharded wrapper re-shards raw postings
            if heavy:
                k_band = _pad_to(len(heavy), _LANE)
                w_band = np.zeros((n_pad, k_band), dtype=np.float32)
                for col, tid in enumerate(heavy):
                    w_band[per_term_rows[tid], col] = per_term_vals[tid]
                    per_term_rows[tid] = []
                    per_term_vals[tid] = []
                self._band_cols = {tid: c for c, tid in enumerate(heavy)}
                self._band_dev = jnp.asarray(w_band)
            term_ptr = np.zeros(v + 1, dtype=np.int64)
            for tid in range(v):
                term_ptr[tid + 1] = term_ptr[tid] + len(per_term_rows[tid])
            if term_ptr[-1]:
                rows_flat = np.concatenate(
                    [np.array(r, dtype=np.int32) for r in per_term_rows]
                )
                vals_flat = np.concatenate(
                    [np.array(x, dtype=np.float32) for x in per_term_vals]
                )
            else:
                # all terms went to the band
                rows_flat = np.zeros(0, dtype=np.int32)
                vals_flat = np.zeros(0, dtype=np.float32)
            if device:
                # zero-pad by a full virtual slice so dynamic_slice
                # loads never clamp (row 0 / weight 0.0 entries add
                # exactly nothing wherever they land)
                self._postings = (
                    term_ptr,
                    jnp.asarray(
                        np.pad(rows_flat, (0, _VSLICE))
                    ),
                    jnp.asarray(
                        np.pad(vals_flat, (0, _VSLICE))
                    ),
                )
            else:
                self._postings_host = (term_ptr, rows_flat, vals_flat)

    @staticmethod
    def _iter_term_weights(query_tokens):
        """Queries are either token lists (weight 1 per occurrence —
        rank-bm25 semantics) or term->weight mappings (weighted queries,
        e.g. RM3 pseudo-relevance feedback: every scoring path is linear
        in the query vector, so fractional weights rank exactly like
        fractional term counts)."""
        if isinstance(query_tokens, dict):
            return query_tokens.items()
        return ((t, 1.0) for t in query_tokens)

    def _query_vector(self, query_tokens, v_pad: int) -> np.ndarray:
        q = np.zeros(v_pad, dtype=np.float32)
        for t, w in self._iter_term_weights(query_tokens):
            tid = self.vocab.get(t)
            if tid is not None:
                q[tid] += w
        return q

    def _query_counts(self, query_tokens):
        """(tail term weights, band weight vector [K] or None)."""
        counts: dict[int, float] = {}
        for t, w in self._iter_term_weights(query_tokens):
            tid = self.vocab.get(t)
            if tid is not None:
                counts[tid] = counts.get(tid, 0.0) + w
        band_q = None
        if self._band_cols:
            band_q = np.zeros(
                self._band_dev.shape[1], dtype=np.float32
            )
            for tid in list(counts):
                col = self._band_cols.get(tid)
                if col is not None:
                    band_q[col] = counts.pop(tid)
        return counts, band_q

    def _iter_vslices(self, counts: dict[int, float]):
        """Raw (start, len, count) virtual slices of the query TAIL
        terms' posting ranges, term-ascending, split into fixed
        <=_VSLICE windows. Fixed-width slices keep the device read a
        dynamic-slice run, bound padding waste per term, and keep
        l_pad — hence the jit cache — constant."""
        term_ptr = self._postings[0]
        vslices: list[tuple[int, int, float]] = []
        for tid in sorted(counts):
            s = int(term_ptr[tid])
            e = int(term_ptr[tid + 1])
            c = counts[tid]
            while s < e:
                vslices.append((s, min(_VSLICE, e - s), c))
                s += _VSLICE
        return vslices

    def _query_vslices(self, counts: dict[int, float]):
        """(starts, lens, counts) arrays padded to a pow2 slice count
        (single-query path; the batch path flattens raw slices across
        queries instead — see _bm25_sparse_topk_flat_kernel)."""
        vslices = self._iter_vslices(counts)
        t_pad = _next_pow2(max(len(vslices), 1))
        starts = np.zeros(t_pad, dtype=np.int32)
        lens = np.zeros(t_pad, dtype=np.int32)
        cnt = np.zeros(t_pad, dtype=np.float32)
        for j, (s, ln, c) in enumerate(vslices):
            starts[j] = s
            lens[j] = ln
            cnt[j] = c
        return starts, lens, cnt

    def _sparse_total_scores(self, query_tokens):
        """Device [n_pad] scores in ONE dispatch: dense-band matvec +
        dynamic-slice scatter over the tail's virtual slices."""
        _, rows_dev, vals_dev = self._postings
        counts, band_q = self._query_counts(query_tokens)
        if not counts and (band_q is None or not band_q.any()):
            return jnp.zeros(self._n_pad, dtype=jnp.float32)
        starts, lens, cnt = self._query_vslices(counts)
        return _bm25_sparse_banded_scores_kernel(
            rows_dev,
            vals_dev,
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(cnt),
            self._band_dev,
            jnp.asarray(band_q) if band_q is not None else None,
            n_pad=self._n_pad,
            l_pad=_VSLICE,
        )

    @property
    def _n_pad(self) -> int:
        return _pad_to(max(self.n_items, 8), 8)

    def get_scores(self, query_tokens) -> np.ndarray:
        """``query_tokens``: token list or term->weight mapping."""
        if self._weights_dev is None and self._weights_host is not None:
            # host-only build (device=False): numpy matvec keeps the API
            # usable without re-uploading weights
            q = self._query_vector(query_tokens, self._weights_host.shape[1])
            return (self._weights_host @ q)[: self.n_items]
        if self._postings_host is not None:
            # host-only sparse build: numpy scatter-add (staging state
            # for the sharded wrapper; scores must still be queryable)
            term_ptr, rows_flat, vals_flat = self._postings_host
            scores = np.zeros(self.n_items, dtype=np.float32)
            counts: dict[int, float] = {}
            for t, w in self._iter_term_weights(query_tokens):
                tid = self.vocab.get(t)
                if tid is not None:
                    counts[tid] = counts.get(tid, 0.0) + w
            for tid, c in counts.items():
                seg = slice(term_ptr[tid], term_ptr[tid + 1])
                np.add.at(scores, rows_flat[seg], vals_flat[seg] * c)
            return scores
        if self._weights_dev is not None:
            q = self._query_vector(query_tokens, self._weights_dev.shape[1])
            scores = jnp.dot(
                self._weights_dev,
                jnp.asarray(q),
                preferred_element_type=jnp.float32,
                precision=_PRECISION,
            )
            return np.asarray(scores)[: self.n_items]
        return np.asarray(self._sparse_total_scores(query_tokens))[
            : self.n_items
        ]

    def top_n_batch(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[np.ndarray]:
        """top_n for many queries; the dense path scores them with ONE
        MXU matmul (the sparse path loops)."""
        return [idx for idx, _ in self.top_n_batch_with_scores(queries_tokens, n)]

    def top_n_batch_with_scores(
        self, queries_tokens: list[list[str]], n: int
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """``top_n_batch`` returning (indices, scores) per query —
        identical dispatch structure, the kernels already compute the
        score values the index-only API discards."""
        k = min(n, self.n_items)
        if not queries_tokens:
            return []
        if self._weights_dev is None and (
            self._weights_host is not None or self._postings_host is not None
        ):
            return [
                self.top_n_with_scores(q, n) for q in queries_tokens
            ]
        if self._weights_dev is not None:
            v_pad = self._weights_dev.shape[1]
            qmat = np.stack(
                [self._query_vector(q, v_pad) for q in queries_tokens],
                axis=1,
            )  # [V, Q]
            q = len(queries_tokens)
            q_pad = 1 << max(2, (q - 1).bit_length())
            if q_pad != q:
                qmat = np.pad(qmat, ((0, 0), (0, q_pad - q)))
            vals, idx = _bm25_topk_batch_kernel(
                self._weights_dev,
                jnp.asarray(qmat),
                jnp.int32(self.n_items),
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
            idx = np.asarray(idx)
            vals = np.asarray(vals)
            return [(idx[i], vals[i]) for i in range(q)]
        # device CSC postings, one dispatch, two batched shapes:
        # - SKEWED slice counts (one query near the band threshold
        #   inflating the batch max): FLATTENED table — scatter work
        #   tracks the queries' actual postings (measured 150 -> 22 ms
        #   per query at 10M items, realistic vocabulary);
        # - UNIFORM slice counts: per-query [Q, T] tables scanned
        #   vmapped — each step scatters all Q queries at once,
        #   amortizing per-step overhead (measured 1.5 vs the flat
        #   kernel's 25 ms at 1M items, dense-vocab stress profile).
        # Choose by padded-vs-actual slice ratio. Band terms ride one
        # extra MXU matmul either way; scores are bit-identical (each
        # query's slices keep the same term-ascending order).
        q = len(queries_tokens)
        q_pad = _next_pow2(q)
        stride = self._n_pad + 8
        band_mat = None
        per_query: list[list[tuple[int, int, float]]] = []
        for qi, toks in enumerate(queries_tokens):
            counts, band_q = self._query_counts(toks)
            if band_q is not None:
                if band_mat is None:
                    band_mat = np.zeros(
                        (q_pad, self._band_dev.shape[1]),
                        dtype=np.float32,
                    )
                band_mat[qi] = band_q
            per_query.append(self._iter_vslices(counts))
        s_total = sum(len(sl) for sl in per_query)
        t_max = max((len(sl) for sl in per_query), default=1)
        t_pad = _next_pow2(t_max)
        # Empirically measured per-entry scatter-cost ratio between the
        # two shapes on a v5e (same total entries both ways when counts
        # are uniform): at 1M items the wide vmapped scatter runs ~20
        # ns/entry vs ~340 for 1-wide flat steps (accumulator rows fit
        # cache; amortization wins -> uniform at 1.5 vs 25 ms/query);
        # at 10M rows the 40 MB accumulator rows kill the wide
        # scatter's locality (136 ns/entry) and the flat steps win
        # outright (57 ns: 22 vs 150 ms realistic, 249 vs 586 stress).
        per_entry_ratio = 16.0 if self._n_pad <= 4_000_000 else 0.5
        use_flat = s_total * per_entry_ratio < q_pad * t_max
        if use_flat:
            s_pad = _next_pow2(max(s_total, 1))
            starts = np.zeros(s_pad, dtype=np.int32)
            lens = np.zeros(s_pad, dtype=np.int32)
            cnts = np.zeros(s_pad, dtype=np.float32)
            qoff = np.zeros(s_pad, dtype=np.int32)
            j = 0
            for qi, sl in enumerate(per_query):
                base = qi * stride
                for s, ln, c in sl:
                    starts[j], lens[j], cnts[j], qoff[j] = s, ln, c, base
                    j += 1
            vals, idx = _bm25_sparse_topk_flat_kernel(
                self._postings[1],
                self._postings[2],
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(cnts),
                jnp.asarray(qoff),
                jnp.int32(self.n_items),
                self._band_dev,
                jnp.asarray(band_mat) if band_mat is not None else None,
                n_pad=self._n_pad,
                l_pad=_VSLICE,
                q_pad=q_pad,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        else:
            starts = np.zeros((q_pad, t_pad), dtype=np.int32)
            lens = np.zeros((q_pad, t_pad), dtype=np.int32)
            cnts = np.zeros((q_pad, t_pad), dtype=np.float32)
            for qi, sl in enumerate(per_query):
                for j, (s, ln, c) in enumerate(sl):
                    starts[qi, j] = s
                    lens[qi, j] = ln
                    cnts[qi, j] = c
            vals, idx = _bm25_sparse_topk_batch_kernel(
                self._postings[1],
                self._postings[2],
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(cnts),
                jnp.int32(self.n_items),
                self._band_dev,
                jnp.asarray(band_mat) if band_mat is not None else None,
                n_pad=self._n_pad,
                l_pad=_VSLICE,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        idx = np.asarray(idx)
        vals = np.asarray(vals)
        return [(idx[i], vals[i]) for i in range(q)]

    def top_n(self, query_tokens, n: int) -> np.ndarray:
        """Reference-exact top-n item indices (later index wins ties).

        ``query_tokens``: token list or term->weight mapping (weighted
        queries rank by the same linear score)."""
        return self.top_n_with_scores(query_tokens, n)[0]

    def warm_query_buckets(self, k: int, max_q: int = 64) -> None:
        """Compile-ahead of the single + batched scoring kernels for
        every wave bucket concurrent serving can produce (see
        DenseIndex.warm_query_buckets for the rationale). ``k`` is the
        serving top-n (the kernels specialize on it)."""
        if self.n_items == 0 or self._weights_dev is None and (
            self._weights_host is not None
            or self._postings_host is not None
        ):
            return  # host-only layout: nothing compiles
        term = next(iter(self.vocab), None)
        probe = [term] if term is not None else []
        self.top_n_with_scores(probe, k)
        q = 2  # batch path's smallest bucket is q_pad=4
        while q <= max_q:
            self.top_n_batch_with_scores([probe] * q, k)
            q *= 2

    async def atop_n_with_scores(
        self, query_tokens, n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """``top_n_with_scores`` with cross-request coalescing:
        concurrent callers' queries share one batched device dispatch +
        one host sync per wave (see DenseIndex.afind for the latency
        math — behind a high-latency link the per-request sync, not
        device time, bounds serving QPS). Ranking identical to the
        single-query path (a larger-k top list trims to a smaller k's
        prefix exactly)."""
        return await self._scan_batcher.submit((query_tokens, n))

    @property
    def _scan_batcher(self):
        batcher = self.__dict__.get("_scan_batcher_cached")
        if batcher is None:
            from dial_rag_tpu.runtime.micro_batcher import (
                MicroBatcher,
                PerLoopBatcher,
            )

            async def scan_all(items: list) -> list:
                import asyncio

                return await asyncio.get_running_loop().run_in_executor(
                    None, self._scan_wave, items
                )

            batcher = PerLoopBatcher(
                lambda: MicroBatcher(scan_all, max_batch=64)
            )
            self.__dict__["_scan_batcher_cached"] = batcher
        return batcher

    def _scan_wave(self, items: list) -> list:
        if len(items) == 1:
            toks, n = items[0]
            return [self.top_n_with_scores(toks, n)]
        n_max = max(n for _, n in items)
        outs = self.top_n_batch_with_scores(
            [toks for toks, _ in items], n_max
        )
        return [
            (idx[: min(n, len(idx))], vals[: min(n, len(vals))])
            for (idx, vals), (_, n) in zip(outs, items)
        ]

    def top_n_with_scores(
        self, query_tokens, n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(indices, scores): the reference-exact top-n plus each item's
        Okapi score (score-aware ensemble fusion consumes the scores;
        ranking is identical to ``top_n``)."""
        k = min(n, self.n_items)
        if self._weights_dev is None and (
            self._weights_host is not None or self._postings_host is not None
        ):
            scores = self.get_scores(query_tokens)
            idx = np.argsort(scores, kind="stable")[::-1][:k]
            return idx, scores[idx]
        if self._weights_dev is not None:
            q = self._query_vector(query_tokens, self._weights_dev.shape[1])
            vals, idx = _bm25_topk_kernel(
                self._weights_dev,
                jnp.asarray(q),
                jnp.int32(self.n_items),
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
            return np.asarray(idx), np.asarray(vals)
        scores = self._sparse_total_scores(query_tokens)
        vals, idx = _bm25_topk_from_scores_kernel(
            scores,
            jnp.int32(self.n_items),
            k=k,
            use_sort=k > _ARGMIN_MAX_K,
        )
        return np.asarray(idx), np.asarray(vals)
