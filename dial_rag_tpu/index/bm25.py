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


def _sparse_scores(rows_dev, vals_dev, starts, lens, counts, *, n_pad, l_pad):
    """Gather the query terms' posting slices from the HBM-resident CSC
    arrays and scatter-add into item scores. Masked (padding) entries
    route to the extra slot n_pad; per-query host->device traffic is just
    the [t_pad] starts/lens/counts vectors."""
    t_pad = starts.shape[0]
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, l_pad), 1)
    idx = starts[:, None] + l_iota
    valid = l_iota < lens[:, None]
    idx = jnp.clip(idx, 0, rows_dev.shape[0] - 1)
    g_rows = jnp.where(valid, rows_dev[idx], n_pad)
    g_vals = jnp.where(valid, vals_dev[idx] * counts[:, None], 0.0)
    scores = jnp.zeros(n_pad + 1, dtype=jnp.float32)
    scores = scores.at[g_rows.reshape(-1)].add(g_vals.reshape(-1))
    return scores[:n_pad]


@partial(jax.jit, static_argnames=("n_pad", "l_pad"))
def _bm25_sparse_scores_kernel(
    rows_dev, vals_dev, starts, lens, counts, *, n_pad: int, l_pad: int
):
    return _sparse_scores(
        rows_dev, vals_dev, starts, lens, counts, n_pad=n_pad, l_pad=l_pad
    )


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
    """Q sparse-CSC queries scored and ranked in ONE dispatch: vmapped
    gather/scatter-add over the shared postings arrays, then the
    reference-exact flipped-layout top-k per query. Mirrors the sharded
    index's batched path on a single chip (the bucketed per-query path
    costs one dispatch per posting-length bucket)."""
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


@partial(jax.jit, static_argnames=("n_pad", "l_pad", "k", "use_sort"))
def _bm25_candidate_topk_batch_kernel(
    rows_dev,
    vals_dev,
    starts,  # [Q, T]
    lens,  # [Q, T]
    counts,  # [Q, T]
    n_valid,
    band_w,  # [n_pad, K]
    band_q,  # [Q, K]
    *,
    n_pad: int,
    l_pad: int,
    k: int,
    use_sort: bool,
):
    """Exact banded-sparse top-k WITHOUT the [N]-size scatter-add.

    TPU scatter serializes ~per posting (~2.6 ms/query at 1M items under
    the Zipf stress corpus). But BM25 term weights are strictly positive
    (the idf epsilon floor keeps even common terms > 0), so adding tail
    postings can only RAISE a row's band score — which pins the exact
    top-k inside a small candidate set:

        true top-k  ⊆  (band-only top-k)  ∪  (rows touched by the tail)

    (an untouched row outranked by k rows on band scores is still
    outranked when nonnegative tail mass is added). So instead of
    scattering P = T*L postings into [N] and ranking N rows, rank the
    P + k candidates directly:

    - band-only [Q, k] via the usual flipped-stable dense kernel;
    - per-posting totals via per-term binary search over the gathered
      (sorted) posting slices — duplicates across terms sum exactly,
      and only the FIRST representation of a row stays canonical;
    - appended band candidates reuse the same scan: their first-hit
      term == T means untouched (keep: total is the band score), < T
      means touched (drop: already represented with the full total);
    - final (score desc, row desc) rank via a 2-key lax.sort — the
      reference's later-index-wins tie-break without relying on array
      position.

    Requires a band (callers fall back to the scatter kernel when no
    band was built — without a dense [N] vector there is no exact
    band-only top-k to seed the candidates).
    """
    q_n, t_pad = starts.shape
    # band-only scores + flipped-stable top-k (same semantics as
    # _bm25_topk_batch_kernel)
    bscores = jnp.dot(
        band_w,
        band_q.T,
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )  # [n_pad, Q]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    masked = jnp.where(row[:, None] < n_valid, bscores, -jnp.inf)
    flipped = jnp.flip(-masked, axis=0)
    topk = stable_topk_sort if use_sort else stable_topk_argmin
    _, a_idx = jax.vmap(lambda col: topk(col, k))(flipped.T)
    a_idx = (n_pad - 1) - a_idx  # [Q, k] band-only top-k rows

    p = t_pad * l_pad

    def one(st, ln, cn, bcol, a_i):
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, l_pad), 1)
        idx = st[:, None] + l_iota
        valid = l_iota < ln[:, None]
        idx = jnp.clip(idx, 0, rows_dev.shape[0] - 1)
        g_rows = jnp.where(valid, rows_dev[idx], n_pad)  # sorted per term
        g_vals = jnp.where(valid, vals_dev[idx] * cn[:, None], 0.0)
        cand_rows = jnp.concatenate([g_rows.reshape(-1), a_i])  # [P+k]
        own_t = jnp.concatenate(
            [
                jax.lax.broadcasted_iota(
                    jnp.int32, (t_pad, l_pad), 0
                ).reshape(-1),
                jnp.full((k,), t_pad, jnp.int32),
            ]
        )

        def per_term(carry, term):
            tot, first = carry
            t_idx, r_t, v_t = term
            pos = jnp.clip(
                jnp.searchsorted(r_t, cand_rows), 0, l_pad - 1
            )
            hit = (r_t[pos] == cand_rows) & (cand_rows < n_pad)
            tot = tot + jnp.where(hit, v_t[pos], 0.0)
            first = jnp.minimum(
                first, jnp.where(hit, t_idx, t_pad)
            )
            return (tot, first), None

        (tot, first), _ = jax.lax.scan(
            per_term,
            (
                jnp.zeros(p + k, jnp.float32),
                jnp.full((p + k,), t_pad, jnp.int32),
            ),
            (jnp.arange(t_pad, dtype=jnp.int32), g_rows, g_vals),
        )
        canonical = (first == own_t) & (cand_rows < n_valid)
        scores = tot + bcol[jnp.clip(cand_rows, 0, n_pad - 1)]
        scores = jnp.where(canonical, scores, -jnp.inf)
        s_neg, _, s_rows = jax.lax.sort(
            (-scores, -cand_rows, cand_rows), num_keys=2
        )
        return -s_neg[:k], s_rows[:k]

    return jax.vmap(one)(starts, lens, counts, bscores.T, a_idx)


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

        n_pad = _pad_to(max(n, 8), 8)
        v_pad = _pad_to(max(v, _LANE), _LANE)
        if n_pad * v_pad * 4 <= max_dense_bytes:
            w = np.zeros((n_pad, v_pad), dtype=np.float32)
            for i, tf in enumerate(rows):
                for tid, f in tf.items():
                    w[i, tid] = idf[tid] * f * (K1 + 1.0) / (f + denom_norm[i])
            index._weights_dev = jnp.asarray(w) if device else None
            index._weights_host = w
        else:
            # device CSC postings (term-major): rows/vals in HBM sorted by
            # term then item; term_ptr stays on host for slice lookup
            per_term_rows: list[list[int]] = [[] for _ in range(v)]
            per_term_vals: list[list[float]] = [[] for _ in range(v)]
            for i, tf in enumerate(rows):
                for tid, f in tf.items():
                    per_term_rows[tid].append(i)
                    per_term_vals[tid].append(
                        idf[tid] * f * (K1 + 1.0) / (f + denom_norm[i])
                    )
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
                index._band_cols = {tid: c for c, tid in enumerate(heavy)}
                index._band_dev = jnp.asarray(w_band)
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
                # all terms went to the band; keep 1 dummy posting so
                # the gather's index clip stays well-defined
                rows_flat = np.zeros(1, dtype=np.int32)
                vals_flat = np.zeros(1, dtype=np.float32)
            if device:
                index._postings = (
                    term_ptr,
                    jnp.asarray(rows_flat),
                    jnp.asarray(vals_flat),
                )
            else:
                index._postings_host = (term_ptr, rows_flat, vals_flat)
        return index

    def _query_vector(self, query_tokens: list[str], v_pad: int) -> np.ndarray:
        q = np.zeros(v_pad, dtype=np.float32)
        for t in query_tokens:
            tid = self.vocab.get(t)
            if tid is not None:
                q[tid] += 1.0
        return q

    def _query_counts(self, query_tokens: list[str]):
        """(tail term counts, band count vector [K] or None)."""
        counts: dict[int, int] = {}
        for t in query_tokens:
            tid = self.vocab.get(t)
            if tid is not None:
                counts[tid] = counts.get(tid, 0) + 1
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

    def _query_term_groups(self, counts: dict[int, int]):
        """Unique in-vocab TAIL terms grouped by posting-length bucket,
        so one long-posting term cannot inflate the padded work of
        every other term. Yields (starts, lens, counts, l_pad) per
        bucket; each group's arrays are padded to a pow2 term count."""
        term_ptr = self._postings[0]
        by_bucket: dict[int, list[int]] = {}
        for tid in sorted(counts):
            length = int(term_ptr[tid + 1] - term_ptr[tid])
            by_bucket.setdefault(_next_pow2(max(length, 1)), []).append(tid)
        groups = []
        for l_pad in sorted(by_bucket):
            tids = by_bucket[l_pad]
            t_pad = _next_pow2(len(tids))
            starts = np.zeros(t_pad, dtype=np.int32)
            lens = np.zeros(t_pad, dtype=np.int32)
            cnt = np.zeros(t_pad, dtype=np.float32)
            for j, tid in enumerate(tids):
                starts[j] = term_ptr[tid]
                lens[j] = term_ptr[tid + 1] - term_ptr[tid]
                cnt[j] = counts[tid]
            groups.append((starts, lens, cnt, l_pad))
        return groups

    def _sparse_total_scores(self, query_tokens: list[str]):
        """Device [n_pad] scores: dense-band matvec + scatter-add over
        the tail term-length groups."""
        _, rows_dev, vals_dev = self._postings
        counts, band_q = self._query_counts(query_tokens)
        total = None
        if band_q is not None and band_q.any():
            total = jnp.dot(
                self._band_dev,
                jnp.asarray(band_q),
                preferred_element_type=jnp.float32,
                precision=_PRECISION,
            )
        for starts, lens, cnt, l_pad in self._query_term_groups(counts):
            scores = _bm25_sparse_scores_kernel(
                rows_dev,
                vals_dev,
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(cnt),
                n_pad=self._n_pad,
                l_pad=l_pad,
            )
            total = scores if total is None else total + scores
        if total is None:
            total = jnp.zeros(self._n_pad, dtype=jnp.float32)
        return total

    @property
    def _n_pad(self) -> int:
        return _pad_to(max(self.n_items, 8), 8)

    def get_scores(self, query_tokens: list[str]) -> np.ndarray:
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
            counts: dict[int, int] = {}
            for t in query_tokens:
                tid = self.vocab.get(t)
                if tid is not None:
                    counts[tid] = counts.get(tid, 0) + 1
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
        k = min(n, self.n_items)
        if not queries_tokens:
            return []
        if self._weights_dev is None and (
            self._weights_host is not None or self._postings_host is not None
        ):
            return [self.top_n(q, n) for q in queries_tokens]
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
            _, idx = _bm25_topk_batch_kernel(
                self._weights_dev,
                jnp.asarray(qmat),
                jnp.int32(self.n_items),
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
            idx = np.asarray(idx)
            return [idx[i] for i in range(q)]
        # device CSC postings: all queries in one vmapped dispatch with
        # common (T, L) padding over the TAIL terms (the per-query path
        # pays one dispatch per posting-length bucket); band terms ride
        # one extra MXU matmul
        term_ptr = self._postings[0]
        per_query = []
        band_mat = None
        for qi, toks in enumerate(queries_tokens):
            counts, band_q = self._query_counts(toks)
            if band_q is not None:
                if band_mat is None:
                    band_mat = np.zeros(
                        (
                            _next_pow2(len(queries_tokens)),
                            self._band_dev.shape[1],
                        ),
                        dtype=np.float32,
                    )
                band_mat[qi] = band_q
            per_query.append(sorted(counts.items()))
        t_pad = _next_pow2(max((len(pq) for pq in per_query), default=1))
        l_max = 1
        for pq in per_query:
            for tid, _ in pq:
                l_max = max(l_max, int(term_ptr[tid + 1] - term_ptr[tid]))
        l_pad = _next_pow2(l_max)
        q = len(queries_tokens)
        q_pad = _next_pow2(q)
        starts = np.zeros((q_pad, t_pad), dtype=np.int32)
        lens = np.zeros((q_pad, t_pad), dtype=np.int32)
        cnts = np.zeros((q_pad, t_pad), dtype=np.float32)
        for qi, pq in enumerate(per_query):
            for j, (tid, c) in enumerate(pq):
                starts[qi, j] = term_ptr[tid]
                lens[qi, j] = term_ptr[tid + 1] - term_ptr[tid]
                cnts[qi, j] = c
        if self._band_dev is not None:
            # candidate-set ranking: the strictly-positive tail weights
            # pin the exact top-k inside (band-only top-k) ∪ (touched
            # rows), so no [N]-size scatter is dispatched at all
            if band_mat is None:
                band_mat = np.zeros(
                    (q_pad, self._band_dev.shape[1]), dtype=np.float32
                )
            _, idx = _bm25_candidate_topk_batch_kernel(
                self._postings[1],
                self._postings[2],
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(cnts),
                jnp.int32(self.n_items),
                self._band_dev,
                jnp.asarray(band_mat),
                n_pad=self._n_pad,
                l_pad=l_pad,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        else:
            _, idx = _bm25_sparse_topk_batch_kernel(
                self._postings[1],
                self._postings[2],
                jnp.asarray(starts),
                jnp.asarray(lens),
                jnp.asarray(cnts),
                jnp.int32(self.n_items),
                None,
                None,
                n_pad=self._n_pad,
                l_pad=l_pad,
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
        idx = np.asarray(idx)
        return [idx[i] for i in range(q)]

    def top_n(self, query_tokens: list[str], n: int) -> np.ndarray:
        """Reference-exact top-n item indices (later index wins ties)."""
        k = min(n, self.n_items)
        if self._weights_dev is None and (
            self._weights_host is not None or self._postings_host is not None
        ):
            scores = self.get_scores(query_tokens)
            return np.argsort(scores, kind="stable")[::-1][:k]
        if self._weights_dev is not None:
            q = self._query_vector(query_tokens, self._weights_dev.shape[1])
            _, idx = _bm25_topk_kernel(
                self._weights_dev,
                jnp.asarray(q),
                jnp.int32(self.n_items),
                k=k,
                use_sort=k > _ARGMIN_MAX_K,
            )
            return np.asarray(idx)
        scores = self._sparse_total_scores(query_tokens)
        _, idx = _bm25_topk_from_scores_kernel(
            scores,
            jnp.int32(self.n_items),
            k=k,
            use_sort=k > _ARGMIN_MAX_K,
        )
        return np.asarray(idx)
