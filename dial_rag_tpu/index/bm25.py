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

Dense [N, V] weights are used up to ``max_dense_bytes``; above that a host
CSR matvec fallback keeps exactness (a Pallas postings kernel is the
planned device-sparse path).
"""

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dial_rag_tpu.ops.stable_topk import stable_topk_argmin

K1 = 1.5
B = 0.75
EPSILON = 0.25

_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(jax.jit, static_argnames=("k",))
def _bm25_topk_kernel(weights, query_vec, n_valid, *, k: int):
    scores = jnp.dot(weights, query_vec, preferred_element_type=jnp.float32)
    n_pad = scores.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0).reshape(-1)
    # padding rows must lose to every real row: scores desc -> use -inf...
    # but the reference tie-break makes LATER real rows win ties, so flip
    # the array, take stable ascending top-k of the negated scores, and map
    # indices back.
    scores = jnp.where(row < n_valid, scores, -jnp.inf)
    flipped = jnp.flip(-scores)
    vals, idx = stable_topk_argmin(flipped, k)
    return -vals, (n_pad - 1) - idx


@dataclass
class Bm25Index:
    """Device-resident BM25 index over flattened items."""

    vocab: dict[str, int]
    idf: np.ndarray  # [V] f64
    n_items: int
    _weights_dev: jnp.ndarray | None = field(default=None, repr=False)
    _weights_csr: tuple | None = field(default=None, repr=False)  # host fallback

    @property
    def nbytes(self) -> int:
        if self._weights_dev is not None:
            return self._weights_dev.size * 4
        if self._weights_csr is not None:
            indptr, cols, vals = self._weights_csr
            return indptr.nbytes + cols.nbytes + vals.nbytes
        return 0

    @classmethod
    def build(
        cls,
        tokenized_items: list[list[str]],
        max_dense_bytes: int = 256 * 1024 * 1024,
    ) -> "Bm25Index":
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
            index._weights_dev = jnp.asarray(w)
        else:
            # host CSR fallback (item-major)
            indptr = np.zeros(n + 1, dtype=np.int64)
            cols, vals = [], []
            for i, tf in enumerate(rows):
                for tid, f in sorted(tf.items()):
                    cols.append(tid)
                    vals.append(idf[tid] * f * (K1 + 1.0) / (f + denom_norm[i]))
                indptr[i + 1] = len(cols)
            index._weights_csr = (
                indptr,
                np.array(cols, dtype=np.int64),
                np.array(vals, dtype=np.float64),
            )
        return index

    def _query_vector(self, query_tokens: list[str], v_pad: int) -> np.ndarray:
        q = np.zeros(v_pad, dtype=np.float32)
        for t in query_tokens:
            tid = self.vocab.get(t)
            if tid is not None:
                q[tid] += 1.0
        return q

    def get_scores(self, query_tokens: list[str]) -> np.ndarray:
        if self._weights_dev is not None:
            q = self._query_vector(query_tokens, self._weights_dev.shape[1])
            scores = jnp.dot(
                self._weights_dev,
                jnp.asarray(q),
                preferred_element_type=jnp.float32,
            )
            return np.asarray(scores)[: self.n_items]
        indptr, cols, vals = self._weights_csr
        q = self._query_vector(query_tokens, len(self.vocab)).astype(np.float64)
        scores = np.zeros(self.n_items, dtype=np.float64)
        for i in range(self.n_items):
            s, e = indptr[i], indptr[i + 1]
            scores[i] = vals[s:e] @ q[cols[s:e]]
        return scores.astype(np.float32)

    def top_n(self, query_tokens: list[str], n: int) -> np.ndarray:
        """Reference-exact top-n item indices (later index wins ties)."""
        k = min(n, self.n_items)
        if self._weights_dev is not None:
            q = self._query_vector(query_tokens, self._weights_dev.shape[1])
            _, idx = _bm25_topk_kernel(
                self._weights_dev,
                jnp.asarray(q),
                jnp.int32(self.n_items),
                k=k,
            )
            return np.asarray(idx)
        scores = self.get_scores(query_tokens)
        return np.argsort(scores, kind="stable")[::-1][:k]
