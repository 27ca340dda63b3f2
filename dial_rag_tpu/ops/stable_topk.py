"""Stable ascending top-k on device.

The reference requires *stable* ordering for equal scores — it deliberately
uses ``np.argsort(kind="stable")`` instead of argpartition
(aidial_rag/retrievers/embeddings_index.py:57-58), and retrieval goldens
depend on it (earlier rows win ties). ``jax.lax.top_k`` does not guarantee
tie order, so we provide two exact implementations:

- ``stable_topk_argmin``: k successive ``argmin`` passes. ``jnp.argmin``
  returns the *first* occurrence of the minimum, which is exactly the
  stable tie-break. O(k·N) streaming reads — bandwidth-bound, ideal on TPU
  for the small k (≤7) used by the retrievers. NaNs are mapped to +inf
  first (numpy's stable argsort also sorts NaNs last; the only divergence
  is the relative order of NaN vs +inf entries, which the reference never
  produces in practice).
- ``stable_topk_sort``: a full ``lax.sort`` with ``is_stable=True`` over
  (value, index) — O(N log N), used for large k.

Both are jittable with static ``k`` and return ``(values, indices)``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Above this k the full sort beats k argmin passes.
_ARGMIN_MAX_K = 32


def _sanitize(values: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.isnan(values), jnp.inf, values)


# Sentinel strictly greater than the key of any sanitized float (the max
# sanitized key is +inf -> 0xFF800000), so taken entries never win argmin.
# A host (numpy) scalar on purpose: a jnp constant here would eagerly
# initialize the JAX backend at import time, pinning whichever platform
# is ambient before callers can configure one.
_TAKEN = np.uint32(0xFFFFFFFF)


def _sortable_key(values: jnp.ndarray) -> jnp.ndarray:
    """Monotone f32 -> uint32 map: ascending key order == ascending float."""
    u = jax.lax.bitcast_convert_type(values, jnp.uint32)
    flip = jnp.where(
        (u >> 31) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000)
    )
    return u ^ flip


@partial(jax.jit, static_argnames=("k",))
def stable_topk_argmin(values: jnp.ndarray, k: int):
    """k smallest of a 1-D array, first-index tie-break. Returns (vals, idx).

    Runs k argmin sweeps over a uint32 order-isomorphic key so that taken
    entries (including real +inf distances) can be masked with a strictly
    greater sentinel. jnp.argmin returns the first occurrence — the stable
    tie-break.
    """
    n = values.shape[0]
    keys = _sortable_key(_sanitize(values.astype(jnp.float32)))

    def body(keys, _):
        i = jnp.argmin(keys).astype(jnp.int32)
        keys = keys.at[i].set(_TAKEN)
        return keys, i

    _, top_idx = jax.lax.scan(body, keys, None, length=min(k, n))
    return _sanitize(values)[top_idx], top_idx


@partial(jax.jit, static_argnames=("k",))
def stable_topk_sort(values: jnp.ndarray, k: int):
    n = values.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    sorted_vals, sorted_idx = jax.lax.sort(
        (_sanitize(values), idx), num_keys=1, is_stable=True
    )
    k = min(k, n)
    return sorted_vals[:k], sorted_idx[:k]


def stable_topk(values: jnp.ndarray, k: int):
    """Dispatch between the argmin-scan and full-sort implementations."""
    if values.shape[0] == 0:
        # argmin over a size-0 array fails at trace time; match the sort
        # path's empty result instead
        return values[:0], jnp.zeros((0,), dtype=jnp.int32)
    if k <= _ARGMIN_MAX_K:
        return stable_topk_argmin(values, k)
    return stable_topk_sort(values, k)
