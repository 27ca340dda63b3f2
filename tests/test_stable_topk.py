"""Stable top-k: exact parity with np.argsort(kind="stable")[:k]."""

import numpy as np
import pytest

from dial_rag_tpu.ops.stable_topk import (
    stable_topk,
    stable_topk_argmin,
    stable_topk_sort,
)

IMPLS = [stable_topk_argmin, stable_topk_sort, stable_topk]


@pytest.mark.parametrize("impl", IMPLS)
def test_ties_keep_first_index(impl):
    vals = np.array([3.0, 1.0, 1.0, 2.0, 1.0], dtype=np.float32)
    _, idx = impl(vals, 4)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 4, 3])


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("k", [1, 3, 7, 50])
def test_random_parity_with_stable_argsort(impl, k):
    rng = np.random.default_rng(42)
    # quantized values force many ties
    vals = rng.integers(0, 10, size=500).astype(np.float32)
    expected = np.argsort(vals, kind="stable")[:k]
    got_vals, got_idx = impl(vals, k)
    np.testing.assert_array_equal(np.asarray(got_idx), expected)
    np.testing.assert_array_equal(np.asarray(got_vals), vals[expected])


@pytest.mark.parametrize("impl", IMPLS)
def test_k_larger_than_n(impl):
    vals = np.array([2.0, 1.0], dtype=np.float32)
    got_vals, got_idx = impl(vals, 5)
    np.testing.assert_array_equal(np.asarray(got_idx), [1, 0])
    np.testing.assert_array_equal(np.asarray(got_vals), [1.0, 2.0])


@pytest.mark.parametrize("impl", IMPLS)
def test_nan_sorts_last(impl):
    vals = np.array([np.nan, 1.0, 0.5, np.nan, 2.0], dtype=np.float32)
    _, idx = impl(vals, 5)
    np.testing.assert_array_equal(np.asarray(idx), [2, 1, 4, 0, 3])


def test_empty_input_returns_empty():
    import jax.numpy as jnp

    from dial_rag_tpu.ops.stable_topk import stable_topk

    vals, idx = stable_topk(jnp.zeros((0,), dtype=jnp.float32), 5)
    assert vals.shape == (0,) and idx.shape == (0,)
