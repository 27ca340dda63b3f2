"""Numeric parity for distance metrics.

Cases mirror the reference's tests/test_embeddings_metrics.py (zero-vector
cosine guard, non-normalized inputs, sqeuclidean expansion, equivalences).
"""

import numpy as np
import pytest

from dial_rag_tpu.ops.metrics import Metric, pairwise_distances


def run(metric, query, docs):
    return np.asarray(
        pairwise_distances(
            np.asarray(query, dtype=np.float32),
            np.asarray(docs, dtype=np.float32),
            metric,
        )
    )


def test_cosine_similarity():
    f = lambda q, d: run(Metric.COSINE_SIM, q, d)
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [-1.0, 0.0], atol=1e-7
    )
    np.testing.assert_allclose(
        f([-1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [1.0, 0.0], atol=1e-7
    )
    # non-normalized query
    np.testing.assert_allclose(
        f([2, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [-1.0, 0.0], atol=1e-7
    )
    # zero vectors are orthogonal to everything; no div-by-zero
    np.testing.assert_allclose(
        f([0, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0]]),
        [0.0, 0.0, 0.0],
        atol=1e-7,
    )
    # non-normalized docs
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[2, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0]]),
        [-1.0, 0.0, 0.0],
        atol=1e-7,
    )


def test_inner_product():
    f = lambda q, d: run(Metric.INNER_PRODUCT, q, d)
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [-1.0, 0.0]
    )
    np.testing.assert_allclose(
        f([-1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [1.0, 0.0]
    )
    np.testing.assert_allclose(
        f([2, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [-2.0, 0.0]
    )
    np.testing.assert_allclose(
        f([0, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0]]),
        [0.0, 0.0, 0.0],
    )
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[2, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0]]),
        [-2.0, 0.0, 0.0],
    )


def _normalize(x):
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return np.where(n > 0, x / np.where(n == 0, 1, n), 0.0)


def test_cosine_to_inner_equivalence():
    query = _normalize(np.array([1.0, 2, 3, 4]))
    docs = _normalize(
        np.array(
            [[1.0, 0, 0, 0], [0, 1, 0, 0], [2, 0, 0, 0], [3, 3, 3, 0], [0, 0, 0, 0]]
        )
    )
    np.testing.assert_allclose(
        run(Metric.COSINE_SIM, query, docs),
        run(Metric.INNER_PRODUCT, query, docs),
        atol=1e-6,
    )


def test_euclidean_distance():
    f = lambda q, d: run(Metric.EUCLIDEAN_DIST, q, d)
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [0.0, np.sqrt(2)], atol=1e-6
    )
    np.testing.assert_allclose(
        f([-1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [2.0, np.sqrt(2)], atol=1e-6
    )
    np.testing.assert_allclose(
        f([2, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [1.0, np.sqrt(5)], atol=1e-6
    )
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[2, 0, 0, 0], [3, 3, 3, 0], [0, 0, 0, 0]]),
        [1.0, np.sqrt(22), 1.0],
        atol=1e-6,
    )


def test_squared_euclidean_distance():
    f = lambda q, d: run(Metric.SQEUCLIDEAN_DIST, q, d)
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [0.0, 2.0], atol=1e-6
    )
    np.testing.assert_allclose(
        f([-1, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [4.0, 2.0], atol=1e-6
    )
    np.testing.assert_allclose(
        f([2, 0, 0, 0], [[1, 0, 0, 0], [0, 1, 0, 0]]), [1.0, 5.0], atol=1e-6
    )
    np.testing.assert_allclose(
        f([1, 0, 0, 0], [[2, 0, 0, 0], [3, 3, 3, 0], [0, 0, 0, 0]]),
        [1.0, 22.0, 1.0],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        f([0, 0, 0, 0], [[1, 1, 1, 1], [2, 2, 2, 2]]), [4.0, 16.0], atol=1e-6
    )


def test_euclidean_equivalence():
    query = np.array([1.0, 2, 3, 4])
    docs = np.array(
        [[1.0, 0, 0, 0], [0, 1, 0, 0], [2, 0, 0, 0], [3, 3, 3, 0], [0, 0, 0, 0]]
    )
    np.testing.assert_allclose(
        run(Metric.EUCLIDEAN_DIST, query, docs) ** 2,
        run(Metric.SQEUCLIDEAN_DIST, query, docs),
        rtol=1e-5,
    )


@pytest.mark.parametrize("metric", list(Metric))
def test_matches_numpy_reference(metric):
    """Randomized check against a pure-numpy transcription of the formulas."""
    rng = np.random.default_rng(0)
    docs = rng.normal(size=(257, 384)).astype(np.float32)
    query = rng.normal(size=(384,)).astype(np.float32)

    dot = docs @ query
    if metric == Metric.INNER_PRODUCT:
        expected = -dot
    elif metric == Metric.COSINE_SIM:
        expected = -dot / np.maximum(
            np.linalg.norm(docs, axis=1) * np.linalg.norm(query), 1e-8
        )
    else:
        expected = (docs**2).sum(1) - 2 * dot + (query**2).sum()
        if metric == Metric.EUCLIDEAN_DIST:
            expected = np.sqrt(np.maximum(expected, 0))
    np.testing.assert_allclose(
        run(metric, query, docs), expected, rtol=1e-4, atol=1e-4
    )
