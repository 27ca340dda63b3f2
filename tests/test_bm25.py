"""BM25 parity with rank_bm25.BM25Okapi semantics.

rank-bm25 is not installed here, so the expected scores come from a
straight-line transcription of the published BM25Okapi algorithm
(k1=1.5, b=0.75, epsilon=0.25, idf floor at epsilon * average_idf),
which is what the reference delegates to (bm25_retriever.py:78-84).
"""

import math

import numpy as np
import pytest

from dial_rag_tpu.index.bm25 import B, EPSILON, K1, Bm25Index
from dial_rag_tpu.text.keywords import keywords_preprocess


def bm25_okapi_reference(corpus, query):
    """Transcription of rank_bm25.BM25Okapi.get_scores."""
    n = len(corpus)
    doc_freqs = []
    nd = {}
    for doc in corpus:
        freqs = {}
        for w in doc:
            freqs[w] = freqs.get(w, 0) + 1
        doc_freqs.append(freqs)
        for w in freqs:
            nd[w] = nd.get(w, 0) + 1
    idf, idf_sum, neg = {}, 0.0, []
    for w, f in nd.items():
        v = math.log(n - f + 0.5) - math.log(f + 0.5)
        idf[w] = v
        idf_sum += v
        if v < 0:
            neg.append(w)
    avg_idf = idf_sum / len(idf)
    for w in neg:
        idf[w] = EPSILON * avg_idf
    dl = np.array([len(d) for d in corpus], dtype=np.float64)
    avgdl = dl.sum() / n
    score = np.zeros(n)
    for q in query:
        q_freq = np.array([df.get(q, 0) for df in doc_freqs], dtype=np.float64)
        score += (idf.get(q) or 0.0) * (
            q_freq * (K1 + 1) / (q_freq + K1 * (1 - B + B * dl / avgdl))
        )
    return score


CORPUS = [
    "the alps stretch across eight alpine countries".split(),
    "colle di cadibona marks the boundary of the alps".split(),
    "climate in the alps varies with elevation and latitude".split(),
    "glaciers shaped the alpine valleys over millennia".split(),
    "mont blanc is the highest peak of the alps".split(),
    [],  # empty chunk (image-only page)
    "cadibona cadibona pass".split(),
]


@pytest.mark.parametrize(
    "query",
    [
        ["cadibona"],
        ["alps", "climate"],
        ["alps", "alps"],  # repeated query terms accumulate
        ["unknownterm"],
        ["the"],
        [],
    ],
)
def test_scores_match_okapi(query):
    index = Bm25Index.build(CORPUS)
    got = index.get_scores(query)
    expected = bm25_okapi_reference(CORPUS, query)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [1, 3, 7, 100])
@pytest.mark.parametrize(
    "query", [["cadibona"], ["alps"], ["unknownterm"], []]
)
def test_top_n_matches_reference_tiebreak(query, n):
    index = Bm25Index.build(CORPUS)
    scores = bm25_okapi_reference(CORPUS, query)
    expected = np.argsort(scores, kind="stable")[::-1][:n]
    got = index.top_n(query, n)
    np.testing.assert_array_equal(got, expected)


def test_csr_fallback_matches_dense():
    dense = Bm25Index.build(CORPUS)
    sparse = Bm25Index.build(CORPUS, max_dense_bytes=0)
    assert sparse._weights_dev is None
    for query in (["cadibona"], ["alps", "climate"], ["the"]):
        np.testing.assert_allclose(
            sparse.get_scores(query), dense.get_scores(query), rtol=1e-5
        )
        np.testing.assert_array_equal(
            sparse.top_n(query, 3), dense.top_n(query, 3)
        )


def test_empty_corpus_raises():
    with pytest.raises(ValueError):
        Bm25Index.build([[], []])


def test_randomized_parity():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(50)]
    corpus = [
        list(rng.choice(words, size=rng.integers(1, 30)))
        for _ in range(64)
    ]
    index = Bm25Index.build(corpus)
    for _ in range(5):
        query = list(rng.choice(words, size=4))
        np.testing.assert_allclose(
            index.get_scores(query),
            bm25_okapi_reference(corpus, query),
            rtol=1e-4,
            atol=1e-5,
        )
        expected = np.argsort(
            bm25_okapi_reference(corpus, query), kind="stable"
        )[::-1][:7]
        np.testing.assert_array_equal(index.top_n(query, 7), expected)


class TestKeywordsPreprocess:
    def test_basic(self):
        # "The" survives the stopword filter (reference checks the raw
        # token against a lowercase list) and is stemmed lowercased
        toks = keywords_preprocess("The Alps are beautiful mountains.")
        assert "the" in toks
        assert "are" not in toks  # lowercase stopword removed
        assert "alp" in toks or "alps" in toks
        assert "mountain" in toks  # stemmed

    def test_stemming(self):
        assert keywords_preprocess("glaciers")[0] == "glacier"
        assert keywords_preprocess("stretching")[0] == "stretch"

    def test_punctuation_tokens_kept(self):
        # the reference keeps punctuation tokens (word_tokenize emits them,
        # they are not stopwords)
        toks = keywords_preprocess("Hello, world!")
        assert "," in toks and "!" in toks

    def test_empty(self):
        assert keywords_preprocess("") == []


def test_sparse_postings_matches_dense():
    """Forcing the CSC path (max_dense_bytes=0) must give identical
    scores and reference-exact tie-breaks vs the dense matrix path."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(7)
    words = ["alps", "climate", "glacier", "peak", "valley", "snow",
             "river", "pass", "summit", "trail"]
    items = [
        list(rng.choice(words, size=int(rng.integers(3, 12))))
        for _ in range(57)
    ]
    dense = Bm25Index.build(items)
    sparse = Bm25Index.build(items, max_dense_bytes=0)
    assert dense._weights_dev is not None
    assert sparse._postings is not None

    for q in (["alps"], ["climate", "glacier", "climate"],
              ["summit", "missing-word"], ["valley", "snow", "river"]):
        np.testing.assert_allclose(
            sparse.get_scores(q), dense.get_scores(q), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(
            sparse.top_n(q, 7), dense.top_n(q, 7)
        )


def test_scores_match_published_okapi_formula_goldens():
    """Exact-score parity with the published rank-bm25 BM25Okapi
    formula, frozen as library-independent constants.

    Derivation (computed once from the published formula — k1=1.5,
    b=0.75, epsilon=0.25; idf(t) = ln((N-df+0.5)/(df+0.5)) with
    negative idfs floored to epsilon * mean(idf); score contribution
    idf(t) * f*(k1+1) / (f + k1*(1-b+b*dl/avgdl)) — reference relies
    on the same scores via rank_bm25, reference
    retrievers/bm25_retriever.py:78-84). For this corpus: 'the' has
    df=3/N=4 so ln(1.5/3.5) < 0 and takes the epsilon floor, covering
    the idf-floor branch explicitly."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    items = [
        "the alps are high".split(),
        "the climate varies with elevation".split(),
        "glaciers shaped the valleys".split(),
        "cadibona marks the boundary".split(),
    ]
    goldens = {
        ("alps",): [0.87033617, 0.0, 0.0, 0.0],
        ("the", "climate"): [0.16173933, 0.93083649, 0.16173933, 0.16173933],
        ("cadibona", "boundary"): [0.0, 0.0, 0.0, 1.74067234],
    }
    for variant in ({}, {"max_dense_bytes": 0}):  # dense and CSC sparse
        index = Bm25Index.build(items, **variant)
        for query, expected in goldens.items():
            np.testing.assert_allclose(
                index.get_scores(list(query)),
                np.asarray(expected, dtype=np.float32),
                rtol=1e-5,
                atol=1e-6,
            )


def test_sparse_top_n_batch_single_dispatch_matches_per_query():
    """The device-CSC batched path (one vmapped dispatch) must equal
    the per-query bucketed path exactly, incl. later-wins tie-breaks."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(5)
    items = [
        [f"w{int(x)}" for x in rng.integers(0, 40, size=10)]
        for _ in range(500)
    ]
    sparse = Bm25Index.build(items, max_dense_bytes=0)
    assert sparse._postings is not None
    queries = [
        [f"w{int(x)}" for x in rng.integers(0, 50, size=4)]  # some OOV
        for _ in range(9)
    ]
    queries.append(["zzz-not-in-vocab"])
    batch = sparse.top_n_batch(queries, 5)
    for q, got in zip(queries, batch):
        np.testing.assert_array_equal(got, sparse.top_n(q, 5))


def test_sparse_dense_band_activates_and_stays_exact():
    """High-df terms move into the dense band (TPU scatter-add costs a
    serialized update per posting); scores and later-wins rankings must
    stay bit-compatible with the bandless layout."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(11)
    # 'common' appears in nearly every item (band candidate); the rest
    # are rare tail terms
    items = [
        (["common"] if i % 8 else [])
        + [f"w{int(x)}" for x in rng.integers(0, 300, size=6)]
        for i in range(600)
    ]
    banded = Bm25Index.build(items, max_dense_bytes=0)
    plain = Bm25Index.build(items, max_dense_bytes=0, max_band_bytes=0)
    assert banded._band_dev is not None and "common" in {
        t for t in banded.vocab if banded.vocab[t] in banded._band_cols
    }
    assert plain._band_dev is None
    queries = [
        ["common", "w3", "w17"],
        ["common"],
        ["w4", "w9"],
        ["zzz-oov"],
    ]
    for q in queries:
        np.testing.assert_allclose(
            banded.get_scores(q), plain.get_scores(q), rtol=1e-6
        )
        np.testing.assert_array_equal(
            banded.top_n(q, 5), plain.top_n(q, 5)
        )
    got = banded.top_n_batch(queries, 5)
    for q, g in zip(queries, got):
        np.testing.assert_array_equal(g, plain.top_n(q, 5))


def test_banded_sparse_topk_exact_vs_host_argsort():
    """The banded virtual-slice kernels must reproduce the host
    reference ``np.argsort(scores, kind='stable')[::-1][:k]``
    exactly — including later-wins ties from duplicated items, rows
    touched by several query terms, repeated query terms, and queries
    with zero tail terms."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(23)
    base = [
        [f"w{int(x)}" for x in rng.integers(0, 120, size=8)]
        for _ in range(300)
    ]
    # duplicated items => exact score ties whose order is contractual
    items = base + base[:40] + [["common", "w1"]] * 25
    items = [(["common"] if i % 3 else []) + it for i, it in enumerate(items)]
    banded = Bm25Index.build(items, max_dense_bytes=0)
    host = Bm25Index.build(items, max_dense_bytes=0, device=False)
    assert banded._band_dev is not None and banded._postings is not None

    queries = [
        ["common", "w1", "w1", "w2"],  # band + repeated tail terms
        ["common"],  # band-only (zero tail terms)
        ["w1", "w2", "w3", "w4", "w5"],  # tail-only
        ["w117", "w118", "zzz-oov"],  # rare + OOV
        ["zzz-oov"],  # all-OOV: pure tie on 0.0 scores
    ]
    for k in (5, 12):
        got = banded.top_n_batch(queries, k)
        for q, g in zip(queries, got):
            scores = host.get_scores(q)
            want = np.argsort(scores, kind="stable")[::-1][:k]
            np.testing.assert_array_equal(g, want)
            np.testing.assert_array_equal(banded.top_n(q, k), want)


def test_virtual_slice_split_over_long_posting_lists():
    """A tail term whose posting list exceeds _VSLICE splits into
    multiple fixed-width virtual slices at query prep; scores and
    rankings must match the host path exactly across the split (the
    band is disabled so the long list cannot hide there)."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import _VSLICE, Bm25Index

    rng = np.random.default_rng(31)
    n = _VSLICE * 2 + 513  # 'common' df spans >2 full slices + a stub
    items = [
        ["common"] + [f"w{int(x)}" for x in rng.integers(0, 50, size=3)]
        for _ in range(n)
    ]
    items[5] += ["common", "common"]  # tf>1 inside slice 0
    items[_VSLICE + 7] += ["common"]  # tf>1 inside slice 1
    sparse = Bm25Index.build(items, max_dense_bytes=0, max_band_bytes=0)
    host = Bm25Index.build(
        items, max_dense_bytes=0, max_band_bytes=0, device=False
    )
    assert sparse._band_dev is None
    term_ptr = sparse._postings[0]
    tid = sparse.vocab["common"]
    assert int(term_ptr[tid + 1] - term_ptr[tid]) > 2 * _VSLICE

    for q in (["common"], ["common", "common", "w3"], ["w7", "common"]):
        np.testing.assert_allclose(
            sparse.get_scores(q), host.get_scores(q), rtol=1e-5, atol=1e-6
        )
        want = np.argsort(host.get_scores(q), kind="stable")[::-1][:9]
        np.testing.assert_array_equal(sparse.top_n(q, 9), want)
    got = sparse.top_n_batch([["common", "w1"], ["w2"]], 6)
    for q, g in zip([["common", "w1"], ["w2"]], got):
        want = np.argsort(host.get_scores(q), kind="stable")[::-1][:6]
        np.testing.assert_array_equal(g, want)


def test_weighted_query_mapping_matches_counted_list():
    """A term->weight mapping ranks exactly like the equivalent token
    list (integer weights = repeated tokens), fractional weights scale
    scores linearly, and the dense / CSC paths agree on mappings —
    every scoring path is linear in the query vector."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(11)
    words = ["alps", "climate", "glacier", "peak", "valley", "snow",
             "river", "pass", "summit", "trail"]
    items = [
        list(rng.choice(words, size=int(rng.integers(3, 12))))
        for _ in range(64)
    ]
    dense = Bm25Index.build(items)
    sparse = Bm25Index.build(items, max_dense_bytes=0)

    as_list = ["climate", "glacier", "glacier", "peak", "not-in-vocab"]
    as_map = {"climate": 1.0, "glacier": 2.0, "peak": 1.0, "not-in-vocab": 3.0}
    np.testing.assert_allclose(
        dense.get_scores(as_map), dense.get_scores(as_list),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        dense.top_n(as_map, 7), dense.top_n(as_list, 7)
    )
    np.testing.assert_allclose(
        sparse.get_scores(as_map), dense.get_scores(as_map),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        sparse.top_n(as_map, 7), dense.top_n(as_map, 7)
    )
    # fractional weights scale the linear score exactly
    np.testing.assert_allclose(
        dense.get_scores({"climate": 0.25}),
        0.25 * dense.get_scores(["climate"]),
        rtol=1e-6, atol=1e-6,
    )


def test_atop_coalesces_concurrent_queries_and_matches_single():
    """Concurrent ``atop_n_with_scores`` calls coalesce into batched
    waves with ranking identical to per-query ``top_n_with_scores`` —
    on BOTH device layouts — including mixed per-caller n (a larger-k
    top list trims to a smaller k's exact prefix)."""
    import asyncio

    queries = [
        ["cadibona"],
        ["alps", "climate"],
        ["alps"],
        ["the"],
        ["unknownterm"],
        ["cadibona", "pass"],
    ]
    ns = [3, 7, 1, 5, 2, 4]
    for kwargs in ({}, {"max_dense_bytes": 0}):
        index = Bm25Index.build(CORPUS, **kwargs)
        waves: list[int] = []
        orig = index._scan_wave

        def spy(items, _orig=orig):
            waves.append(len(items))
            return _orig(items)

        index._scan_wave = spy

        async def run_all():
            return await asyncio.gather(
                *(
                    index.atop_n_with_scores(q, n)
                    for q, n in zip(queries, ns)
                )
            )

        results = asyncio.run(run_all())
        for (q, n), (idx, vals) in zip(zip(queries, ns), results):
            exp_idx, exp_vals = index.top_n_with_scores(q, n)
            np.testing.assert_array_equal(idx, exp_idx)
            np.testing.assert_allclose(vals, exp_vals, rtol=1e-5, atol=1e-6)
        assert sum(waves) == len(queries)
        assert max(waves) > 1, waves


def test_sparse_batch_kernel_choice_both_paths_exact():
    """The batch dispatcher picks the flat kernel under skewed slice
    counts and the vmapped uniform kernel otherwise; BOTH must match
    the per-query path bitwise."""
    import numpy as np

    from dial_rag_tpu.index.bm25 import Bm25Index

    rng = np.random.default_rng(3)
    # "heavy" appears in most items -> many slices for queries carrying
    # it; "w*" terms are rare -> single slices
    items = [
        (["heavy"] if i % 2 else [])
        + [f"w{int(x)}" for x in rng.integers(0, 400, size=5)]
        for i in range(3000)
    ]
    # kill the dense band so ALL terms ride the CSC tail (heavy would
    # otherwise band out and deflate the skew)
    idx = Bm25Index.build(items, max_dense_bytes=0, max_band_bytes=0)

    def check(queries):
        batch = idx.top_n_batch_with_scores(queries, 5)
        for q, (bi, bv) in zip(queries, batch):
            si, sv = idx.top_n_with_scores(q, 5)
            np.testing.assert_array_equal(bi, si)
            np.testing.assert_array_equal(bv, sv)

    # skewed: one query drags in the heavy term's many slices
    check([["heavy", "w1"], ["w2"], ["w3"], ["w4"], ["w5"]])
    # uniform: every query has the same tiny slice count
    check([["w1"], ["w2"], ["w3"], ["w4"]])
    # uniform-heavy: all queries heavy (the stress-profile shape)
    check([["heavy", "w1"], ["heavy", "w2"], ["heavy", "w3"]])
