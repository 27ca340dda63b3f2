"""C++ tokenizer core: byte-exact parity with the Python implementation."""

import numpy as np
import pytest

from dial_rag_tpu.models.tokenizer import WordPieceTokenizer, build_test_vocab

WORDS = (
    "the alps are highest mountain range entirely europe climate glaciers "
    "snow peaks colle di cadibona pass stretching approximately across"
).split()


@pytest.fixture(scope="module")
def tok():
    vocab = build_test_vocab(WORDS + ["moun", "##tain", "##s", "##ing", "##e"])
    t = WordPieceTokenizer(vocab=vocab)
    if t._get_native() is None:
        pytest.skip("native tokenizer unavailable (no g++?)")
    return t


def python_ids(tok, text, max_len=512):
    ids = [
        tok.vocab.get(t, tok._ids["unk"]) for t in tok.tokenize(text)
    ][: max_len - 2]
    return [tok._ids["cls"]] + ids + [tok._ids["sep"]]


SAMPLES = [
    "The Alps are the HIGHEST mountain range, entirely in Europe!",
    "colle di cadibona... pass?? (stretching) [approximately]",
    "mountains mountaineering snow-peaks",
    "",
    "    \t\n  ",
    "a" * 150,  # oversized word -> [UNK]
    "climate;glaciers:snow",
    "don't stop",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_parity_with_python(tok, text):
    assert tok._native_encode_ids(text) is not None or not text.isascii()
    assert tok.encode(text) == python_ids(tok, text)


def test_non_ascii_falls_back(tok):
    text = "café in the alps"
    assert tok._native_encode_ids(text) is None
    # encode still works via the Python path
    ids = tok.encode(text)
    assert ids[0] == tok.vocab["[CLS]"] and ids[-1] == tok.vocab["[SEP]"]


def test_randomized_parity(tok):
    rng = np.random.default_rng(0)
    pool = WORDS + ["xyzzy", "MOUNTAINS", "123", "42.5", "!!", "(a)", "b-c"]
    for _ in range(50):
        text = " ".join(rng.choice(pool, size=rng.integers(1, 40)))
        assert tok.encode(text) == python_ids(tok, text), text


def test_truncation_parity(tok):
    text = " ".join(["alps"] * 600)
    assert tok.encode(text, max_len=128) == python_ids(tok, text, max_len=128)
    assert len(tok.encode(text, max_len=128)) == 128


@pytest.fixture(scope="module")
def py_tok(tok):
    """Same vocab, native core disabled: the pure-Python reference path."""
    t = WordPieceTokenizer(vocab=tok.vocab)
    t._native_tried = True
    t._native = None
    return t


def _assert_batch_equal(tok, py_tok, texts, max_len=512):
    ids_n, mask_n = tok.encode_batch(texts, max_len=max_len)
    ids_p, mask_p = py_tok.encode_batch(texts, max_len=max_len)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_batch_parity_ascii(tok, py_tok):
    _assert_batch_equal(tok, py_tok, SAMPLES)


def test_batch_parity_mixed_non_ascii(tok, py_tok):
    texts = [
        "the alps",
        "café in the alps",  # non-ASCII row -> Python re-encode inside batch
        "naïve climbers über the glaciers",
        "snow peaks!",
        "",
    ]
    _assert_batch_equal(tok, py_tok, texts)


def test_batch_parity_truncation_and_buckets(tok, py_tok):
    texts = [" ".join(["alps"] * n) for n in (1, 30, 70, 200, 600)]
    for max_len in (64, 128, 512):
        _assert_batch_equal(tok, py_tok, texts, max_len=max_len)


def test_batch_parity_max_len_below_smallest_bucket(tok, py_tok):
    """max_len below the smallest bucket (e.g. training seq_len=32):
    rows truncate at max_len ids but the arrays pad out to the bucket
    width — ids and mask must agree (regression: the native path once
    returned 32-wide ids with a 64-wide mask)."""
    texts = ["ab cd", "ef gh ij", " ".join(["alps"] * 100)]
    for max_len in (8, 16, 32, 63):
        ids, mask = tok.encode_batch(texts, max_len=max_len)
        assert ids.shape == mask.shape
        _assert_batch_equal(tok, py_tok, texts, max_len=max_len)


def test_batch_parity_randomized(tok, py_tok):
    rng = np.random.default_rng(7)
    pool = WORDS + ["xyzzy", "MOUNTAINS", "123", "42.5", "!!", "(a)", "b-c", "café"]
    for _ in range(20):
        texts = [
            " ".join(rng.choice(pool, size=rng.integers(0, 60)))
            for _ in range(rng.integers(1, 9))
        ]
        _assert_batch_equal(tok, py_tok, texts)
