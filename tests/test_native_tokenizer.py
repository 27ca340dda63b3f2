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
