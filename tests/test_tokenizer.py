"""WordPiece tokenizer parity vs the HF `tokenizers` implementation."""

import numpy as np
import pytest

from dial_rag_tpu.models.tokenizer import (
    WordPieceTokenizer,
    basic_tokenize,
    build_test_vocab,
)

CORPUS = (
    "the alps are the highest and most extensive mountain range that is "
    "entirely in europe stretching approximately across eight alpine "
    "countries climate glaciers snow peaks colle di cadibona pass"
).split()


@pytest.fixture(scope="module")
def vocab():
    return build_test_vocab(CORPUS + ["moun", "##tain", "##ing", "##s", "##e"])


@pytest.fixture(scope="module")
def tok(vocab):
    return WordPieceTokenizer(vocab=vocab)


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("  spaces\t\nand\rmore ") == ["spaces", "and", "more"]
    assert basic_tokenize("café") == ["cafe"]  # accent stripping
    assert basic_tokenize("don't") == ["don", "'", "t"]
    assert basic_tokenize("中文abc") == ["中", "文", "abc"]


def test_wordpiece_greedy(tok):
    # whole word in vocab wins
    assert tok.wordpiece("alps") == ["alps"]
    # longest-match-first splitting
    assert tok.wordpiece("mountains") == ["mountain", "##s"]
    # unknown character -> [UNK]
    assert tok.wordpiece("λ") == ["[UNK]"]


def test_encode_has_cls_sep(tok, vocab):
    ids = tok.encode("the alps")
    assert ids[0] == vocab["[CLS]"]
    assert ids[-1] == vocab["[SEP]"]
    assert len(ids) == 4


def test_encode_batch_bucketing(tok):
    ids, mask = tok.encode_batch(["the alps", "climate"])
    assert ids.shape == (2, 64)  # smallest bucket
    assert mask.sum(axis=1).tolist() == [4, 3]
    # padding uses pad id and mask 0
    assert (ids[0, 4:] == tok.pad_id).all()


def test_truncation(tok):
    long_text = " ".join(["alps"] * 1000)
    ids = tok.encode(long_text, max_len=128)
    assert len(ids) == 128


def test_parity_with_hf_tokenizers(vocab, tok, tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    vocab_file = tmp_path / "vocab.txt"
    inv = sorted(vocab, key=vocab.get)
    vocab_file.write_text("\n".join(inv) + "\n", encoding="utf-8")

    hf = tokenizers.BertWordPieceTokenizer(
        str(vocab_file), lowercase=True, strip_accents=True
    )
    samples = [
        "The Alps are the HIGHEST mountain range, entirely in Europe!",
        "Colle di Cadibona — a pass.",
        "climate; glaciers: snow?? peaks...",
        "café mountains stretching (approximately) across",
        "",
        "don't.",
        "中文 text mixed with english",
    ]
    for text in samples:
        ours = tok.encode(text, max_len=512)
        theirs = hf.encode(text).ids
        assert ours == theirs, f"mismatch on {text!r}: {ours} vs {theirs}"


def test_gapped_vocab_ids_skip_native():
    """Non-contiguous vocab ids would silently mis-map in the C core; the
    tokenizer must fall back to Python (regression)."""
    from dial_rag_tpu.models.tokenizer import WordPieceTokenizer

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "the": 10}
    tok = WordPieceTokenizer(vocab=vocab)
    assert tok._get_native() is None
    ids, mask = tok.encode_batch(["the the"], max_len=16)
    assert ids[0][1] == 10  # python path uses the dict's real ids


def test_fuzz_unicode_parity_with_hf(vocab, tok, tmp_path):
    """Random unicode (forcing the Python fallback) and random ASCII
    (native path) must both match HF tokenizers exactly."""
    tokenizers = pytest.importorskip("tokenizers")
    import numpy as np

    vocab_file = tmp_path / "vocab.txt"
    inv = sorted(vocab, key=vocab.get)
    vocab_file.write_text("\n".join(inv) + "\n", encoding="utf-8")
    hf = tokenizers.BertWordPieceTokenizer(
        str(vocab_file), lowercase=True, strip_accents=True
    )
    rng = np.random.default_rng(4)
    pools = [
        list("abcdefghij klmnopqrstuvwxyz.,!?'-"),
        list("abc déjà vü 中文 Ωμέγα £€¥   "),
        list("ABC mixed 123 \t\n àéîõü ..."),
    ]
    for pool in pools:
        for _ in range(60):
            n = int(rng.integers(0, 40))
            text = "".join(rng.choice(pool, size=n))
            assert tok.encode(text, max_len=128) == hf.encode(text).ids[:128], (
                repr(text)
            )
