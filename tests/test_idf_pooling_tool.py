"""Unit tests for tools/make_idf_pooling.py's table builder (the
artifact math behind the idf-pooled semantic arm)."""

import numpy as np

from dial_rag_tpu.models.tokenizer import WordPieceTokenizer, build_test_vocab
from tools.make_idf_pooling import build_idf_table


def _tokenizer():
    return WordPieceTokenizer(
        vocab=build_test_vocab(
            ["alps", "climate", "mountain", "rare", "the", "of"]
        )
    )


def test_idf_table_matches_manual_bm25_style_idf():
    tok = _tokenizer()
    texts = [
        "the alps mountain",
        "the climate of the alps",
        "the mountain",
        "rare",
    ]
    n = len(texts)
    table = build_idf_table(texts, tok, len(tok.vocab), alpha=2.0)

    # manual: chunk-level df over wordpiece ids
    df = np.zeros(len(tok.vocab), dtype=np.int64)
    for t in texts:
        ids, mask = tok.encode_batch([t], max_len=64)
        df[np.unique(ids[0, : int(mask[0].sum())])] += 1
    idf = np.maximum(np.log((n - df + 0.5) / (df + 0.5) + 1.0), 1e-3)
    np.testing.assert_allclose(table, (idf**2.0).astype(np.float32))

    the_id = tok.vocab["the"]
    rare_id = tok.vocab["rare"]
    mountain_id = tok.vocab["mountain"]
    # ubiquitous tokens floor out; rare tokens dominate
    assert table[rare_id] > table[mountain_id] > table[the_id]
    # CLS/SEP appear in EVERY chunk -> df=n -> the table minimum (the
    # log1p-style formulation keeps idf positive, so the 1e-3 floor
    # only guards pathological inputs)
    cls_id = tok.vocab["[CLS]"]
    assert table[cls_id] == table.min()
    assert table[cls_id] < 0.05 * table.max()
    # unseen tokens get the df=0 maximum
    unseen = [
        i for i in range(len(tok.vocab)) if df[i] == 0
    ]
    assert table[unseen[0]] == table.max()


def test_idf_table_alpha_is_a_pure_power():
    tok = _tokenizer()
    texts = ["the alps climate", "the mountain", "the rare alps"]
    t1 = build_idf_table(texts, tok, len(tok.vocab), alpha=1.0)
    t3 = build_idf_table(texts, tok, len(tok.vocab), alpha=3.0)
    np.testing.assert_allclose(t3, t1**3, rtol=1e-5)
