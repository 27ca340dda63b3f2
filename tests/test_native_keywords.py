"""Parity of the C++ keyword pipeline vs the Python/nltk path.

The native core must match the nltk-backed Python implementation
byte-for-byte on ASCII inputs (the reference pipeline's semantics —
aidial_rag/keywords_search.py:13-18) and must reject non-ASCII inputs so
the Python path handles them.
"""

import numpy as np
import pytest

from dial_rag_tpu.text.keywords import (
    _get_native,
    _keywords_preprocess_python,
    keywords_preprocess,
)

pytestmark = pytest.mark.skipif(
    _get_native() is None, reason="native keywords lib unavailable"
)


def _native_only(text: str) -> list[str] | None:
    import ctypes

    lib = _get_native()
    data = text.encode("utf-8")
    cap = 8 * len(data) + 65536
    buf = ctypes.create_string_buffer(cap)
    n = lib.kw_preprocess(data, len(data), buf, cap)
    if n < 0:
        return None
    raw = buf.raw[:n].decode("utf-8")
    return raw.split("\n")[:-1] if raw else []


CASES = [
    "The Alps are the highest mountain range that lies entirely in Europe.",
    "Good muffins cost $3.88\nin New York.  Please buy me\ntwo of them.\nThanks.",
    "They'll save and invest more. hi, my name can't hello,",
    'She said "hello there" and left... Didn\'t she? Yes!',
    "The colonel's-body was generational, communal, and arsenic-laden.",
    "running runner ran runs easily fairly sportingly dying lying news",
    "conditional rational national relational irrational operational",
    "agreed feed proceed exceed succeed misdeed indeed",
    "hopping hoping controlled controlling preferred offering",
    "ties cries flies skis skies dies lies applies",
    "connection connective connectivity activate sensational sensibility",
    "(parentheses) [brackets] {braces} <angles> -- dashes",
    "it's we've they're I'm you'd gonna wanna gotta lemme cannot d'ye",
    "'tis 'twas more'n the best of times;",
    "a:b c,d 1,000 3:30 http://x.y/z e@f.g #tag $5 100%",
    "generate generates generating general generally generous gener",
    "communism community communal commune",
    "arsenal arsenic arson",
    "luxuriously ugly early only singly sky atlas cosmos bias andes",
    "inning innings outing outings canning herring earring proceed",
    "ABC DEF lowercase MiXeD CaSe WORDS",
    "trailing period.",
    "multiple.  sentences! with? terminators. end",
    "",
    "   ",
    "x",
    "ab",
]


@pytest.mark.parametrize("text", CASES)
def test_parity_fixed_cases(text):
    got = _native_only(text)
    assert got is not None, "native rejected pure-ASCII input"
    assert got == _keywords_preprocess_python(text)


def test_non_ascii_rejected_and_falls_back():
    text = "Daß die Wörter über Berée gehen."
    assert _native_only(text) is None
    # public API still works via the Python path
    assert keywords_preprocess(text) == _keywords_preprocess_python(text)


def test_fuzz_parity():
    rng = np.random.default_rng(0)
    words = (
        "the quick brown fox can't jumps-over lazy dogs' it's ``quoted'' "
        "(aside) [note] {x} 3.88 1,000 50% @h #t $9 a.m. e.g. i.e. U.S. "
        "running; said: done? yes! no... more'n gonna cannot 'tis don't "
        "beautiful nationalization considerably optimization probabilities"
    ).split()
    for _ in range(200):
        n = int(rng.integers(1, 30))
        text = " ".join(rng.choice(words, size=n))
        if rng.random() < 0.3:
            text += "."
        if rng.random() < 0.2:
            text = '"' + text + '"'
        got = _native_only(text)
        assert got is not None
        assert got == _keywords_preprocess_python(text), text


def test_random_ascii_garbage_parity():
    rng = np.random.default_rng(1)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .,!?;:'\"()[]{}<>-_@#$%&*~`\n\t"
    )
    for _ in range(300):
        n = int(rng.integers(0, 80))
        text = "".join(rng.choice(list(alphabet), size=n))
        got = _native_only(text)
        assert got is not None
        assert got == _keywords_preprocess_python(text), repr(text)


def test_stemmer_wordlist_parity():
    """Cross-check the Porter2 port against nltk over a large wordlist."""
    nltk = pytest.importorskip("nltk")
    from nltk.stem.snowball import SnowballStemmer

    stem = SnowballStemmer("english").stem
    rng = np.random.default_rng(2)
    # synthesize words hitting every suffix family
    roots = [
        "connect", "relat", "activ", "nation", "rat", "gener", "commun",
        "arsen", "happi", "beauti", "hope", "hop", "control", "prefer",
        "big", "free", "agree", "ski", "die", "tie", "vei", "emplo",
        "destro", "bu", "cr", "f", "a", "ab", "luxuri", "sensat",
    ]
    suffixes = [
        "", "s", "es", "ies", "ied", "ed", "ing", "ingly", "edly", "eed",
        "eedly", "ization", "ational", "fulness", "ousness", "iveness",
        "tional", "biliti", "lessli", "entli", "ation", "alism", "aliti",
        "ousli", "iviti", "fulli", "enci", "anci", "abli", "izer", "ator",
        "alli", "bli", "ogi", "li", "alize", "icate", "iciti", "ative",
        "ical", "ness", "ful", "ement", "ance", "ence", "able", "ible",
        "ment", "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic", "e", "l", "y", "ly", "sses", "us", "ss",
        "'s", "'s'", "'",
    ]
    from dial_rag_tpu.text.keywords import _get_native
    import ctypes

    lib = _get_native()

    def native_stem(word):
        data = word.encode()
        buf = ctypes.create_string_buffer(4096)
        n = lib.kw_preprocess(data, len(data), buf, 4096)
        assert n >= 0
        out = buf.raw[:n].decode().split("\n")[:-1]
        return out[0] if out else word

    mismatches = []
    for root in roots:
        for suf in suffixes:
            w = (root + suf).lower()
            # skip tokens the tokenizer would split (apostrophes)
            if "'" in w:
                continue
            if stem(w) != native_stem(w):
                mismatches.append((w, stem(w), native_stem(w)))
    assert not mismatches, mismatches[:20]


def test_control_separator_whitespace_parity():
    """\\x1c-\\x1f are str-whitespace in Python; the native splitter must
    agree (regression for glued BM25 terms)."""
    text = "alpha.\x1cbeta gamma\x1ddelta\x1eepsilon\x1fzeta"
    assert _native_only(text) == _keywords_preprocess_python(text)
