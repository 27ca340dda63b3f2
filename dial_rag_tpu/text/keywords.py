"""Keyword preprocessing for the BM25 index (host-side).

Reference behavior (aidial_rag/keywords_search.py:13-18):
``[stemmer.stem(t.lower()) for t in word_tokenize(text) if t not in stopwords]``
Note the reference's quirk: the stopword check runs on the *unlowered*
token against a lowercase stopword list, so capitalized stopwords ("The")
pass the filter and get stemmed. We reproduce that exactly.

Environment constraints: NLTK's punkt sentence model and stopwords corpus
are downloadable data (unavailable in zero-egress deployments), so:
- sentence splitting is a small regex splitter;
- word tokenization uses NLTK's data-free TreebankWordTokenizer when
  nltk is importable, else a first-party fallback with the same core
  rules;
- the English stopword list ships inline (NLTK's canonical list);
- stemming uses NLTK's pure-code SnowballStemmer when available, else a
  first-party Porter stemmer fallback.
"""

import re
from functools import lru_cache

# NLTK English stopword list (canonical, all-lowercase).
STOPWORDS = frozenset(
    """i me my myself we our ours ourselves you you're you've you'll you'd
your yours yourself yourselves he him his himself she she's her hers herself
it it's its itself they them their theirs themselves what which who whom
this that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after above
below to from up down in out on off over under again further then once here
there when where why how all any both each few more most other some such no
nor not only own same so than too very s t can will just don don't should
should've now d ll m o re ve y ain aren aren't couldn couldn't didn didn't
doesn doesn't hadn hadn't hasn hasn't haven haven't isn isn't ma mightn
mightn't mustn mustn't needn needn't shan shan't shouldn shouldn't wasn
wasn't weren weren't won won't wouldn wouldn't""".split()
)

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """Regex stand-in for punkt: split after ./!/? followed by whitespace."""
    return [s for s in _SENT_RE.split(text) if s]


@lru_cache(maxsize=1)
def _treebank():
    try:
        from nltk.tokenize import TreebankWordTokenizer

        return TreebankWordTokenizer()
    except Exception:
        return None


_FALLBACK_TOKEN_RE = re.compile(
    r"""
      \w+(?:[-'.]\w+)*   # words with internal hyphens/apostrophes/dots
    | \S                  # any other single non-space char (punctuation)
    """,
    re.VERBOSE,
)


def word_tokenize(text: str) -> list[str]:
    """Treebank-style word tokenization over regex-split sentences."""
    tb = _treebank()
    tokens: list[str] = []
    for sent in split_sentences(text):
        if tb is not None:
            tokens.extend(tb.tokenize(sent))
        else:
            tokens.extend(_FALLBACK_TOKEN_RE.findall(sent))
    return tokens


@lru_cache(maxsize=1)
def _stemmer():
    try:
        from nltk.stem.snowball import SnowballStemmer

        return SnowballStemmer("english").stem
    except Exception:
        # trivial suffix-stripping fallback; only used if nltk is absent
        def porter_lite(w: str) -> str:
            for suf in ("ingly", "edly", "ing", "ed", "ly", "es", "s"):
                if w.endswith(suf) and len(w) - len(suf) >= 3:
                    return w[: -len(suf)]
            return w

        return porter_lite


_native_state: list = []  # [] = untried, [None] = unavailable, [(lib, buf)]


def _get_native():
    """Build/load the C++ pipeline (native/keywords.cpp) on first use."""
    if _native_state:
        return _native_state[0]
    import ctypes

    entry = None
    try:
        from dial_rag_tpu.native.build import load_native

        lib = load_native("keywords")
        if lib is not None:
            lib.kw_set_stopwords.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int32,
            ]
            lib.kw_preprocess.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int32,
                ctypes.c_char_p,
                ctypes.c_int32,
            ]
            lib.kw_preprocess.restype = ctypes.c_int32
            stop = "\n".join(sorted(STOPWORDS)).encode()
            lib.kw_set_stopwords(stop, len(stop))
            entry = lib
    except Exception:  # pragma: no cover - build env issues
        entry = None
    _native_state.append(entry)
    return entry


def _keywords_preprocess_python(text: str) -> list[str]:
    stem = _stemmer()
    return [
        stem(t.lower()) for t in word_tokenize(text) if t not in STOPWORDS
    ]


def keywords_preprocess(text: str) -> list[str]:
    """Tokenize -> filter stopwords (reference quirk: on the raw token) ->
    lowercase+stem. ASCII text runs through the C++ core (tokenizer +
    Porter2 stemmer in one pass); anything else falls back to the exact
    Python/nltk path."""
    lib = _get_native()
    if lib is not None:
        import ctypes

        data = text.encode("utf-8")
        cap = max(4096, 2 * len(data) + 1024)
        buf = ctypes.create_string_buffer(cap)
        n = lib.kw_preprocess(data, len(data), buf, cap)
        if n == -2:  # undersized buffer (stems never exceed 2x input)
            cap = 4 * len(data) + 65536
            buf = ctypes.create_string_buffer(cap)
            n = lib.kw_preprocess(data, len(data), buf, cap)
        if n >= 0:
            raw = buf.raw[:n].decode("utf-8")
            return raw.split("\n")[:-1] if raw else []
    return _keywords_preprocess_python(text)
