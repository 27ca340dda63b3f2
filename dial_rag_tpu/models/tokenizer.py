"""First-party BERT WordPiece tokenizer (host-side).

The reference delegates tokenization to sentence-transformers/HF
(aidial_rag/embeddings/embeddings.py:57-66). Zero-egress TPU deployments
need a self-contained implementation: BERT "basic" pretokenization
(cleanup, lowercase + accent stripping, punctuation and CJK splitting)
followed by greedy longest-match WordPiece, producing ``[CLS] … [SEP]``
sequences padded to bucketed static lengths so the encoder's jit cache
stays small.

Output parity with the HF ``tokenizers`` BertWordPiece implementation is
asserted in tests/test_tokenizer.py.
"""

import unicodedata
from dataclasses import dataclass, field

import numpy as np

# Static sequence-length buckets: every batch is padded up to one of these
# so XLA compiles at most len(BUCKETS) encoder variants per batch size.
# 96/160/192/224 sit between the pow2 rungs because real by-title chunks
# cluster at ~180-240 wordpiece tokens (1000-char cap): padding them to
# 256 burned ~29% of encoder FLOPs (measured in bench.py round 3).
DEFAULT_BUCKETS = (64, 96, 128, 160, 192, 224, 256, 512)

_SPECIAL = {"pad": "[PAD]", "unk": "[UNK]", "cls": "[CLS]", "sep": "[SEP]"}
_MAX_WORD_CHARS = 100


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges BERT treats as punctuation even when unicode says otherwise
    if (
        (33 <= cp <= 47)
        or (58 <= cp <= 64)
        or (91 <= cp <= 96)
        or (123 <= cp <= 126)
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        (0x4E00 <= cp <= 0x9FFF)
        or (0x3400 <= cp <= 0x4DBF)
        or (0x20000 <= cp <= 0x2A6DF)
        or (0x2A700 <= cp <= 0x2B73F)
        or (0x2B740 <= cp <= 0x2B81F)
        or (0x2B820 <= cp <= 0x2CEAF)
        or (0xF900 <= cp <= 0xFAFF)
        or (0x2F800 <= cp <= 0x2FA1F)
    )


def basic_tokenize(text: str, lowercase: bool = True) -> list[str]:
    """BERT basic tokenizer: cleanup, CJK spacing, lowercase+strip accents,
    punctuation splitting, whitespace split."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if _is_cjk(cp):
            out.append(f" {ch} ")
        elif _is_whitespace(ch):
            out.append(" ")
        else:
            out.append(ch)
    tokens = []
    for word in "".join(out).split():
        if lowercase:
            word = word.lower()
            word = "".join(
                c
                for c in unicodedata.normalize("NFD", word)
                if unicodedata.category(c) != "Mn"
            )
        # split on punctuation
        current = []
        for ch in word:
            if _is_punctuation(ch):
                if current:
                    tokens.append("".join(current))
                    current = []
                tokens.append(ch)
            else:
                current.append(ch)
        if current:
            tokens.append("".join(current))
    return tokens


@dataclass
class WordPieceTokenizer:
    vocab: dict[str, int]
    lowercase: bool = True
    buckets: tuple[int, ...] = DEFAULT_BUCKETS
    _ids: dict[str, int] = field(init=False, repr=False)

    def __post_init__(self):
        self._ids = {k: self.vocab[v] for k, v in _SPECIAL.items()}
        self._native = None
        self._native_tried = False

    def _get_native(self):
        """ctypes handle to the C++ tokenizer core (ASCII fast path);
        None if the native build is unavailable."""
        if self._native_tried:
            return self._native
        self._native_tried = True
        if not self.lowercase:
            return None  # C core implements the lowercased pipeline only
        # the C core assigns ids by vocab-line order, which is only
        # correct when the dict's ids are exactly 0..N-1
        if sorted(self.vocab.values()) != list(range(len(self.vocab))):
            return None
        try:
            import ctypes

            from dial_rag_tpu.native.build import load_native

            lib = load_native("wordpiece")
            if lib is None:
                return None
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
            lib.wp_encode.restype = ctypes.c_int
            lib.wp_encode.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            c_int_p = ctypes.POINTER(ctypes.c_int)
            lib.wp_encode_batch.restype = None
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                c_int_p,  # offsets [n+1]
                ctypes.c_int,  # n
                c_int_p,  # out_ids [n, stride]
                ctypes.c_int,  # stride
                ctypes.c_int,  # cls_id
                ctypes.c_int,  # sep_id
                ctypes.c_int,  # pad_id
                c_int_p,  # out_lens [n]
            ]
            inv = sorted(self.vocab, key=self.vocab.get)
            blob = "\n".join(inv).encode("utf-8")
            handle = lib.wp_create(blob, len(blob), self._ids["unk"])
            self._native = (lib, handle)
        except Exception:
            self._native = None
        return self._native

    def _native_encode_ids(self, text: str) -> list[int] | None:
        """Token ids (no CLS/SEP) via the C core; None -> Python path."""
        native = self._get_native()
        if native is None:
            return None
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return None
        import ctypes

        lib, handle = native
        capacity = max(len(raw) + 16, 64)
        out = (ctypes.c_int * capacity)()
        n = lib.wp_encode(handle, raw, len(raw), out, capacity)
        if n == -2:  # grow buffer (pathological inputs)
            capacity = len(raw) * 4 + 64
            out = (ctypes.c_int * capacity)()
            n = lib.wp_encode(handle, raw, len(raw), out, capacity)
        if n < 0:
            return None
        return list(out[:n])

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        vocab = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab=vocab, **kw)

    @property
    def pad_id(self) -> int:
        return self._ids["pad"]

    def wordpiece(self, word: str) -> list[str]:
        """Greedy longest-match-first subword split."""
        if len(word) > _MAX_WORD_CHARS:
            return [_SPECIAL["unk"]]
        pieces = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [_SPECIAL["unk"]]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        tokens = []
        for word in basic_tokenize(text, self.lowercase):
            tokens.extend(self.wordpiece(word))
        return tokens

    def encode(self, text: str, max_len: int = 512) -> list[int]:
        ids = self._native_encode_ids(text)
        if ids is None:
            ids = [
                self.vocab.get(t, self._ids["unk"])
                for t in self.tokenize(text)
            ]
        ids = ids[: max_len - 2]
        return [self._ids["cls"]] + ids + [self._ids["sep"]]

    def _encode_batch_native(self, texts: list[str], max_len: int):
        """One-ctypes-call batch encode into numpy buffers.

        The per-text path converts every token id through a Python int
        (list(out[:n]) + per-row list assignment), which dominates
        tokenization wall time on a single-core host. Here the C core
        writes CLS/SEP-framed, pad-filled int32 rows directly into the
        output matrix; only rows containing non-ASCII bytes (flagged -1)
        re-encode through the exact Python path, preserving byte parity
        with encode(). Returns None when the native core is unavailable.
        """
        native = self._get_native()
        if native is None:
            return None
        import ctypes

        lib, handle = native
        n = len(texts)
        raws = [t.encode("utf-8") for t in texts]
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum([len(r) for r in raws], out=offsets[1:])
        blob = b"".join(raws)
        ids = np.empty((n, max_len), dtype=np.int32)
        lens = np.empty(n, dtype=np.int32)
        c_int_p = ctypes.POINTER(ctypes.c_int)
        lib.wp_encode_batch(
            handle,
            blob,
            offsets.ctypes.data_as(c_int_p),
            n,
            ids.ctypes.data_as(c_int_p),
            max_len,
            self._ids["cls"],
            self._ids["sep"],
            self.pad_id,
            lens.ctypes.data_as(c_int_p),
        )
        for i in np.nonzero(lens < 0)[0]:
            e = self.encode(texts[i], max_len)
            ids[i, : len(e)] = e  # row is already pad-filled past len(e)
            lens[i] = len(e)
        s = self._bucket(min(int(lens.max()), max_len))
        if s > max_len:
            # bucket widths can exceed max_len when max_len sits below the
            # smallest bucket: rows stay truncated at max_len ids but the
            # returned arrays pad out to the bucket (fallback-path parity)
            pad = np.full((n, s - max_len), self.pad_id, dtype=np.int32)
            out_ids = np.concatenate([ids, pad], axis=1)
        else:
            out_ids = np.ascontiguousarray(ids[:, :s])
        mask = (
            np.arange(s, dtype=np.int32)[None, :] < lens[:, None]
        ).astype(np.int32)
        return out_ids, mask

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def encode_batch(self, texts: list[str], max_len: int = 512):
        """Returns (input_ids [B, S], attention_mask [B, S]) int32 numpy
        arrays, padded to the smallest bucket >= the longest sequence."""
        max_len = min(max_len, self.buckets[-1])
        if texts and max_len >= 8:
            out = self._encode_batch_native(texts, max_len)
            if out is not None:
                return out
        encoded = [self.encode(t, max_len) for t in texts]
        longest = max((len(e) for e in encoded), default=2)
        s = self._bucket(min(longest, max_len))
        ids = np.full((len(texts), s), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(texts), s), dtype=np.int32)
        for i, e in enumerate(encoded):
            e = e[:s]
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask


def build_test_vocab(corpus_words: list[str], size: int = 1024) -> dict[str, int]:
    """Tiny deterministic vocab for tests: specials + single chars + whole
    words + common suffix pieces. Not a trainer — real deployments load the
    model's own vocab.txt."""
    tokens = [
        _SPECIAL["pad"],
        _SPECIAL["unk"],
        _SPECIAL["cls"],
        _SPECIAL["sep"],
        "[MASK]",
    ]
    chars = sorted({c for w in corpus_words for c in w.lower()})
    tokens += chars
    tokens += ["##" + c for c in chars]
    seen = set(tokens)
    for w in corpus_words:
        w = w.lower()
        if w not in seen:
            tokens.append(w)
            seen.add(w)
        if len(tokens) >= size:
            break
    return {t: i for i, t in enumerate(tokens)}
