"""Char-n-gram fuzzy-lexical retriever over document records.

A capability beyond the reference (off by default,
IndexingConfig.chargram_index): TF-IDF cosine over word-boundary-marked
char n-grams recovers morphological paraphrase matches Porter2 stemming
drops — measured +2.3 MRR points on the held-out handmade TEST split
when fused with the other arms (eval/tune_chargram.py; BASELINE.md).

Structure mirrors Bm25Retriever exactly (persisted per-chunk token
lists; the scoring structure is assembled at retriever construction
from all documents' items flattened in document order; later-item tie
break inherited from the shared device kernels), because the index IS
the BM25 machinery under explicit weights (index/chargram.py)."""

import asyncio

import numpy as np

from dial_rag_tpu.documents.model import DocumentRecord
from dial_rag_tpu.index.chargram import (
    DEFAULT_N_HI,
    DEFAULT_N_LO,
    ChargramIndex,
    chargram_words,
)
from dial_rag_tpu.index.records import RetrievalType, SearchHit


class ChargramRetriever:
    def __init__(self, doc_ids: np.ndarray, offsets: np.ndarray, index, k: int):
        # same O(docs) flat-item mapping as Bm25Retriever (see there for
        # why the per-chunk list is not materialized per request)
        self._doc_ids = doc_ids
        self._offsets = offsets
        self._index = index
        self.k = k

    def _hit(self, i: int, score: float) -> SearchHit:
        j = int(np.searchsorted(self._offsets, i, side="right")) - 1
        return SearchHit(
            doc_id=int(self._doc_ids[j]),
            chunk_id=int(i - self._offsets[j]),
            retrieval_type=RetrievalType.TEXT,
            score=float(score),
        )

    @staticmethod
    def _iter_items(doc_records: list[DocumentRecord]):
        for i, doc in enumerate(doc_records):
            if doc.chargram_index is not None:
                for chunk_index, words in enumerate(doc.chargram_index):
                    yield i, chunk_index, words

    @staticmethod
    def has_index(document_records: list[DocumentRecord]) -> bool:
        """True iff at least one chunk carries a VALID word — the same
        sanitize filter the index build applies (ChargramIndex._sanitize)
        — so has_index=True guarantees build() succeeds even on crafted
        records whose words are all invalid. Short-circuits on the first
        valid word, so the common case stays O(1)."""
        from dial_rag_tpu.index.chargram import _WORD_RE

        return any(
            len(w) <= 1024 and _WORD_RE.fullmatch(w)
            for _, _, words in ChargramRetriever._iter_items(document_records)
            for w in words
        )

    @classmethod
    def from_doc_records(
        cls,
        doc_records: list[DocumentRecord],
        k: int = 7,
        n_lo: int = DEFAULT_N_LO,
        n_hi: int = DEFAULT_N_HI,
        device_cache=None,
        mesh=None,
    ) -> "ChargramRetriever":
        """With ``mesh`` the gram-weight rows shard over its devices via
        the BM25 sharded wrappers (the inner index is a weighted-query
        Bm25Index)."""
        doc_ids, counts = [], []
        for i, doc in enumerate(doc_records):
            if doc.chargram_index is not None:
                doc_ids.append(i)
                counts.append(len(doc.chargram_index))
        offsets = np.concatenate(
            [[0], np.cumsum(np.asarray(counts, dtype=np.int64))]
        )

        def build():
            word_lists = [
                words
                for doc in doc_records
                if doc.chargram_index is not None
                for words in doc.chargram_index
            ]
            if mesh is not None:
                from dial_rag_tpu.parallel.sharded_index import (
                    ShardedBm25Index,
                    ShardedBm25SparseIndex,
                )

                cg = ChargramIndex.build(
                    word_lists, n_lo=n_lo, n_hi=n_hi, device=False
                )
                if cg.inner._weights_host is not None:
                    return cg.with_inner(
                        ShardedBm25Index(cg.inner, mesh, limit=k)
                    )
                return cg.with_inner(
                    ShardedBm25SparseIndex(cg.inner, mesh, limit=k)
                )
            return ChargramIndex.build(word_lists, n_lo=n_lo, n_hi=n_hi)

        if device_cache is not None:
            index = device_cache.get_or_build(
                doc_records,
                ("chargram", k, n_lo, n_hi, mesh is not None),
                build,
                warm=lambda idx: getattr(
                    idx, "warm_query_buckets", lambda _k: None
                )(k),
            )
        else:
            index = build()
        return cls(
            doc_ids=np.asarray(doc_ids, dtype=np.int64),
            offsets=offsets,
            index=index,
            k=k,
        )

    def retrieve(self, query: str) -> list[SearchHit]:
        top, scores = self._index.top_n_with_scores(query, self.k)
        return [self._hit(i, s) for i, s in zip(top, scores)]

    def retrieve_batch(self, queries: list[str]) -> list[list[SearchHit]]:
        tops = self._index.top_n_batch_with_scores(queries, self.k)
        return [
            [self._hit(i, s) for i, s in zip(top, scores)]
            for top, scores in tops
        ]

    async def aretrieve(self, query: str) -> list[SearchHit]:
        atop = getattr(self._index, "atop_n_with_scores", None)
        if atop is not None:
            top, scores = await atop(query, self.k)
            return [self._hit(i, s) for i, s in zip(top, scores)]
        return await asyncio.get_running_loop().run_in_executor(
            None, self.retrieve, query
        )

    @staticmethod
    async def build_index(chunks) -> list[list[str]]:
        """Surface word tokens per chunk for persistence (grams and
        corpus idf derive at retriever construction, like BM25's idf)."""
        from dial_rag_tpu.runtime.host_pools import run_in_parse_pool

        return await run_in_parse_pool(
            lambda: [chargram_words(c.text) for c in chunks]
        )
