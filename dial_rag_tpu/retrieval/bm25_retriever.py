"""BM25 keyword retriever over document records.

Mirror of the reference BM25Retriever (retrievers/bm25_retriever.py):
the persisted index is the tokenized text per chunk; the scoring structure
is built at retriever construction from all documents' items flattened in
document order. Query preprocessing and the top-n tie-break (later item
wins) match the reference exactly; scoring runs on device
(dial_rag_tpu/index/bm25.py)."""

import asyncio

import numpy as np

from dial_rag_tpu.documents.model import DocumentRecord
from dial_rag_tpu.index.bm25 import Bm25Index
from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.text.keywords import keywords_preprocess


class Bm25Retriever:
    def __init__(
        self,
        doc_ids: np.ndarray,
        offsets: np.ndarray,
        index,
        k: int,
        expander=None,
    ):
        # flat item i belongs to contributing-doc j = the offsets bucket
        # containing i: doc_id = doc_ids[j], chunk_id = i - offsets[j].
        # O(docs) to build — retriever construction runs on EVERY
        # request, and materializing a 1M-entry (doc, chunk) list per
        # request was a measured host hot spot at corpus scale.
        self._doc_ids = doc_ids  # [d] record index per contributing doc
        self._offsets = offsets  # [d+1] cumulative chunk counts
        self._index = index
        self.k = k
        # optional query->term-weight expansion (distributional query
        # expansion, text/word_vectors.py); None = reference-parity
        # stemmed token queries
        self._expander = expander

    def _preprocess(self, query: str):
        if self._expander is not None:
            return self._expander(query)
        return keywords_preprocess(query)

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
            if doc.text_index is not None:
                for chunk_index, tokens in enumerate(doc.text_index):
                    yield i, chunk_index, tokens

    @staticmethod
    def has_index(document_records: list[DocumentRecord]) -> bool:
        return any(
            len(tokens) > 0
            for _, _, tokens in Bm25Retriever._iter_items(document_records)
        )

    @classmethod
    def from_doc_records(
        cls,
        doc_records: list[DocumentRecord],
        k: int = 4,
        device_cache=None,
        mesh=None,
        expansion_config=None,
    ) -> "Bm25Retriever":
        """With ``mesh`` the weight rows shard over its devices (exact
        reverse-stable tie-breaks preserved via the flipped layout).

        ``expansion_config`` (service QueryExpansionConfig) turns on
        corpus-trained distributional query expansion: word vectors are
        built from the records' chunk texts at construction (cached in
        the device cache alongside the scoring structure) and each
        query scores as a stem->weight mapping through the existing
        weighted-query device path — scores of unexpanded terms are
        unchanged, so parity tests and tie-break contracts hold
        whenever no expansion term fires."""
        doc_ids, counts = [], []
        for i, doc in enumerate(doc_records):
            if doc.text_index is not None:
                doc_ids.append(i)
                counts.append(len(doc.text_index))
        offsets = np.concatenate(
            [[0], np.cumsum(np.asarray(counts, dtype=np.int64))]
        )

        def build():
            # the flat per-chunk token list is only materialized here,
            # on a device-cache miss — cache hits stay O(docs)
            tokenized = [
                tokens
                for doc in doc_records
                if doc.text_index is not None
                for tokens in doc.text_index
            ]
            if mesh is not None:
                from dial_rag_tpu.parallel.sharded_index import (
                    ShardedBm25Index,
                    ShardedBm25SparseIndex,
                )

                base = Bm25Index.build(tokenized, device=False)
                if base._weights_host is not None:
                    return ShardedBm25Index(base, mesh, limit=k)
                # corpus too large for dense [N, V] weights: shard the
                # CSC postings row-wise over the same mesh
                return ShardedBm25SparseIndex(base, mesh, limit=k)
            return Bm25Index.build(tokenized)  # raises on empty text index

        if device_cache is not None:
            index = device_cache.get_or_build(
                doc_records,
                ("bm25", k, mesh is not None),
                build,
                warm=lambda idx: getattr(
                    idx, "warm_query_buckets", lambda _k: None
                )(k),
            )
        else:
            index = build()

        expander = None
        if expansion_config is not None:
            from dial_rag_tpu.text.word_vectors import (
                build_word_vectors,
                expand_query,
            )

            ec = expansion_config

            def build_wv():
                texts = [
                    c.text
                    for doc in doc_records
                    if doc.text_index is not None
                    for c in doc.chunks
                ]
                return build_word_vectors(
                    texts,
                    window=ec.window,
                    dim=ec.dim,
                    min_count=ec.min_count,
                    max_vocab=ec.max_vocab,
                )

            if device_cache is not None:
                wv = device_cache.get_or_build(
                    doc_records,
                    (
                        "word_vectors",
                        ec.window,
                        ec.dim,
                        ec.min_count,
                        ec.max_vocab,
                    ),
                    build_wv,
                )
            else:
                wv = build_wv()

            def expander(query: str):
                return expand_query(
                    query,
                    wv,
                    m=ec.neighbors,
                    alpha=ec.alpha,
                    sim_min=ec.sim_min,
                )

        return cls(
            doc_ids=np.asarray(doc_ids, dtype=np.int64),
            offsets=offsets,
            index=index,
            k=k,
            expander=expander,
        )

    def retrieve(self, query: str) -> list[SearchHit]:
        top, scores = self._index.top_n_with_scores(
            self._preprocess(query), self.k
        )
        return [self._hit(i, s) for i, s in zip(top, scores)]

    def retrieve_batch(self, queries: list[str]) -> list[list[SearchHit]]:
        """Many queries in one device matmul (dense weights path)."""
        tops = self._index.top_n_batch_with_scores(
            [self._preprocess(q) for q in queries], self.k
        )
        return [
            [self._hit(i, s) for i, s in zip(top, scores)]
            for top, scores in tops
        ]

    async def aretrieve(self, query: str) -> list[SearchHit]:
        atop = getattr(self._index, "atop_n_with_scores", None)
        if atop is not None:
            # cross-request coalescing: concurrent requests' scoring
            # shares one batched device dispatch (Bm25Index.atop_n_*)
            top, scores = await atop(self._preprocess(query), self.k)
            return [self._hit(i, s) for i, s in zip(top, scores)]
        return await asyncio.get_running_loop().run_in_executor(
            None, self.retrieve, query
        )

    @staticmethod
    async def build_index(chunks) -> list[list[str]]:
        """Tokenize/stem chunk texts for persistence (host CPU work,
        routed to the parse pool — reference runs this in the indexing
        CPU pool, documents.py:168-176)."""
        from dial_rag_tpu.runtime.host_pools import run_in_parse_pool

        return await run_in_parse_pool(
            lambda: [keywords_preprocess(c.text) for c in chunks]
        )
