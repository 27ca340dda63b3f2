"""Semantic (dense) retriever over the local embedding model.

Mirror of the reference SemanticRetriever (retrievers/semantic_retriever.py):
build = embed all chunk texts with the local bge model; query = embed the
query and scan the dense index. Metric defaults to sqeuclidean like the
reference (EmbeddingsIndex default, embeddings_index.py:43)."""

import asyncio

import numpy as np

from dial_rag_tpu.documents.model import (
    DocumentRecord,
    create_doc_embeddings_by_chunk,
    pack_simple_embeddings,
)
from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.index.dense_index import DenseIndex
from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.ops.metrics import Metric


class SemanticRetriever:
    def __init__(self, embedder: BgeEmbedder, index: DenseIndex):
        self.embedder = embedder
        self.index = index

    @classmethod
    def from_doc_records(
        cls,
        embedder: BgeEmbedder,
        document_records: list[DocumentRecord],
        k: int = 1,
        metric: Metric = Metric.SQEUCLIDEAN_DIST,
        mesh=None,
        device_cache=None,
        storage_dtype: str = "float32",
    ) -> "SemanticRetriever":
        """With ``mesh`` the chunk matrix is row-sharded over its devices
        (per-shard stable top-k + all-gather merge); otherwise single-chip.
        With ``device_cache`` the built (HBM-resident) index is reused
        across requests over the same records."""

        def build():
            doc_embeddings = [
                create_doc_embeddings_by_chunk(doc.embeddings_index)
                for doc in document_records
                if doc.embeddings_index is not None
            ]
            if mesh is not None:
                from dial_rag_tpu.parallel.sharded_index import (
                    ShardedDenseIndex,
                )

                # every storage layout shards natively: int8 keeps its
                # per-shard scales/norms (8x the single-chip 30M-row
                # capacity), two_pass keeps the certified f32-exact
                # bf16-prefilter pipeline per shard
                return ShardedDenseIndex(
                    RetrievalType.TEXT,
                    doc_embeddings,
                    mesh,
                    metric=metric,
                    limit=k,
                    storage_dtype=storage_dtype,
                )
            return DenseIndex(
                RetrievalType.TEXT,
                doc_embeddings,
                metric=metric,
                limit=k,
                storage_dtype=storage_dtype,
            )

        if device_cache is not None:
            index = device_cache.get_or_build(
                document_records,
                ("semantic", str(metric), k, mesh is not None, storage_dtype),
                build,
                warm=lambda idx: getattr(
                    idx, "warm_query_buckets", lambda: None
                )(),
            )
        else:
            index = build()
        return cls(embedder=embedder, index=index)

    def retrieve(self, query: str) -> list[SearchHit]:
        return self.index.find(self.embedder.embed_query(query))

    def retrieve_batch(self, queries: list[str]) -> list[list[SearchHit]]:
        """Many queries in two device dispatches: one batched encode +
        one batched index scan (requires a DenseIndex-backed index)."""
        if not queries:
            return []
        embs = self.embedder.embed_documents(
            [self.embedder.query_instruction + q for q in queries]
        )
        return self.index.find_batch(embs)

    async def aretrieve(self, query: str) -> list[SearchHit]:
        query_emb = await self.embedder.aembed_query(query)
        afind = getattr(self.index, "afind", None)
        if afind is not None:
            # cross-request scan coalescing: concurrent requests share
            # one find_batch dispatch + one host sync (DenseIndex.afind)
            return await afind(query_emb)
        return await asyncio.get_running_loop().run_in_executor(
            None, self.index.find, query_emb
        )

    @staticmethod
    async def build_index(embedder: BgeEmbedder, chunks) -> list[np.ndarray]:
        """Embed all chunk texts -> MultiEmbeddings (one [1, D] per chunk)."""
        texts = [chunk.text for chunk in chunks]
        embeddings = await embedder.aembed_documents(texts)
        return pack_simple_embeddings(embeddings)
