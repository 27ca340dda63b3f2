"""Late-interaction (MaxSim) retriever — beyond the reference.

Token-level retrieval over the local encoder: build = per-token
embeddings for every chunk (stored ragged in the document record, like
the other MultiEmbeddings indexes); query = per-token query embeddings
scored with MaxSim on device (dial_rag_tpu/index/late_interaction.py).
Off by default (``IndexingConfig.late_interaction_index: None``) so the
reference-parity behavior is untouched; enabling it adds the retriever
to the RRF ensemble like any other index.
"""

import asyncio

import numpy as np

from dial_rag_tpu.documents.model import DocumentRecord
from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.index.late_interaction import LateInteractionIndex
from dial_rag_tpu.index.records import RetrievalType, SearchHit


class LateInteractionRetriever:
    def __init__(self, embedder: BgeEmbedder, index: LateInteractionIndex):
        self.embedder = embedder
        self.index = index

    @staticmethod
    def has_index(document_records: list[DocumentRecord]) -> bool:
        return any(
            doc.late_interaction_index is not None
            for doc in document_records
        )

    @classmethod
    def from_doc_records(
        cls,
        embedder: BgeEmbedder,
        document_records: list[DocumentRecord],
        k: int = 1,
        max_chunk_tokens: int = 256,
        storage_dtype: str = "float32",
        device_cache=None,
        mesh=None,
    ) -> "LateInteractionRetriever":
        """With ``mesh`` the chunk rows (and their token tensors — the
        HBM-heavy part) shard over its devices with per-shard MaxSim +
        stable merge; otherwise single-chip."""

        def build():
            per_doc = [
                doc.late_interaction_index or []
                for doc in document_records
            ]
            if mesh is not None:
                from dial_rag_tpu.parallel.sharded_index import (
                    ShardedLateInteractionIndex,
                )

                # int8 shards natively (per-token scales ride with
                # their rows): 8x the single-chip 2M-chunk capacity
                return ShardedLateInteractionIndex(
                    RetrievalType.TEXT,
                    per_doc,
                    mesh,
                    max_chunk_tokens=max_chunk_tokens,
                    limit=k,
                    storage_dtype=storage_dtype,
                )
            return LateInteractionIndex(
                RetrievalType.TEXT,
                per_doc,
                max_chunk_tokens=max_chunk_tokens,
                limit=k,
                storage_dtype=storage_dtype,
            )

        if device_cache is not None:
            index = device_cache.get_or_build(
                document_records,
                (
                    "late_interaction",
                    k,
                    max_chunk_tokens,
                    storage_dtype,
                    mesh is not None,
                ),
                build,
                warm=lambda idx: getattr(
                    idx, "warm_query_buckets", lambda: None
                )(),
            )
        else:
            index = build()
        return cls(embedder=embedder, index=index)

    def retrieve(self, query: str) -> list[SearchHit]:
        return self.index.find(self.embedder.embed_query_tokens(query))

    def retrieve_batch(self, queries: list[str]) -> list[list[SearchHit]]:
        """Many queries in two dispatches: one token encode + one batched
        MaxSim scan (single-chip and mesh-sharded indexes both support
        it — each corpus pass is shared across all queries)."""
        if not queries:
            return []
        q_tokens = self.embedder.embed_documents_tokens(
            queries, max_tokens=64
        )
        return self.index.find_batch(q_tokens)

    async def aretrieve(self, query: str) -> list[SearchHit]:
        # device-resident [S, D] rows (padded positions exactly zero):
        # the encode->MaxSim dependency resolves in HBM and the only
        # host sync is the final top-k fetch; index paths that need host
        # arrays (sharded) coerce via np.asarray with identical scores
        # (zero tokens are score-inert)
        q_tokens = await self.embedder.aembed_query_tokens_device(query)
        afind = getattr(self.index, "afind", None)
        if afind is not None:
            # cross-request coalescing: same-bucket concurrent queries
            # share one MaxSim dispatch (LateInteractionIndex.afind)
            return await afind(q_tokens)
        return await asyncio.get_running_loop().run_in_executor(
            None, self.index.find, q_tokens
        )

    @staticmethod
    async def build_index(
        embedder: BgeEmbedder, chunks, max_chunk_tokens: int = 256
    ) -> list[np.ndarray]:
        """Per-token embeddings for every chunk -> ragged [t_i, D] list
        (persisted in DocumentRecord.late_interaction_index)."""
        return await embedder.aembed_documents_tokens(
            [chunk.text for chunk in chunks], max_chunk_tokens
        )
