"""Reciprocal-rank-fusion ensemble.

First-party replacement for langchain's EnsembleRetriever as used by the
reference (retrieval_chain.py:240-245: equal weights 1.0, per-retriever
k=7). Semantics match langchain's weighted_reciprocal_rank exactly:

- score(hit) = sum over retrievers of weight / (rank + c), rank 1-based,
  c = 60;
- hits are deduplicated by their "{doc_id}_{chunk_id}" key (the reference
  encodes this key in Document.page_content — index_record.py:33-34);
- final order: score descending, ties broken by first appearance when
  chaining the retrievers' lists in order (Python stable sort).

Sub-retrievers run concurrently (the reference inherits this from
langchain's async batch).
"""

import asyncio
from collections import defaultdict

from dial_rag_tpu.index.records import SearchHit

RRF_C = 60


def weighted_reciprocal_rank(
    hit_lists: list[list[SearchHit]], weights: list[float]
) -> list[SearchHit]:
    rrf_score: dict[str, float] = defaultdict(float)
    for hits, weight in zip(hit_lists, weights, strict=True):
        for rank, hit in enumerate(hits, start=1):
            rrf_score[hit.key] += weight / (rank + RRF_C)

    unique: list[SearchHit] = []
    seen: set[str] = set()
    for hits in hit_lists:
        for hit in hits:
            if hit.key not in seen:
                seen.add(hit.key)
                unique.append(hit)

    return sorted(unique, key=lambda h: rrf_score[h.key], reverse=True)


class EnsembleRetriever:
    def __init__(self, retrievers: list, weights: list[float] | None = None):
        self.retrievers = retrievers
        self.weights = weights or [1.0] * len(retrievers)

    async def aretrieve(self, query: str) -> list[SearchHit]:
        hit_lists = await asyncio.gather(
            *(r.aretrieve(query) for r in self.retrievers)
        )
        return weighted_reciprocal_rank(list(hit_lists), self.weights)

    async def aretrieve_batch(
        self, queries: list[str]
    ) -> list[list[SearchHit]]:
        """Batch fusion: sub-retrievers exposing retrieve_batch (semantic
        dense scan, dense BM25) serve all queries in one device dispatch
        each; the rest fall back to per-query calls."""
        loop = asyncio.get_running_loop()

        async def per_retriever(r) -> list[list[SearchHit]]:
            if hasattr(r, "retrieve_batch"):
                return await loop.run_in_executor(
                    None, r.retrieve_batch, queries
                )
            return list(
                await asyncio.gather(*(r.aretrieve(q) for q in queries))
            )

        all_lists = await asyncio.gather(
            *(per_retriever(r) for r in self.retrievers)
        )  # [n_retrievers][n_queries]
        return [
            weighted_reciprocal_rank(
                [lists[qi] for lists in all_lists], self.weights
            )
            for qi in range(len(queries))
        ]
