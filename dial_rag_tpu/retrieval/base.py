"""Retriever protocol: async text query -> ranked SearchHit list."""

from typing import Protocol, runtime_checkable

from dial_rag_tpu.index.records import SearchHit


@runtime_checkable
class Retriever(Protocol):
    async def aretrieve(self, query: str) -> list[SearchHit]: ...
