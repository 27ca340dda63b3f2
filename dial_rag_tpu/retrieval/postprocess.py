"""Hit postprocessing: SearchHits -> real text chunks.

Counterpart of the reference's retrievers_postprocess.get_text_chunks
(retrievers_postprocess.py:24-35): index hits carry only
``{doc_id, chunk_id, retrieval_type}``; clients and the eval harness
need the chunk text + metadata resolved from the document records.
"""

from dial_rag_tpu.documents.model import Chunk, DocumentRecord
from dial_rag_tpu.index.records import SearchHit


def get_text_chunks(
    hits: list[SearchHit], document_records: list[DocumentRecord]
) -> list[Chunk]:
    """Resolve each hit to its chunk; metadata is augmented with the hit
    identity so callers can trace provenance."""
    chunks = []
    for hit in hits:
        chunk = document_records[hit.doc_id].chunks[hit.chunk_id]
        metadata = dict(chunk.metadata)
        metadata.update(hit.to_metadata())
        chunks.append(Chunk(text=chunk.text, metadata=metadata))
    return chunks
