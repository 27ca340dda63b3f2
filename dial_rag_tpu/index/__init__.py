from dial_rag_tpu.index.records import RetrievalType, SearchHit
from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
from dial_rag_tpu.index.chargram import ChargramIndex
from dial_rag_tpu.index.late_interaction import LateInteractionIndex

__all__ = ["RetrievalType", "SearchHit", "DenseIndex", "ChargramIndex", "DocEmbeddings", "LateInteractionIndex"]
