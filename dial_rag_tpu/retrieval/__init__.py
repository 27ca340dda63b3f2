from dial_rag_tpu.retrieval.all_documents import AllDocumentsRetriever
from dial_rag_tpu.retrieval.bm25_retriever import Bm25Retriever
from dial_rag_tpu.retrieval.ensemble import EnsembleRetriever
from dial_rag_tpu.retrieval.chargram_retriever import ChargramRetriever
from dial_rag_tpu.retrieval.late_interaction import LateInteractionRetriever
from dial_rag_tpu.retrieval.semantic import SemanticRetriever

__all__ = [
    "AllDocumentsRetriever",
    "Bm25Retriever",
    "ChargramRetriever",
    "EnsembleRetriever",
    "LateInteractionRetriever",
    "SemanticRetriever",
]
