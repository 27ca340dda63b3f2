from dial_rag_tpu.embeddings.embedder import BgeEmbedder

__all__ = ["BgeEmbedder"]
