from dial_rag_tpu.text.keywords import keywords_preprocess

__all__ = ["keywords_preprocess"]
