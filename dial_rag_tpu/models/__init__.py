from dial_rag_tpu.models.bert import BertConfig, BertEncoder, init_params
from dial_rag_tpu.models.tokenizer import WordPieceTokenizer

__all__ = ["BertConfig", "BertEncoder", "init_params", "WordPieceTokenizer"]
