from dial_rag_tpu.utils.streams import (
    LoggerStream,
    MarkdownStream,
    MultiStream,
    StreamWithPrefix,
)
from dial_rag_tpu.utils.timing import timed_block, timeout

__all__ = [
    "StreamWithPrefix",
    "MarkdownStream",
    "LoggerStream",
    "MultiStream",
    "timed_block",
    "timeout",
]
