"""dial_rag_tpu — a TPU-native (JAX/XLA/Pallas) RAG framework.

Brand-new implementation with the capabilities of epam/ai-dial-rag (see
SURVEY.md for the reference's structural analysis). Device-side compute
(embedding encoder, dense k-NN scan, BM25 scoring) is JAX/Pallas; host-side
work (parsing, rasterization, remote-model calls, HTTP service) is asyncio.
"""

__version__ = "0.1.0"
