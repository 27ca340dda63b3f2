from dial_rag_tpu.ops.metrics import Metric, pairwise_distances
from dial_rag_tpu.ops.stable_topk import stable_topk

__all__ = ["Metric", "pairwise_distances", "stable_topk"]
