from dial_rag_tpu.parallel.mesh import (
    bert_param_shardings,
    batch_sharding,
    create_mesh,
)
from dial_rag_tpu.parallel.sharded_index import (
    ShardedBm25Index,
    ShardedBm25SparseIndex,
    ShardedDenseIndex,
    ShardedLateInteractionIndex,
)

__all__ = [
    "create_mesh",
    "bert_param_shardings",
    "batch_sharding",
    "ShardedBm25Index",
    "ShardedBm25SparseIndex",
    "ShardedDenseIndex",
    "ShardedLateInteractionIndex",
]
