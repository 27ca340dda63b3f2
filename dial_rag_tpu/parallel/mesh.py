"""Device mesh + sharding plans.

The reference scales with thread pools on one host
(aidial_rag/resources/cpu_pools.py); the TPU-native equivalent is a
``jax.sharding.Mesh`` over ICI with XLA-inserted collectives:

- ``dp`` (data parallel): encode batches and training batches are sharded
  over this axis; the contrastive loss's in-batch negatives ride an XLA
  all-gather across dp.
- ``tp`` (tensor parallel): encoder weight matrices are sharded on their
  wide dimension (QKV/FFN outputs, FFN inputs), vocab embeddings on the
  vocab dimension; activations stay dp-sharded and XLA inserts the
  reduce-scatter/all-reduce pairs.

The dense retrieval index is sharded row-wise over ALL devices (see
dial_rag_tpu/parallel/sharded_index.py) — per-shard stable top-k, then a
tiny all-gather merge.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    """(dp, tp) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % tp != 0:
        raise ValueError(f"{n_devices} devices not divisible by tp={tp}")
    dp = n_devices // tp
    grid = np.array(devices[:n_devices]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def bert_param_shardings(params: dict, mesh: Mesh) -> dict:
    """Tensor-parallel sharding plan for the BERT pytree.

    QKV and FFN-in kernels shard their output (wide) dim over tp; FFN-out
    shards its input dim; vocab embeddings shard the vocab dim; layernorms
    and biases of narrow outputs replicate. GSPMD keeps semantics exact for
    any layout, so this is purely a performance plan.
    """

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    emb = {
        "word": ns("tp", None),
        "position": ns(),
        "token_type": ns(),
        "layernorm": {"scale": ns(), "bias": ns()},
    }
    layers = []
    for _ in params["layers"]:
        layers.append(
            {
                "qkv": {"kernel": ns(None, "tp"), "bias": ns("tp")},
                "attn_out": {"kernel": ns("tp", None), "bias": ns()},
                "attn_ln": {"scale": ns(), "bias": ns()},
                "ffn_in": {"kernel": ns(None, "tp"), "bias": ns("tp")},
                "ffn_out": {"kernel": ns("tp", None), "bias": ns()},
                "ffn_ln": {"scale": ns(), "bias": ns()},
            }
        )
    return {"embeddings": emb, "layers": layers}
