"""Multi-host (DCN) initialization helpers.

The reference is a single-process service (SURVEY §5: no distributed
backend). For TPU pods this framework scales past one host with the
standard JAX recipe: `jax.distributed.initialize` over DCN, then one
global mesh whose inner (fast) axes map to ICI within each slice and
whose outer axis spans hosts. Collectives are still inserted by XLA —
nothing else in the codebase changes because every sharded component
(parallel/sharded_index.py, the dp embedder, the tp encoder plan) is
written against a Mesh, not a device count.

Typical pod bring-up (same program on every host):

    from dial_rag_tpu.parallel.multihost import initialize_multihost
    initialize_multihost()            # env-driven on TPU pods
    mesh = create_global_mesh(tp=1)   # dp spans all hosts' devices
"""

import logging

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed; returns True if a multi-process setup
    was established. On TPU pods all arguments are discovered from the
    environment; single-process callers get a no-op False."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        logger.info(f"single-process mode ({e})")
        return False
    multi = jax.process_count() > 1
    if multi:
        logger.info(
            f"multi-host: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.devices())} global devices"
        )
    return multi


def create_global_mesh(tp: int = 1) -> Mesh:
    """(dp, tp) mesh over ALL global devices. The device order from
    jax.devices() keeps each host's devices contiguous, so with
    tp <= devices-per-host the tp axis rides ICI and dp crosses DCN only
    at its outer boundary — the layout the scaling recipe wants."""
    devices = np.array(jax.devices())
    if devices.size % tp != 0:
        raise ValueError(f"{devices.size} devices not divisible by tp={tp}")
    return Mesh(devices.reshape(devices.size // tp, tp), ("dp", "tp"))
