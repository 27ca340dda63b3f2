"""parallel/multihost.py on the virtual CPU mesh.

The DCN recipe can't be exercised against a real pod here, but its
logic is testable single-host: tp divisibility, device-order
contiguity of the (dp, tp) reshape, the single-process fallback of
initialize_multihost, and that the produced mesh drives the same
sharded components the dryrun uses."""

import jax
import numpy as np
import pytest

from dial_rag_tpu.parallel.multihost import (
    create_global_mesh,
    initialize_multihost,
)


def test_initialize_multihost_single_process_fallback():
    """Without a coordinator this must report False (single-process),
    not raise — the same program runs unchanged on one host."""
    assert initialize_multihost() is False
    assert jax.process_count() == 1


def test_create_global_mesh_shapes():
    n = len(jax.devices())
    mesh = create_global_mesh(tp=1)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (n, 1)

    mesh2 = create_global_mesh(tp=2)
    assert mesh2.devices.shape == (n // 2, 2)


def test_create_global_mesh_preserves_device_order():
    """Each tp group must be contiguous in jax.devices() order — that is
    what keeps tp on ICI and dp crossing DCN only at host boundaries."""
    mesh = create_global_mesh(tp=2)
    flat = [d.id for row in mesh.devices for d in row]
    assert flat == [d.id for d in jax.devices()]


def test_create_global_mesh_rejects_indivisible_tp():
    with pytest.raises(ValueError, match="not divisible"):
        create_global_mesh(tp=3)


def test_global_mesh_drives_sharded_index():
    """The mesh from the DCN recipe must work with the row-sharded dense
    index exactly like the dryrun's hand-built mesh."""
    from dial_rag_tpu.index.dense_index import DocEmbeddings
    from dial_rag_tpu.index.records import RetrievalType
    from dial_rag_tpu.parallel.sharded_index import ShardedDenseIndex

    mesh = create_global_mesh(tp=1)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((64, 16)).astype(np.float32)
    index = ShardedDenseIndex(
        RetrievalType.TEXT,
        [DocEmbeddings(chunk_ids=np.arange(64), embeddings=emb)],
        mesh,
        limit=3,
    )
    q = rng.standard_normal(16).astype(np.float32)
    hits = index.find(q)
    ref = np.argsort(
        np.sum((emb - q) ** 2, axis=1), kind="stable"
    )[:3]
    assert [h.chunk_id for h in hits] == list(ref)
