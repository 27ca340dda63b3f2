"""Data-parallel embedder over the 8-device CPU mesh: identical outputs
to the single-device path, batches sharded over dp."""

import jax
import numpy as np
import pytest

from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.models.tokenizer import build_test_vocab
from dial_rag_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def single():
    return BgeEmbedder.from_random(
        vocab=build_test_vocab([chr(c) for c in range(97, 123)]),
        batch_size=8,
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return create_mesh(8, tp=1)


def test_sharded_matches_single(single, mesh):
    sharded = single.shard_over(mesh)
    texts = [f"word{i} abc def" for i in range(13)]  # not a dp multiple
    a = single.embed_documents(texts)
    b = sharded.embed_documents(texts)
    assert b.shape == a.shape
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_sharded_query(single, mesh):
    sharded = single.shard_over(mesh)
    np.testing.assert_allclose(
        sharded.embed_query("abc def"),
        single.embed_query("abc def"),
        rtol=1e-5,
        atol=1e-6,
    )


def test_batch_actually_sharded(single, mesh):
    sharded = single.shard_over(mesh)
    ids = np.zeros((16, 64), dtype=np.int32)
    mask = np.ones((16, 64), dtype=np.int32)
    dev_ids, _ = sharded._device_put_batch(ids, mask)
    assert len(dev_ids.sharding.device_set) == 8


def test_embed_documents_device_matches_host(single):
    import jax.numpy as jnp

    texts = [f"doc {i} abc def ghi" for i in range(21)]  # ragged last batch
    host = single.embed_documents(texts)
    dev = single.embed_documents_device(texts)
    assert isinstance(dev, jnp.ndarray) or hasattr(dev, "devices")
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-6)


def test_from_device_matrix_matches_host_index(single):
    from dial_rag_tpu.index.dense_index import DenseIndex, DocEmbeddings
    from dial_rag_tpu.index.records import RetrievalType

    texts = [f"word{i} abc" for i in range(17)]
    emb_host = single.embed_documents(texts)
    host_index = DenseIndex(
        RetrievalType.TEXT,
        [DocEmbeddings(chunk_ids=np.arange(len(texts)), embeddings=emb_host)],
        limit=5,
    )
    dev_index = DenseIndex.from_device_matrix(
        RetrievalType.TEXT,
        single.embed_documents_device(texts),
        limit=5,
    )
    q = emb_host[3]
    assert [h.chunk_id for h in dev_index.find(q)] == [
        h.chunk_id for h in host_index.find(q)
    ]


def test_shard_over_rounds_batch_size_to_dp_multiple(single, mesh):
    odd = BgeEmbedder(
        tokenizer=single.tokenizer,
        encoder=single.encoder,
        params=single.params,
        batch_size=10,  # not a multiple of dp=8
    ).shard_over(mesh)
    assert odd.batch_size % 8 == 0
    out = odd.embed_documents([f"doc {i} abc" for i in range(23)])
    assert out.shape[0] == 23


def test_mixed_bucket_group_matches_per_text(single):
    """A group whose batches land in different sequence buckets encodes
    each batch at its own width; outputs stay identical."""
    short = ["ab cd"] * single.batch_size
    long = ["ab " * 40] * single.batch_size  # bucketed higher
    texts = (short + long) * 2 + short[:3]
    host = single.embed_documents(texts)
    per_text = np.concatenate(
        [single.embed_documents(texts[i : i + 1]) for i in range(7)]
    )
    np.testing.assert_allclose(host[:7], per_text, rtol=1e-5, atol=1e-6)
    assert host.shape == (len(texts), single.dim)


def test_packed_transfer_matches_wide(single, mesh):
    """transfer_format="packed" (uint16 ids + prefix lengths, mask
    rebuilt on device) must be bit-identical to the wide int32 layout,
    single-device and dp-sharded, including ragged last batches and
    mixed-bucket groups (which fall back to the per-batch path)."""
    import dataclasses

    packed = dataclasses.replace(single, transfer_format="packed")
    texts = [f"word{i} abc def ghi" for i in range(29)]  # ragged
    np.testing.assert_array_equal(
        packed.embed_documents(texts), single.embed_documents(texts)
    )
    # mixed buckets inside one group -> "mixed" path still works
    mixed = ["ab cd"] * single.batch_size + ["ab " * 40] * (
        single.batch_size + 3
    )
    np.testing.assert_array_equal(
        packed.embed_documents(mixed), single.embed_documents(mixed)
    )
    # sharded: transfer_format survives shard_over and stays identical
    sharded_packed = packed.shard_over(mesh)
    assert sharded_packed.transfer_format == "packed"
    np.testing.assert_allclose(
        sharded_packed.embed_documents(texts),
        single.embed_documents(texts),
        rtol=1e-5,
        atol=1e-6,
    )
    # device-resident variant rides the same grouped pipeline
    np.testing.assert_array_equal(
        np.asarray(packed.embed_documents_device(texts)),
        np.asarray(single.embed_documents_device(texts)),
    )


def test_idf_pooling_shards_like_cls(single, mesh):
    """idf pooling's [V] weight table rides params: shard_over must
    replicate it with the rest of the tree and produce identical
    embeddings to the single-device idf path."""
    import dataclasses

    import jax.numpy as jnp

    from dial_rag_tpu.models.bert import BertEncoder

    rng = np.random.default_rng(9)
    v = len(single.tokenizer.vocab)
    table = (rng.random(v) + 0.05).astype(np.float32)
    idf_single = dataclasses.replace(
        single,
        encoder=BertEncoder(
            single.encoder.config,
            compute_dtype=single.encoder.compute_dtype,
            pooling="idf",
        ),
        params={**single.params, "pooling_idf": jnp.asarray(table)},
        query_instruction="",
    )
    sharded = idf_single.shard_over(mesh)
    texts = [f"word{i} abc def" for i in range(11)]  # not a dp multiple
    a = idf_single.embed_documents(texts)
    b = sharded.embed_documents(texts)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    # unit norm (idf pool normalizes at the end)
    np.testing.assert_allclose(
        np.linalg.norm(a, axis=1), 1.0, atol=1e-5
    )
