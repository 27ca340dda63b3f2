"""Distributional word vectors + query expansion (text/word_vectors.py).

The zero-egress synonymy lever: PPMI+SVD over corpus co-occurrence,
expansion through the weighted-query BM25 path. Measured quality story
in eval/out/word_vectors*.json; these tests pin the mechanics."""

import numpy as np

from dial_rag_tpu.text.word_vectors import (
    WordVectors,
    build_word_vectors,
    expand_query,
)

# a corpus where "glacier" and "ice" share contexts (distributional
# neighbors) while "tax" lives in an unrelated context
CORPUS = [
    "the glacier high in the mountains melts slowly every summer",
    "the ice high in the mountains melts slowly every summer",
    "the glacier feeds the cold river below the mountains",
    "the ice feeds the cold river below the mountains",
    "income tax rates rose in the city parliament this year",
    "income tax law changed in the city parliament this year",
] * 3


def test_neighbors_reflect_shared_contexts():
    wv = build_word_vectors(CORPUS, window=3, dim=32)
    i = wv.index["glacier"]
    sims = wv.vecs @ wv.vecs[i]
    order = [wv.words[j] for j in np.argsort(-sims)[:4]]
    assert order[0] == "glacier"
    assert "ice" in order[1:3], order  # the context twin ranks top
    # unrelated-context word is NOT a near neighbor
    assert float(sims[wv.index["tax"]]) < float(sims[wv.index["ice"]])


def test_expansion_adds_neighbor_stems_with_decayed_weights():
    wv = build_word_vectors(CORPUS, window=3, dim=32)
    w = expand_query("the melting glacier", wv, m=3, alpha=0.5)
    assert w.get("glacier") == 1.0  # original stem at weight 1
    assert 0 < w.get("ice", 0) < 1.0  # expansion decayed by alpha*sim
    # morphological variants of the query never expand (chargram's job):
    # no expansion term stems to a query stem
    assert all(v == 1.0 or k != "melt" for k, v in w.items())


def test_expansion_only_mode_drops_originals():
    wv = build_word_vectors(CORPUS, window=3, dim=32)
    w = expand_query(
        "glacier", wv, m=3, alpha=0.5, include_original=False
    )
    assert "glacier" not in w
    assert w  # neighbors only


def test_oov_and_empty_corpus_are_safe():
    wv = build_word_vectors(CORPUS, window=3, dim=32)
    w = expand_query("zzzunknownword", wv, m=3)
    assert w == {"zzzunknownword": 1.0}
    empty = build_word_vectors([], window=3, dim=32)
    assert empty.vecs.shape[0] == 0
    assert expand_query("glacier", empty) == {"glacier": 1.0}


def test_build_is_deterministic():
    a = build_word_vectors(CORPUS, window=3, dim=32)
    b = build_word_vectors(CORPUS, window=3, dim=32)
    np.testing.assert_array_equal(a.vecs, b.vecs)


def test_bm25_retriever_with_expansion_finds_synonym_chunk():
    """End-to-end through the retriever: a query wordable only via the
    distributional neighbor must retrieve the neighbor's chunk, and the
    expansion must ride the weighted-query device path."""
    import asyncio

    from dial_rag_tpu.documents.model import (
        DocumentRecord,
        IndexSettings,
        build_chunks_list,
    )
    from dial_rag_tpu.retrieval.bm25_retriever import Bm25Retriever
    from dial_rag_tpu.service.config import QueryExpansionConfig

    chunks = build_chunks_list([(t, {"page_number": 1}) for t in CORPUS])
    text_index = asyncio.run(Bm25Retriever.build_index(chunks))
    record = DocumentRecord(
        format_version=3,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=text_index,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
    )
    plain = Bm25Retriever.from_doc_records([record], k=3)
    expanded = Bm25Retriever.from_doc_records(
        [record],
        k=3,
        expansion_config=QueryExpansionConfig(
            window=3, dim=32, neighbors=3, alpha=1.0, sim_min=0.1
        ),
    )
    # "glacier" queries must ALSO surface ice chunks under expansion
    plain_ids = {h.chunk_id for h in plain.retrieve("glacier river")}
    exp_ids = {h.chunk_id for h in expanded.retrieve("glacier river")}
    ice_chunks = {i for i, t in enumerate(CORPUS) if "ice" in t.split()}
    assert not (plain_ids & ice_chunks)
    assert exp_ids & ice_chunks, (exp_ids, ice_chunks)


def test_wordvectors_nbytes():
    wv = WordVectors(np.zeros((10, 4), np.float32), {}, [])
    assert wv.nbytes == 160


def test_expansion_composes_with_sharded_bm25():
    """Expansion weights ride the weighted-query path on the mesh too:
    the sharded BM25 layouts accept term->weight mappings, so the
    expanded retriever works unchanged over a device mesh."""
    import asyncio

    import jax

    from dial_rag_tpu.documents.model import (
        DocumentRecord,
        IndexSettings,
        build_chunks_list,
    )
    from dial_rag_tpu.parallel.mesh import create_mesh
    from dial_rag_tpu.retrieval.bm25_retriever import Bm25Retriever
    from dial_rag_tpu.service.config import QueryExpansionConfig

    assert len(jax.devices()) == 8
    mesh = create_mesh(8)
    chunks = build_chunks_list([(t, {"page_number": 1}) for t in CORPUS])
    text_index = asyncio.run(Bm25Retriever.build_index(chunks))
    record = DocumentRecord(
        format_version=3,
        index_settings=IndexSettings(),
        chunks=chunks,
        text_index=text_index,
        embeddings_index=None,
        multimodal_embeddings_index=None,
        description_embeddings_index=None,
        mime_type="text/plain",
        document_bytes=b"",
    )
    cfg = QueryExpansionConfig(
        window=3, dim=32, neighbors=3, alpha=1.0, sim_min=0.1
    )
    single = Bm25Retriever.from_doc_records(
        [record], k=3, expansion_config=cfg
    )
    sharded = Bm25Retriever.from_doc_records(
        [record], k=3, mesh=mesh, expansion_config=cfg
    )
    for q in ("glacier river", "income tax", "mountains"):
        s = [(h.doc_id, h.chunk_id) for h in single.retrieve(q)]
        m = [(h.doc_id, h.chunk_id) for h in sharded.retrieve(q)]
        assert s == m, (q, s, m)
