"""Retrieval-quality and chunk-parity goldens on the reference's REAL
corpora.

Two distinct alps PDFs exist in the reference (different files!):

- ``tests/data/alps_wiki.pdf`` (26 pages) — the PARITY corpus. The
  reference's exact-chunk goldens live here (reference
  tests/test_retrievers.py:63,82-104: 177 chunks, BM25 "Colle di
  Cadibona" -> chunk 31 page 3, semantic "climate" -> chunk 103 page
  10), and its cached e2e traffic records full chunk texts
  (mined into tests/data/alps_oracle_chunks.json by
  tools/mine_oracle_chunks.py). The first-party segmentation
  (documents/pdf/layout.py + text/texttype.py) was fitted against
  those recordings.
- ``eval/data/alps_wiki.pdf`` (25 pages) — the QUALITY corpus, paired
  with the ground-truth parquet (reference eval/eval_retriever.py).

Current parity state (pinned below): 177 chunks — EQUAL to the
reference's 177 — the Cadibona golden lands on the reference's exact
chunk id 31 / page 3, the Climate chunk text is byte-identical (id 104
vs the reference's 103), and 20 of the 22 recorded oracle chunks match
byte-for-byte. The residual divergences are documented in
docs/chunking_parity.md.
"""

import asyncio
import json
from pathlib import Path

import pytest

from eval.eval_alps import (
    alps_data_available,
    build_record,
    fact_relevance,
    load_alps,
    parse_alps,
    score,
)

TESTS_ALPS_PDF = Path("/root/reference/tests/data/alps_wiki.pdf")
ORACLE_FIXTURE = Path(__file__).parent / "data" / "alps_oracle_chunks.json"

pytestmark = pytest.mark.skipif(
    not alps_data_available(),
    reason="reference alps corpus not mounted",
)


# ---------------------------------------------------------------- quality
# (eval/data corpus + ground-truth parquet)


@pytest.fixture(scope="module")
def alps():
    pdf_bytes, rows = load_alps()
    chunks = parse_alps(pdf_bytes)
    record = asyncio.run(build_record(pdf_bytes, chunks))
    return pdf_bytes, rows, chunks, record


def test_chunk_count_pinned(alps):
    """Regression pin for the eval corpus under the reference-parity
    segmentation (small unstructured-style elements, not the round-2
    102 coarse chunks)."""
    _, _, chunks, _ = alps
    assert len(chunks) == 173
    pages = {c.page_number for c in chunks}
    assert min(pages) == 1 and max(pages) == 25


def test_every_ground_truth_fact_survives_parsing(alps):
    """39 questions; at most one fact may fail to map to a single chunk
    (at reference-parity granularity one multi-sentence fact straddles
    a chunk boundary, so no single chunk covers >=80% of its trigrams —
    the text itself is fully preserved, as the union coverage shows)."""
    _, rows, chunks, _ = alps
    truth = fact_relevance(chunks, rows)
    assert len(truth) == 39
    unmapped = [i for i, t in enumerate(truth) if not t]
    assert len(unmapped) <= 1
    # the straddled fact is still fully present in the concatenated text
    import re

    all_text = " ".join(c.text for c in chunks)
    all_tokens = set(re.findall(r"[a-z0-9]+", all_text.lower()))
    for i in unmapped:
        for fact in rows[i]["facts"]:
            fact_tokens = re.findall(r"[a-z0-9]+", fact.lower())
            covered = sum(1 for t in fact_tokens if t in all_tokens)
            assert covered / max(len(fact_tokens), 1) >= 0.9


def test_bm25_quality_floors(alps):
    """Measured quality on the real corpus at reference-parity chunk
    granularity, frozen as floors: recall@1 0.821, recall@7 0.949,
    MRR 0.858 (finer chunks score lower than round 2's 102 coarse
    chunks — this is the apples-to-apples granularity the reference
    itself serves)."""
    from dial_rag_tpu.retrieval import Bm25Retriever

    _, rows, chunks, record = alps
    truth = fact_relevance(chunks, rows)
    retriever = Bm25Retriever.from_doc_records([record], k=7)
    all_hits = [
        asyncio.run(retriever.aretrieve(r["question"])) for r in rows
    ]
    m = score(all_hits, truth, chunks)
    assert m["recall@1"] >= 0.82
    assert m["recall@7"] >= 0.94
    assert m["mrr"] >= 0.85


# ---------------------------------------------------------------- parity
# (tests/data corpus: the reference's exact-chunk goldens)


@pytest.fixture(scope="module")
def parity_chunks():
    from dial_rag_tpu.documents.parser import parse_document

    pdf_bytes = TESTS_ALPS_PDF.read_bytes()
    return pdf_bytes, parse_document(
        pdf_bytes,
        "application/pdf",
        source_link="alps_wiki.pdf",
        display_name="alps_wiki.pdf",
    )


def test_parity_chunk_count(parity_chunks):
    """Chunk count EQUALS the reference's 177 (reference
    tests/test_retrievers.py:63) under the calibrated char_margin
    (docs/chunking_parity.md)."""
    _, chunks = parity_chunks
    assert len(chunks) == 177
    pages = {c.page_number for c in chunks}
    assert min(pages) == 1 and max(pages) == 26


def test_parity_bm25_cadibona_exact_reference_golden(parity_chunks):
    """THE reference golden, exact: BM25 'Colle di Cadibona' retrieves
    chunk id 31 on page 3 (reference tests/test_retrievers.py:82-88)."""
    from dial_rag_tpu.retrieval import Bm25Retriever

    pdf_bytes, chunks = parity_chunks
    record = asyncio.run(build_record(pdf_bytes, chunks))
    retriever = Bm25Retriever.from_doc_records([record], k=7)
    hits = asyncio.run(retriever.aretrieve("Colle di Cadibona"))
    top = hits[0]
    assert top.chunk_id == 31
    assert chunks[31].page_number == 3
    assert "Colle di Cadibona" in chunks[31].text


def test_parity_climate_chunk_text_exact(parity_chunks):
    """The reference's semantic golden pins chunk 103 page 10 with an
    exact text prefix (reference tests/test_retrievers.py:90-104);
    this pipeline produces that chunk byte-identically at id 104."""
    _, chunks = parity_chunks
    matches = [
        (i, c)
        for i, c in enumerate(chunks)
        if c.text.startswith(
            "Climate\n\n"
            "The Alps are a classic example of what happens when a "
            "temperate area at lower altitude gives way to "
            "higher-elevation terrain."
        )
    ]
    assert len(matches) == 1
    i, c = matches[0]
    # reference: 103. FROZEN at 104 (round 5): the reference's caches
    # record zero chunks from pages 5-11, so the boundary is
    # unpinnable without bug-compatible replication of unverifiable
    # decisions — see docs/chunking_parity.md "Closure (round 5)".
    assert i == 104
    assert c.page_number == 10


def test_parity_recorded_oracle_chunks(parity_chunks):
    """Chunk texts recorded in the reference's own cached traffic must
    reproduce byte-for-byte. 20 of 22 match; the two exceptions are
    pinned divergences (docs/chunking_parity.md): the page-1 infobox
    country fragments and one page-17 split-line ordering the
    reference itself garbles."""
    _, chunks = parity_chunks
    oracle = json.load(open(ORACLE_FIXTURE))
    mine = {c.text for c in chunks}
    missed = [o for o in oracle if o["text"] not in mine]
    assert len(oracle) == 22
    assert len(missed) == 2, [o["text"][:60] for o in missed]
    missed_pages = sorted(o["page"] for o in missed)
    assert missed_pages == [1, 17]


@pytest.mark.skipif(
    not __import__("os").environ.get("DIAL_RAG__EMBEDDER__MODEL_PATH"),
    reason="needs a real bge-small-en checkpoint artifact",
)
def test_semantic_climate_golden(alps):
    """Reference contract with real weights: semantic 'climate'
    retrieves the climate section (reference test_retrievers.py:90-104
    pins chunk 103 page 10). Lights up when a checkpoint is provided
    via DIAL_RAG__EMBEDDER__MODEL_PATH."""
    import os

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.retrieval import SemanticRetriever

    pdf_bytes, _, chunks, _ = alps
    embedder = BgeEmbedder.from_hf_checkpoint(
        os.environ["DIAL_RAG__EMBEDDER__MODEL_PATH"]
    )
    record = asyncio.run(build_record(pdf_bytes, chunks, embedder))
    retriever = SemanticRetriever.from_doc_records(embedder, [record], k=7)
    hits = asyncio.run(retriever.aretrieve("climate"))
    assert "climate" in chunks[hits[0].chunk_id].text.lower()


CHECKPOINTS = Path(__file__).parent.parent / "checkpoints"


@pytest.mark.skipif(
    not (CHECKPOINTS / "alps-cls-kd" / "model.safetensors").is_file(),
    reason="first-party checkpoint artifact not present",
)
def test_first_party_checkpoint_loads_and_discriminates():
    """The committed first-party checkpoint (tools/make_checkpoint.py)
    must load through the standard HF-layout loader and produce a
    discriminative embedding space (quality numbers live in
    eval/out/alps_metrics.json; this is the fast structural pin)."""
    import numpy as np

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    emb = BgeEmbedder.from_hf_checkpoint(str(CHECKPOINTS / "alps-cls-kd"))
    docs = emb.embed_documents(
        [
            "The Alps are the highest mountain range in Europe.",
            "Glaciers carved the valleys during the ice ages.",
            "Cheese fondue is a traditional alpine dish.",
        ]
    )
    q = emb.embed_query("highest mountains of Europe")
    sims = docs @ q
    assert docs.shape == (3, 384)
    assert np.isfinite(sims).all()
    # embeddings are unit-norm and the space has spread (exact quality
    # numbers live in eval/out/alps_metrics.json, regenerated by
    # eval/eval_alps.py --model-dir)
    np.testing.assert_allclose(
        np.linalg.norm(docs, axis=1), 1.0, atol=1e-3
    )
    assert float(sims.max() - sims.min()) > 1e-4
    assert float(np.abs(docs[0] - docs[2]).max()) > 1e-3


@pytest.mark.skipif(
    not (CHECKPOINTS / "alps-maxsim" / "idf_pooling.npz").is_file(),
    reason="idf pooling artifact not present",
)
def test_idf_pooling_artifact_serves_semantic_arm():
    """checkpoints/alps-maxsim carries an idf_pooling.npz table
    (tools/make_idf_pooling.py), so the standard loader serves it with
    idf-weighted token pooling — the single-vector semantic arm
    (measured recall@7 0.821 on the real corpus with the 75k trunk —
    see eval/out/alps_metrics.json, the single source for quality
    numbers). Structural pin: pooling mode, no query instruction, and
    a topically discriminative space."""
    import numpy as np

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder

    emb = BgeEmbedder.from_hf_checkpoint(str(CHECKPOINTS / "alps-maxsim"))
    assert emb.encoder.pooling == "idf"
    assert emb.query_instruction == ""
    docs = emb.embed_documents(
        [
            "The climate of the Alps is shaped by altitude and latitude.",
            "Cheese fondue is a traditional alpine dish.",
        ]
    )
    s_climate = docs @ emb.embed_query("climate altitude weather")
    s_food = docs @ emb.embed_query("traditional food")
    assert s_climate[0] > s_climate[1], s_climate
    assert s_food[1] > s_food[0], s_food


def test_bootstrap_and_paired_delta_cis():
    """CI machinery: degenerate all-ones data has a point CI; a clear
    paired improvement excludes zero; a noisy tie does not."""
    from eval.eval_alps import bootstrap_ci, paired_delta_ci

    lo, hi = bootstrap_ci([1.0] * 30)
    assert lo == hi == 1.0
    a = [1.0] * 25 + [0.0] * 5
    b = [0.0] * 25 + [1.0] * 5
    d = paired_delta_ci(a, b)
    assert d["mean"] == pytest.approx(20 / 30)
    assert d["excludes_zero"] is True
    tie = paired_delta_ci([1, 0] * 15, [0, 1] * 15)
    assert tie["excludes_zero"] is False


def test_pseudo_queries_expand_ground_truth():
    """Word-dropout fact variants: every pseudo row keeps its source
    fact as the relevance label, queries differ from the fact, and the
    expansion reaches n>=150 combined with the 39 real questions."""
    from eval.eval_alps import make_pseudo_queries

    rows = [
        {
            "question": f"q{i}",
            "facts": [
                f"fact {i} about the alps with many words number "
                f"{i} trailing detail clause for dropout room"
            ],
        }
        for i in range(39)
    ]
    pseudo = make_pseudo_queries(rows)
    assert len(pseudo) + len(rows) >= 150
    for p in pseudo[:20]:
        assert p["facts"][0] != p["question"]
        assert set(p["question"].split()) <= set(p["facts"][0].split())


def test_handmade_questions_fixture_integrity(alps):
    """The 155 hand-authored questions: every verbatim fact attaches to
    at least one chunk under the production labeler (so the rows carry
    real ground truth), no fact is over-broad (>3 relevant chunks would
    mean it stopped discriminating), and the questions are PARAPHRASES
    — mean question-fact lexical overlap well below the dropout
    pseudo-queries' 1.0 — so the block measures open-domain phrasing,
    not verbatim lookup."""
    import re as _re

    from eval.eval_alps import fact_relevance, load_handmade_questions

    _, _, chunks, _ = alps
    hm_rows = load_handmade_questions()
    assert len(hm_rows) >= 150
    truth = fact_relevance(chunks, hm_rows)
    assert sum(1 for t in truth if not t) == 0
    assert all(len(t) <= 3 for t in truth)

    def norm(s):
        return set(_re.findall(r"[a-z0-9]+", s.lower()))

    overlaps = []
    for row in hm_rows:
        qt = norm(row["question"])
        ft = set().union(*(norm(f) for f in row["facts"]))
        overlaps.append(len(qt & ft) / max(len(qt), 1))
    assert sum(overlaps) / len(overlaps) < 0.6


def test_answer_citation_eval_through_real_rewriter():
    """The --answers mode drives the REAL streaming citation rewriter:
    a doc covering the answer is cited and scored precise (it contains
    the fact); uncovered facts lower citation_recall; a question whose
    retrieval surfaces no overlapping doc stays unanswered."""
    from types import SimpleNamespace

    from eval.eval_alps import eval_answers

    chunks = [
        SimpleNamespace(
            text="the southern boundary of the alps is colle di cadibona "
            "which marks the edge"
        ),
        SimpleNamespace(text="completely unrelated text about glaciers"),
        SimpleNamespace(text="another unrelated chunk entirely"),
    ]
    hit = lambda c: SimpleNamespace(chunk_id=c)  # noqa: E731
    rows = [
        {
            "question": "what is the southern boundary of the alps",
            "answer": "the southern boundary of the alps is colle di cadibona",
            "facts": [
                "the southern boundary of the alps is colle di cadibona "
                "which marks the edge"
            ],
        },
        {
            "question": "what color is the sky on mars exactly",
            "answer": "butterscotch at noon on mars generally speaking",
            "facts": ["the martian sky is butterscotch"],
        },
    ]
    truth = [{0}, set()]
    all_hits = [[hit(0), hit(1)], [hit(1), hit(2)]]
    out = asyncio.run(eval_answers(all_hits, rows, chunks, truth))
    assert out["answered_rate"] == 0.5  # q2 cites nothing
    assert out["citation_precision"] == 1.0  # the one citation is exact
    assert out["citation_recall"] == 0.5  # q2's fact uncovered
    assert out["faithfulness"] == 1.0


def test_published_quality_artifact_is_real_and_meets_floors():
    """eval/out/alps_metrics.json is the quality artifact a reader will
    quote; it must carry trained-model provenance (round-2 review: no
    random-weight rows posing as quality numbers) and meet the measured
    floors (measured with the per-arm pairing serving ships:
    late-interaction = the 75k-step MaxSim trunk, semantic = the
    100k-step low-final-LR trunk via idf pooling): late-interaction
    0.821/0.949 r@1/r@7 — recall EQUAL to the BM25 teacher; semantic
    0.692/0.872 — ABOVE the review's 0.85 credibility target; and the
    all-arm RRF ensemble 0.821/0.974 with MRR 0.871 — above the BM25
    teacher on BOTH recall@7 and MRR."""
    artifact = (
        Path(__file__).parent.parent / "eval" / "out" / "alps_metrics.json"
    )
    if not artifact.is_file():
        pytest.skip("eval artifact not generated")
    m = json.load(open(artifact))
    assert "random" not in str(m["semantic_model"])
    assert "random" not in str(m["late_interaction_model"])
    assert m["bm25"]["recall@7"] >= 0.94
    assert m["late_interaction"]["recall@7"] >= 0.94
    assert m["late_interaction"]["recall@1"] >= 0.8
    assert m["ensemble"]["recall@7"] >= 0.97
    assert m["ensemble"]["recall@7"] > m["bm25"]["recall@7"]
    assert m["ensemble"]["recall@1"] >= 0.8
    assert m["ensemble"]["mrr"] > m["bm25"]["mrr"]
    assert m["semantic"]["recall@7"] >= 0.85
    assert m["semantic"]["recall@1"] >= 0.65


def test_published_synthetic_artifact_is_real_and_meets_floors():
    """eval/out/metrics.json (synthetic corpus) must also carry
    trained-model provenance and meet measured floors — a plain
    ``eval_retriever`` run without --model-dir writes random-weight
    rows into the same path, which must never be committed (round-2
    review: no random-weight rows posing as quality numbers)."""
    artifact = Path(__file__).parent.parent / "eval" / "out" / "metrics.json"
    if not artifact.is_file():
        pytest.skip("eval artifact not generated")
    m = json.load(open(artifact))
    # eval_retriever writes "random-weights" when --model-dir is omitted
    assert m.get("model") not in (None, "", "random-weights"), (
        "missing trained semantic checkpoint provenance"
    )
    assert m.get("late_interaction_model") not in (
        None, "", "random-weights",
    ), "missing trained LI checkpoint provenance"
    assert m["bm25"]["recall@1"] >= 0.99
    # idf-pooled semantic arm (100k low-final-LR trunk): 0.717/0.917
    assert m["semantic"]["recall@7"] >= 0.9
    assert m["semantic"]["recall@1"] >= 0.7
    # 75k-step MaxSim trunk: measured 0.933/1.000
    assert m["late_interaction"]["recall@7"] >= 0.98
    assert m["late_interaction"]["recall@1"] >= 0.9
    assert m["ensemble"]["recall@7"] >= 0.98


def test_html_format_transfer_eval_mechanics():
    """The html_corpus block of eval_alps (format-transfer: same
    questions over the reference's HTML rendition through the
    first-party HTML parser) must run end to end: chunks parse, every
    retained question keeps >=1 mapped relevant chunk, BM25 scores
    sanely on the re-chunked corpus (quality numbers live in
    eval/out/alps_metrics.json; this pins the mechanics hermetically
    with a tiny random LI embedder)."""
    from eval.eval_alps import HTML_CORPUS_PATH, eval_html_corpus, load_alps

    html_path = Path(HTML_CORPUS_PATH)
    if not html_path.is_file():
        pytest.skip("reference HTML corpus not mounted")

    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.models.tokenizer import build_test_vocab

    _, rows = load_alps()
    rows = rows[:5]
    words = sorted(
        {w for r in rows for w in r["question"].lower().split()}
        | set("alps mountain climate glacier europe range".split())
    )
    li_embedder = BgeEmbedder.from_random(
        vocab=build_test_vocab(words, size=2048), batch_size=32
    )
    li_embedder.max_len = (
        li_embedder.encoder.config.max_position_embeddings
    )
    out = asyncio.run(
        eval_html_corpus(html_path, rows, None, li_embedder)
    )
    assert out["n_chunks"] > 50
    assert out["n_questions"] + out["dropped_unmapped_questions"] == 5
    assert out["n_questions"] >= 1
    # the HTML re-chunking must not break lexical retrieval
    assert out["bm25"]["recall@7"] >= 0.8
    assert "ensemble" not in out  # no semantic embedder passed
