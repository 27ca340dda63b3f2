"""Boot-from-preset e2e matrix: every shipped config/*.yaml must boot
the real app through the production loader path (DIAL_RAG__CONFIG_PATH
env -> load_app_config -> create_app) and the arms the preset configures
must actually engage on a request.

This closes the gap where a preset could validate against the schema
(tests/test_app_config.py) yet never be exercised end to end — in
particular the deployable quality winner config/zero_egress_tuned.yaml,
whose chargram + late-interaction arms must appear as retrieval stages.

Reference preset surface: /root/reference/config/azure_description.yaml
et al.; the reference has no boot matrix either — this is stricter.
"""

import json
import pathlib

import pytest
from aiohttp.test_utils import TestClient, TestServer

from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.models.tokenizer import build_test_vocab
from dial_rag_tpu.service.app import create_app
from dial_rag_tpu.service.config import load_app_config
from tests.test_app_e2e import VOCAB_WORDS, _big_pdf_lines
from tests.utils.fake_dial import FakeDialCore
from tests.utils.pdf_builder import build_pdf

PRESET_DIR = pathlib.Path(__file__).parent.parent / "config"


@pytest.fixture(scope="module")
def embedder():
    return BgeEmbedder.from_random(
        vocab=build_test_vocab(VOCAB_WORDS + ["?", ":"]), batch_size=8
    )

# the corpus must beat the 12kB all-documents short-circuit or no
# search arm runs at all
_N_PAGES = 8

# page-description JSON the scripted vision LLM returns (one per page)
_PAGE_DESCRIPTIONS = tuple(
    '{"page_summary": "Alps overview with the Cadibona boundary, page %d.",'
    ' "keyfact": "Colle di Cadibona is the southern boundary.",'
    ' "image_quality": {"level": "normal", "explanation": "text page"}}'
    % p
    for p in range(_N_PAGES)
)

# preset -> (stages that must appear, stages that must NOT appear)
PRESET_STAGES = {
    "aws_description.yaml": (["Page image search"], ["Multimodal search"]),
    "aws_embedding.yaml": (["Multimodal search"], ["Page image search"]),
    "azure_description.yaml": (["Page image search"], ["Multimodal search"]),
    "azure_embedding.yaml": (["Multimodal search"], ["Page image search"]),
    "azure_with_gcp_embedding.yaml": (
        ["Multimodal search"],
        ["Page image search"],
    ),
    "gcp_description.yaml": (["Page image search"], ["Multimodal search"]),
    "gcp_embedding.yaml": (["Multimodal search"], ["Page image search"]),
    "zero_egress_tuned.yaml": (
        # the tuned profile's fused arms: BM25 + late interaction +
        # chargram (semantic weight 0 still builds/runs its stage)
        ["Late interaction search", "Fuzzy keywords search",
         "Keywords search"],
        ["Multimodal search", "Page image search"],
    ),
}


def test_matrix_covers_every_shipped_preset():
    assert sorted(p.name for p in PRESET_DIR.glob("*.yaml")) == sorted(
        PRESET_STAGES
    )


@pytest.mark.parametrize("preset_name", sorted(PRESET_STAGES))
async def test_boot_from_preset_engages_configured_arms(
    preset_name, embedder
):
    """Boot the app exactly as a deployment would (env-driven config
    path), run one retrieval request with remote models scripted, and
    assert the preset's arms produced their stages."""
    expected, absent = PRESET_STAGES[preset_name]
    fake = FakeDialCore()
    dial_url = await fake.start()
    fake.add_file(
        "files/user-bucket/alps.pdf",
        build_pdf(_big_pdf_lines(_N_PAGES), compress=True),
        "application/pdf",
    )
    if "description" in preset_name:
        fake.script_llm(*_PAGE_DESCRIPTIONS)

    app_config = load_app_config(
        environ={
            "DIAL_RAG__CONFIG_PATH": str(PRESET_DIR / preset_name),
            "DIAL_RAG__DIAL_URL": dial_url,
        }
    )
    # the tuned preset mounts the shipped first-party checkpoints: boot
    # through the production embedder build; the reference presets
    # assume the image-baked bge model (zero egress here), so the tiny
    # test embedder stands in for it
    use_config_embedder = bool(app_config.embedder.model_path)
    app = create_app(
        app_config, embedder=None if use_config_embedder else embedder
    )
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    try:
        resp = await client.post(
            "/openai/deployments/dial-rag/chat/completions",
            json={
                "stream": False,
                "messages": [
                    {
                        "role": "user",
                        "content": "southern boundary of the Alps?",
                        "custom_content": {
                            "attachments": [
                                {"url": "files/user-bucket/alps.pdf"}
                            ]
                        },
                    }
                ],
                "custom_fields": {
                    "configuration": {"request": {"type": "retrieval"}}
                },
            },
            headers={"api-key": "test-key"},
        )
        assert resp.status == 200, await resp.text()
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stages = [s["name"] for s in custom["stages"]]
        for name in expected:
            assert any(name in s for s in stages), (preset_name, stages)
        for name in absent:
            assert not any(name in s for s in stages), (preset_name, stages)
        payload = json.loads(
            [
                a
                for a in custom["attachments"]
                if a.get("type")
                == "application/x.aidial-rag.retrieval-response+json"
            ][0]["data"]
        )
        assert payload["chunks"], preset_name
    finally:
        await client.close()
        await fake.stop()
