"""End-to-end app tests against a fake Dial Core (hermetic, no egress).

The analogue of the reference's tiers-3 e2e tests (tests/test_app.py et
al.): the full service runs in-process, documents are served over real
HTTP by the fake core, LLM/embeddings responses are scripted."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from dial_rag_tpu.embeddings.embedder import BgeEmbedder
from dial_rag_tpu.models.tokenizer import build_test_vocab
from dial_rag_tpu.service.app import create_app
from dial_rag_tpu.service.config import AppConfig
from tests.utils.fake_dial import FakeDialCore
from tests.utils.pdf_builder import build_pdf

ALPS_PDF_LINES = [
    [
        (72, 720, 18, "The Alps"),
        (72, 695, 11, "The Alps are the highest mountain range entirely in Europe."),
        (72, 680, 11, "Colle di Cadibona marks the southern boundary of the Alps."),
    ],
    [
        (72, 720, 18, "Climate"),
        (72, 695, 11, "The climate in the Alps varies with elevation and latitude."),
    ],
]

VOCAB_WORDS = sorted(
    set(
        "the alps are highest mountain range entirely in europe colle di "
        "cadibona marks southern boundary of climate varies with elevation "
        "and latitude what is represent this question for searching "
        "relevant passages".split()
    )
)


@pytest.fixture(scope="module")
def embedder():
    return BgeEmbedder.from_random(
        vocab=build_test_vocab(VOCAB_WORDS + ["?", ":"]), batch_size=8
    )


class AppHarness:
    def __init__(self, fake: FakeDialCore, client: TestClient):
        self.fake = fake
        self.client = client

    async def chat(self, payload: dict, stream: bool = False):
        payload = {"stream": stream, **payload}
        # disable the remote-LLM description index by default (it defaults
        # to ON, and app-level None is dropped by exclude_none — reference
        # behavior); tests that want it pass their own custom_fields
        custom_fields = payload.setdefault("custom_fields", {})
        configuration = custom_fields.setdefault("configuration", {})
        configuration.setdefault("indexing", {}).setdefault(
            "description_index", None
        )
        resp = await self.client.post(
            "/openai/deployments/dial-rag/chat/completions",
            json=payload,
            headers={"api-key": "test-key"},
        )
        return resp


@pytest.fixture
def harness(embedder):
    """Async harness factory: each (async) test runs in its own event loop,
    so the fake core + app server boot inside the test's loop."""
    from contextlib import asynccontextmanager

    @asynccontextmanager
    async def make(
        app_config_overrides: dict | None = None,
        config_embedder: bool = False,
    ):
        """``config_embedder=True`` lets the app build its embedder from
        ``app_config.embedder.model_path`` (the production path) instead
        of injecting the shared tiny test embedder."""
        fake = FakeDialCore()
        dial_url = await fake.start()
        pdf = build_pdf(ALPS_PDF_LINES, compress=True)
        fake.add_file("files/user-bucket/alps.pdf", pdf, "application/pdf")

        config_dict = {
            "dial_url": dial_url,
            "request": {"indexing": {"description_index": None}},
        }
        if app_config_overrides:
            from dial_rag_tpu.service.config import deep_merge

            config_dict = deep_merge(config_dict, app_config_overrides)
        app_config = AppConfig.model_validate(config_dict)
        app = create_app(
            app_config, embedder=None if config_embedder else embedder
        )
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            yield AppHarness(fake, client)
        finally:
            await client.close()
            await fake.stop()

    return make


def _attach_message(text: str, url: str = "files/user-bucket/alps.pdf"):
    return {
        "role": "user",
        "content": text,
        "custom_content": {"attachments": [{"url": url}]},
    }


async def test_request_emits_telemetry_spans_and_counters(harness):
    """The OTel story the reference gets from aidial-sdk (reference
    log_config.py:65-75, main.py:19): one rag_request root span, stage
    spans parented under it, encode-dispatch spans parented under
    stages, and counters for tokens/chunks/index-cache traffic — all
    collected by an in-process exporter."""
    from dial_rag_tpu import telemetry

    exporter = telemetry.InMemorySpanExporter()
    previous = telemetry.provider()
    telemetry.set_provider(telemetry.TracerProvider([exporter]))
    telemetry.metrics().reset()
    try:
        async with harness() as h:
            h.fake.script_llm("Cadibona. <[1]>")
            resp = await h.chat(
                {"messages": [_attach_message("southern boundary?")]}
            )
            assert resp.status == 200

        (request_span,) = exporter.find("rag_request")
        assert request_span.attributes["dial_rag.request_type"] == "rag"
        assert request_span.attributes["dial_rag.attachments"] == 1
        request_sc = request_span.get_span_context()

        stage_spans = exporter.find("stage: ")
        assert any("Processing document" in s.name for s in stage_spans)
        assert any(
            "Prepare indexes for search" in s.name for s in stage_spans
        )
        # stages parent under the request span, same trace
        for s in stage_spans:
            assert s.get_span_context().trace_id == request_sc.trace_id
            assert s.parent is not None

        # encode dispatches are children of stages (context crossed the
        # dispatch-pool thread boundary)
        encode_spans = exporter.find("encode_dispatch")
        assert encode_spans, [s.name for s in exporter.spans]
        stage_ids = {s.get_span_context().span_id for s in stage_spans}
        assert any(s.parent.span_id in stage_ids for s in encode_spans)

        m = telemetry.metrics()
        assert m.total("dial_rag.tokens_encoded") > 0
        assert m.total("dial_rag.chunks_indexed") > 0
        # first request: one miss (no cached index yet)
        assert m.total("dial_rag.index_cache.misses") >= 1
    finally:
        telemetry.set_provider(previous)
        telemetry.metrics().reset()


async def test_rag_request_with_citations(harness):
    async with harness() as h:
        h.fake.script_llm(
            "The southern boundary is Colle di Cadibona. <[2]>"
        )
        resp = await h.chat(
            {"messages": [_attach_message("What bounds the Alps in the south?")]}
        )
        assert resp.status == 200
        body = await resp.json()
        message = body["choices"][0]["message"]

        # citation rewritten to [1]
        assert "Colle di Cadibona. [1]" in message["content"]

        custom = message["custom_content"]
        stage_names = [s["name"] for s in custom["stages"]]
        assert any("Processing document 'alps.pdf'" in n for n in stage_names)
        assert any("Store indexes" in n for n in stage_names)
        assert any("Prepare indexes for search" in n for n in stage_names)
        assert any("Standalone question" in n for n in stage_names)
        # every stage completes except "Load indexes" which fails on the
        # first-request cache miss (reference FailStageException pattern)
        for s in custom["stages"]:
            if "Load indexes" in s["name"]:
                assert s["status"] == "failed"
            else:
                assert s["status"] == "completed", s
        # elapsed time appended to stage names
        assert any("s]" in n for n in stage_names)

        # cited chunk attached with reference index
        attachments = custom["attachments"]
        assert attachments[0]["title"].startswith("[1] ")
        assert attachments[0]["reference_url"].startswith(
            "files/user-bucket/alps.pdf"
        )

        # state carries config + repository digests
        assert "config_digest" in custom["state"]
        assert "repository_digest" in custom["state"]


async def test_streaming_rag(harness):
    async with harness() as h:
        h.fake.script_llm("Streamed answer about the Alps. <[1]>")
        resp = await h.chat(
            {"messages": [_attach_message("Tell me about the Alps")]},
            stream=True,
        )
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        raw = await resp.text()
        chunks = [
            json.loads(line[len("data: ") :])
            for line in raw.splitlines()
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        content = "".join(
            c["choices"][0]["delta"].get("content", "")
            for c in chunks
            if c.get("choices")
        )
        assert "Streamed answer about the Alps. [1]" in content
        assert raw.strip().endswith("data: [DONE]")


async def test_retrieval_request_type(harness):
    async with harness() as h:
        resp = await h.chat(
            {
                "messages": [_attach_message("cadibona boundary")],
                "custom_fields": {"configuration": {"request": {"type": "retrieval"}}},
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        retrieval_attachments = [
            a
            for a in custom["attachments"]
            if a.get("type") == "application/x.aidial-rag.retrieval-response+json"
        ]
        assert len(retrieval_attachments) == 1
        payload = json.loads(retrieval_attachments[0]["data"])
        assert payload["chunks"], "retrieval response should contain chunks"
        texts = " ".join(c["text"] or "" for c in payload["chunks"])
        assert "Cadibona" in texts
        first = payload["chunks"][0]
        assert first["attachment_url"] == "files/user-bucket/alps.pdf"
        assert first["source"]["url"].startswith("files/user-bucket/alps.pdf#page=")


async def test_indexing_request_type(harness):
    async with harness(
        {"index_storage": {"use_dial_file_storage": True}}
    ) as h:
        resp = await h.chat(
            {
                "messages": [_attach_message("")],
                "custom_fields": {"configuration": {"request": {"type": "indexing"}}},
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        attachments = custom["attachments"]
        index_att = [
            a
            for a in attachments
            if a.get("type", "").startswith("application/x.aidial-rag.index.")
        ]
        assert len(index_att) == 1
        assert index_att[0]["reference_url"] == "files/user-bucket/alps.pdf"
        # the index was actually uploaded to the fake file storage
        assert any(
            "dial-rag-index" in path for path in h.fake.files
        ), h.fake.files.keys()
        results_att = [
            a
            for a in attachments
            if a.get("type") == "application/x.aidial-rag.indexing-response+json"
        ]
        assert len(results_att) == 1
        assert json.loads(results_att[0]["data"])["indexing_result"] == {}


async def test_index_reused_on_second_request(harness):
    async with harness() as h:
        h.fake.script_llm("Answer one.", "Answer two.")
        await h.chat({"messages": [_attach_message("first question")]})
        resp = await h.chat({"messages": [_attach_message("second question")]})
        body = await resp.json()
        stage_names = [
            s["name"]
            for s in body["choices"][0]["message"]["custom_content"]["stages"]
        ]
        assert any("Load indexes for 'alps.pdf'" in n for n in stage_names)
        assert not any("Processing document" in n for n in stage_names)


async def test_document_error_table(harness):
    async with harness() as h:
        resp = await h.chat(
            {"messages": [_attach_message("hi", url="files/user-bucket/missing.pdf")]}
        )
        assert resp.status == 200
        body = await resp.json()
        content = body["choices"][0]["message"]["content"]
        assert "can't process the documents" in content
        assert "|missing.pdf|" in content


async def test_standalone_question_on_multiturn(harness):
    async with harness() as h:
        h.fake.script_llm(
            "what is the southern boundary of the alps?",  # tool call answer
            "It is Colle di Cadibona. <[1]>",
        )
        resp = await h.chat(
            {
                "messages": [
                    _attach_message("Tell me about the Alps"),
                    {"role": "assistant", "content": "The Alps are mountains. [1]"},
                    {"role": "user", "content": "what is its southern boundary?"},
                ]
            }
        )
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stage = next(
            s for s in custom["stages"] if s["name"].startswith("Standalone question")
        )
        assert "southern boundary of the alps" in stage["content"]
        # the assistant history sent to the LLM restored <[1]> citation form
        answer_request = h.fake.llm_requests[-1]
        assistant_msgs = [
            m for m in answer_request["messages"] if m["role"] == "assistant"
        ]
        assert any("<[1]>" in str(m.get("content")) for m in assistant_msgs)


async def test_configuration_endpoint(harness):
    async with harness() as h:
        resp = await h.client.get(
            "/openai/deployments/dial-rag/configuration"
        )
        assert resp.status == 200
        schema = await resp.json()
        assert "properties" in schema
        assert "request" in schema["properties"]
        assert "indexing" in schema["properties"]


async def test_health(harness):
    async with harness() as h:
        resp = await h.client.get("/health")
        assert resp.status == 200


async def test_retrieval_from_docx_attachment(harness):
    """Service-level drive of the native OOXML path: a DOCX attachment is
    parsed first-party (no LibreOffice) and its chunks are retrievable."""
    from tests.utils.office_builder import build_docx

    async with harness() as h:
        docx = build_docx(
            [
                ("The Alps", "Heading1"),
                ("Colle di Cadibona marks the southern boundary.", None),
                ("Climate varies with elevation and latitude.", None),
            ]
        )
        h.fake.add_file(
            "files/user-bucket/alps.docx",
            docx,
            "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document",
        )
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "cadibona boundary", url="files/user-bucket/alps.docx"
                    )
                ],
                "custom_fields": {
                    "configuration": {"request": {"type": "retrieval"}}
                },
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        payload = json.loads(
            [
                a
                for a in custom["attachments"]
                if a.get("type")
                == "application/x.aidial-rag.retrieval-response+json"
            ][0]["data"]
        )
        texts = " ".join(c["text"] or "" for c in payload["chunks"])
        assert "Cadibona" in texts


async def test_mesh_auto_enabled_on_multi_device(harness):
    """The CPU test mesh has 8 devices, so auto data-parallel kicks in:
    the app's embedder batches and semantic index rows shard over all 8."""
    async with harness() as h:
        app = h.client.server.app["dial_rag"]
        assert app.mesh is not None
        assert app.mesh.devices.size == 8
        assert app.embedder.mesh is app.mesh


async def test_mesh_disabled_by_config(harness):
    async with harness(
        {"parallel": {"data_parallel": False}}
    ) as h:
        app = h.client.server.app["dial_rag"]
        assert app.mesh is None


def _big_pdf_lines(n_pages=8):
    """Enough text that total chunk bytes exceed the 12kB all-documents
    short-circuit, forcing the retriever ensemble to run."""
    lines_per_page = 30
    pages = []
    for p in range(n_pages):
        lines = [(72, 740, 14, f"Section {p}")]
        y = 720
        for i in range(lines_per_page):
            lines.append(
                (72, y, 10,
                 f"the alps mountain range europe climate elevation boundary "
                 f"cadibona colle marks southern page {p} line {i}")
            )
            y -= 22
        pages.append(lines)
    return pages


async def test_multimodal_index_e2e(harness):
    """Remote page-image embedding index built through the fake Dial
    embeddings endpoint; retrieval still succeeds with the extra index
    in the RRF ensemble."""
    async with harness() as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "cadibona boundary", url="files/user-bucket/big.pdf"
                    )
                ],
                "custom_fields": {
                    "configuration": {
                        "request": {"type": "retrieval"},
                        "indexing": {
                            "multimodal_index": {
                                "embeddings_model": "mm-embed"
                            },
                            "description_index": None,
                        },
                    }
                },
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stages = [s["name"] for s in custom["stages"]]
        assert any("Multimodal search" in s for s in stages), stages
        payload = json.loads(
            [
                a
                for a in custom["attachments"]
                if a.get("type")
                == "application/x.aidial-rag.retrieval-response+json"
            ][0]["data"]
        )
        assert payload["chunks"]


async def test_description_index_e2e(harness):
    """Vision-LLM page descriptions: the scripted LLM returns JSON per
    page; the description chunks are embedded locally and searchable."""
    async with harness() as h:
        h.fake.script_llm(
            '{"page_summary": "First page about the Alps and Cadibona.",'
            ' "keyfact": "Cadibona is the southern boundary.",'
            ' "image_quality": {"level": "detailed",'
            ' "explanation": "small map labels"}}',
            '{"page_summary": "Second page about alpine climate.",'
            ' "keyfact": "Climate varies with elevation.",'
            ' "image_quality": {"level": "normal",'
            ' "explanation": "plain text page"}}',
        )
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "cadibona boundary", url="files/user-bucket/big.pdf"
                    )
                ],
                "custom_fields": {
                    "configuration": {
                        "request": {"type": "retrieval"},
                        "indexing": {"description_index": {}},
                    }
                },
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stages = [s["name"] for s in custom["stages"]]
        assert any("Page image search" in s for s in stages), stages
        # one vision-LLM call per page during the index build
        desc_calls = [
            r
            for r in h.fake.llm_requests
            if any(
                isinstance(c, dict) and c.get("type") == "image_url"
                for m in r.get("messages", [])
                for c in (
                    m.get("content")
                    if isinstance(m.get("content"), list)
                    else []
                )
            )
        ]
        assert len(desc_calls) == 8  # pages in _big_pdf_lines()


async def test_device_index_cache_hits_on_repeat_query(harness):
    """Second request over the same cached document reuses the
    HBM-resident semantic index (no host->device re-upload)."""
    async with harness() as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        app = h.client.server.app["dial_rag"]
        payload = {
            "messages": [
                _attach_message(
                    "cadibona boundary", url="files/user-bucket/big.pdf"
                )
            ],
            "custom_fields": {
                "configuration": {"request": {"type": "retrieval"}}
            },
        }
        assert (await h.chat(dict(payload))).status == 200
        misses = app.device_index_cache.misses
        assert misses >= 1
        assert (await h.chat(dict(payload))).status == 200
        assert app.device_index_cache.hits >= 1
        assert app.device_index_cache.misses == misses


async def test_multi_document_rag(harness):
    """Two attachments: both indexed, retrieval fuses across documents,
    citations reference the right document."""
    async with harness() as h:
        h.fake.add_file(
            "files/user-bucket/second.pdf",
            build_pdf(
                [
                    [
                        (72, 720, 18, "Mont Blanc"),
                        (72, 695, 11, "Mont Blanc is the highest mountain in the Alps."),
                    ]
                ],
                compress=True,
            ),
            "application/pdf",
        )
        h.fake.script_llm("Both documents discuss the Alps. <[1]>")
        msg = {
            "role": "user",
            "content": "What do the documents say about the Alps?",
            "custom_content": {
                "attachments": [
                    {"url": "files/user-bucket/alps.pdf"},
                    {"url": "files/user-bucket/second.pdf"},
                ]
            },
        }
        resp = await h.chat({"messages": [msg]})
        assert resp.status == 200
        body = await resp.json()
        msg_out = body["choices"][0]["message"]
        assert "Alps" in msg_out["content"]
        stages = [
            s["name"] for s in msg_out["custom_content"]["stages"]
        ]
        # both documents went through the pipeline
        assert any("alps.pdf" in s and "Processing" in s for s in stages)
        assert any("second.pdf" in s and "Processing" in s for s in stages)


async def test_malformed_body_returns_400(harness):
    async with harness() as h:
        resp = await h.client.post(
            "/openai/deployments/dial-rag/chat/completions",
            data=b"not json at all",
            headers={"api-key": "k", "Content-Type": "application/json"},
        )
        assert resp.status == 400
        body = await resp.json()
        assert body["error"]["type"] == "invalid_request_error"


async def test_stream_error_before_done(harness):
    """Mid-stream failures must surface as an error event BEFORE the
    [DONE] terminator (clients stop reading at [DONE])."""
    async with harness() as h:
        resp = await h.client.post(
            "/openai/deployments/dial-rag/chat/completions",
            json={
                "stream": True,
                "messages": [_attach_message("q")],
                "custom_fields": {
                    "configuration": {"no_such_field": True}
                },
            },
            headers={"api-key": "k"},
        )
        assert resp.status == 200
        raw = (await resp.read()).decode()
        events = [e for e in raw.split("\n\n") if e.startswith("data: ")]
        payloads = [e[len("data: "):] for e in events]
        assert payloads[-1] == "[DONE]"
        error_positions = [
            i for i, p in enumerate(payloads) if '"error"' in p
        ]
        assert error_positions, raw[-500:]
        assert error_positions[-1] < len(payloads) - 1  # before [DONE]
        # no finish_reason 'stop' after the error
        assert all(
            '"finish_reason":"stop"' not in p
            for p in payloads[error_positions[-1]:]
        )


async def test_assistant_last_message_is_400(harness):
    async with harness() as h:
        resp = await h.chat(
            {
                "messages": [
                    _attach_message("what is this?"),
                    {"role": "assistant", "content": "an answer"},
                ]
            }
        )
        assert resp.status == 400


async def test_absolute_index_url_cannot_exfiltrate(harness):
    """A user-supplied index attachment with an absolute URL must not be
    fetched/stored with the api-key (exfiltration regression); the
    request fails cleanly for that document."""
    async with harness(
        {"index_storage": {"use_dial_file_storage": True}}
    ) as h:
        resp = await h.chat(
            {
                "messages": [
                    {
                        "role": "user",
                        "content": "q",
                        "custom_content": {
                            "attachments": [
                                {"url": "files/user-bucket/alps.pdf"},
                                {
                                    "type": (
                                        "application/"
                                        "x.aidial-rag.index.v1+tpu"
                                    ),
                                    "url": "https://attacker.example/x",
                                    "reference_url": (
                                        "files/user-bucket/alps.pdf"
                                    ),
                                },
                            ]
                        },
                    }
                ]
            }
        )
        body = await resp.json()
        # either a clean 4xx or an error table; never a successful answer
        # built by talking to the attacker host
        if resp.status == 200:
            content = body["choices"][0]["message"]["content"]
            assert "error" in content.lower(), content
        else:
            assert 400 <= resp.status < 500


async def test_system_prompt_override(harness):
    """Per-request system prompt override reaches the LLM (mirror of
    reference test_system_prompt_override.py)."""
    async with harness() as h:
        h.fake.script_llm("overridden answer")
        resp = await h.chat(
            {
                "messages": [_attach_message("what is this?")],
                "custom_fields": {
                    "configuration": {
                        "qa_chain": {
                            "chat_chain": {
                                "system_prompt_template_override": (
                                    "CUSTOM SYSTEM PROMPT _date_"
                                )
                            }
                        }
                    }
                },
            }
        )
        assert resp.status == 200
        # find the chat LLM request the fake served and check its system msg
        chat_calls = [
            r
            for r in h.fake.llm_requests
            if r.get("messages")
            and r["messages"][0].get("role") == "system"
        ]
        assert chat_calls, "no LLM chat call recorded"
        system = chat_calls[-1]["messages"][0]["content"]
        assert system.startswith("CUSTOM SYSTEM PROMPT")
        assert "_date_" not in system  # template variable substituted


async def test_warmup_on_startup(harness):
    """warmup_on_startup compiles the serving programs during boot."""
    async with harness(
        {"embedder": {"warmup_on_startup": True}}
    ) as h:
        # startup completed means warmup ran without error; a request
        # still works
        resp = await h.chat(
            {
                "messages": [_attach_message("cadibona")],
                "custom_fields": {
                    "configuration": {"request": {"type": "retrieval"}}
                },
            }
        )
        assert resp.status == 200


async def test_concurrent_requests(harness):
    """8 concurrent requests: micro-batcher coalescing, device-cache
    single-flight, and pool lanes all under real concurrency."""
    async with harness() as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        payload = {
            "messages": [
                _attach_message(
                    "cadibona boundary", url="files/user-bucket/big.pdf"
                )
            ],
            "custom_fields": {
                "configuration": {"request": {"type": "retrieval"}}
            },
        }
        responses = await asyncio.gather(
            *(h.chat(dict(payload)) for _ in range(8))
        )
        assert all(r.status == 200 for r in responses)
        for r in responses:
            body = await r.json()
            attachments = body["choices"][0]["message"]["custom_content"][
                "attachments"
            ]
            payloads = [
                a
                for a in attachments
                if a.get("type")
                == "application/x.aidial-rag.retrieval-response+json"
            ]
            assert len(payloads) == 1
            assert json.loads(payloads[0]["data"])["chunks"]


async def test_list_content_rejected_with_curated_400(harness):
    async with harness() as h:
        resp = await h.chat(
            {
                "messages": [
                    {
                        "role": "user",
                        "content": [{"type": "text", "text": "hi"}],
                    }
                ]
            }
        )
        assert resp.status == 400
        body = await resp.json()
        assert "not a string" in body["error"]["message"]


async def test_late_interaction_index_e2e(harness):
    """Enabling the (off-by-default) late-interaction index builds
    per-token chunk embeddings, adds the MaxSim retriever stage, and
    retrieves the exact-match chunk (identical text = perfect MaxSim)."""
    async with harness(
        {"request": {"indexing": {"late_interaction_index": {}}}}
    ) as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        h.fake.script_llm("Cadibona bounds the Alps. <[1]>")
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "Colle di Cadibona marks the southern boundary"
                        " of the Alps.",
                        url="files/user-bucket/big.pdf",
                    )
                ]
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stage_names = [s["name"] for s in custom["stages"]]
        assert any("Late interaction search" in n for n in stage_names)
        li_stage = next(
            s for s in custom["stages"] if "Late interaction" in s["name"]
        )
        assert li_stage["status"] == "completed"
        # the retrieved chunks must be attached to the stage
        assert "cadibona" in li_stage["attachments"][0]["data"].lower()

        # the built index persists and reloads (format v2 round trip)
        resp2 = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "southern boundary?", url="files/user-bucket/big.pdf"
                    )
                ]
            }
        )
        assert resp2.status == 200
        body2 = await resp2.json()
        stages2 = [
            s["name"] for s in body2["choices"][0]["message"]["custom_content"]["stages"]
        ]
        assert any("Load indexes" in n for n in stages2)
        assert any("Late interaction search" in n for n in stages2)
        assert not any("Processing document" in n for n in stages2)


async def test_chargram_index_e2e(harness):
    """Enabling the (off-by-default) char-n-gram index persists surface
    word tokens, adds the fuzzy-keywords retriever stage, and retrieves
    the matching chunk through a MORPHOLOGICAL variant of its words (the
    arm's reason to exist); the persisted record round-trips."""
    async with harness(
        {"request": {"indexing": {"chargram_index": {}}}}
    ) as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        h.fake.script_llm("Cadibona bounds the Alps. <[1]>")
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        # 'boundaries' is a derivational variant of the
                        # document's 'boundary' — shared char grams must
                        # carry the match
                        "Colle di Cadibona southern boundaries",
                        url="files/user-bucket/big.pdf",
                    )
                ]
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stage_names = [s["name"] for s in custom["stages"]]
        assert any("Fuzzy keywords search" in n for n in stage_names)
        cg_stage = next(
            s for s in custom["stages"] if "Fuzzy keywords" in s["name"]
        )
        assert cg_stage["status"] == "completed"
        assert "cadibona" in cg_stage["attachments"][0]["data"].lower()

        # the persisted record (with the chargram_index field) reloads
        resp2 = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "southern boundary?", url="files/user-bucket/big.pdf"
                    )
                ]
            }
        )
        assert resp2.status == 200
        body2 = await resp2.json()
        stages2 = [
            s["name"]
            for s in body2["choices"][0]["message"]["custom_content"]["stages"]
        ]
        assert any("Load indexes" in n for n in stages2)
        assert any("Fuzzy keywords search" in n for n in stages2)
        assert not any("Processing document" in n for n in stages2)


async def test_rate_limit_storm_collapses_to_single_429(harness, monkeypatch):
    """A 429 storm on the remote embeddings model during a multimodal
    build must collapse the per-page ExceptionGroup into ONE 429
    response (the reference contract, errors.py:84-106) — not a 500 and
    not one error per page. Exercises _iter_leaf_exceptions +
    create_document_loading_exception on a real storm, end to end."""
    import dial_rag_tpu.retrieval.multimodal as mm

    # the storm is permanent; retrying would only run into the map's
    # wall-clock timeout, so let the first failure per page surface
    monkeypatch.setattr(mm, "MAX_RETRIES", 0)
    async with harness() as h:
        h.fake.embeddings_status = 429
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "cadibona boundary", url="files/user-bucket/big.pdf"
                    )
                ],
                "custom_fields": {
                    "configuration": {
                        "request": {"type": "retrieval"},
                        "indexing": {
                            "multimodal_index": {
                                "embeddings_model": "mm-embed"
                            },
                            "description_index": None,
                        },
                    }
                },
            }
        )
        assert resp.status == 429
        body = await resp.json()
        message = json.dumps(body)
        assert "Rate limit exceeded for mm-embed" in message


async def test_late_interaction_dedicated_checkpoint_e2e(harness):
    """indexing.late_interaction_index.model_path serves the MaxSim arm
    with its own encoder (e.g. the committed maxsim-objective artifact)
    while the semantic arm keeps the main embedder; the path is an
    IndexRebuildTrigger so different weights never reuse an index."""
    import pathlib

    ckpt = pathlib.Path(__file__).parent.parent / "checkpoints" / "alps-maxsim"
    if not (ckpt / "model.safetensors").is_file():
        import pytest

        pytest.skip("maxsim checkpoint artifact not present")
    async with harness(
        {
            "request": {
                "indexing": {
                    "late_interaction_index": {"model_path": str(ckpt)}
                }
            }
        }
    ) as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        h.fake.script_llm("Cadibona bounds the Alps. <[1]>")
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "Colle di Cadibona southern boundary",
                        url="files/user-bucket/big.pdf",
                    )
                ]
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stage_names = [s["name"] for s in custom["stages"]]
        assert any("Late interaction search" in n for n in stage_names)
        li_stage = next(
            s for s in custom["stages"] if "Late interaction" in s["name"]
        )
        assert li_stage["status"] == "completed"
        assert "cadibona" in li_stage["attachments"][0]["data"].lower()


async def test_embedder_change_invalidates_index(harness):
    """A persisted record must not be served with a different embedding
    model's query vectors: the weight identity (BgeEmbedder.model_id)
    is folded into IndexSettings by load_document, so swapping the
    embedder re-processes the document instead of loading the cache."""
    import dataclasses

    async with harness() as h:
        h.fake.script_llm("Answer one.", "Answer two.")
        await h.chat({"messages": [_attach_message("first question")]})
        application = h.client.app["dial_rag"]
        application.embedder = dataclasses.replace(
            application.embedder, model_id="checkpoints/other-weights"
        )
        resp = await h.chat({"messages": [_attach_message("second question")]})
        body = await resp.json()
        stage_names = [
            s["name"]
            for s in body["choices"][0]["message"]["custom_content"]["stages"]
        ]
        assert any("Processing document" in n for n in stage_names)


async def test_semantic_idf_checkpoint_e2e(harness):
    """The production embedder path end-to-end: the app builds its
    embedder from app_config.embedder.model_path pointing at the
    committed MaxSim trunk carrying idf_pooling.npz, so the semantic
    arm serves idf-weighted token pooling (and the index settings carry
    the checkpoint's model_id)."""
    import pathlib

    ckpt = pathlib.Path(__file__).parent.parent / "checkpoints" / "alps-maxsim"
    if not (ckpt / "idf_pooling.npz").is_file():
        import pytest

        pytest.skip("idf pooling artifact not present")
    async with harness(
        {"embedder": {"model_path": str(ckpt)}}, config_embedder=True
    ) as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        h.fake.script_llm("Cadibona bounds the Alps. <[1]>")
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "Colle di Cadibona southern boundary",
                        url="files/user-bucket/big.pdf",
                    )
                ]
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        app_obj = h.client.app["dial_rag"]
        assert app_obj.embedder.encoder.pooling == "idf"
        # identity = content hash only (re-minting weights in place must
        # invalidate persisted indexes; the same checkpoint at ANY other
        # mount path — even a different basename, as in
        # docker_compose_local — must NOT)
        assert app_obj.embedder.model_id.startswith("sha256:")
        emb_stage = next(
            s for s in custom["stages"] if "Embeddings search" in s["name"]
        )
        assert emb_stage["status"] == "completed"
        assert "cadibona" in emb_stage["attachments"][0]["data"].lower()


async def test_per_arm_checkpoint_pairing_e2e(harness):
    """The shipped production pairing in one app: the semantic arm
    serves checkpoints/alps-semantic (idf pooling) while the
    late-interaction arm serves checkpoints/alps-maxsim — both stages
    retrieve, and the two arms run different weights."""
    import pathlib

    ckpts = pathlib.Path(__file__).parent.parent / "checkpoints"
    sem, li = ckpts / "alps-semantic", ckpts / "alps-maxsim"
    if not all(
        (d / f).is_file()
        for d in (sem, li)
        for f in ("model.safetensors", "idf_pooling.npz")
    ):
        import pytest

        pytest.skip("checkpoint artifacts not present")
    async with harness(
        {
            "embedder": {"model_path": str(sem)},
            "request": {
                "indexing": {
                    "late_interaction_index": {"model_path": str(li)}
                }
            },
        },
        config_embedder=True,
    ) as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        h.fake.script_llm("Cadibona bounds the Alps. <[1]>")
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "Colle di Cadibona southern boundary",
                        url="files/user-bucket/big.pdf",
                    )
                ]
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        app_obj = h.client.app["dial_rag"]
        assert app_obj.embedder.encoder.pooling == "idf"
        li_emb = app_obj._get_li_embedder(
            app_obj.app_config.request
        )
        assert li_emb is not None
        assert li_emb.model_id != app_obj.embedder.model_id
        for stage_key in ("Embeddings search", "Late interaction search"):
            stage = next(
                s for s in custom["stages"] if stage_key in s["name"]
            )
            assert stage["status"] == "completed", stage_key
            assert "cadibona" in stage["attachments"][0]["data"].lower()


async def test_li_embedder_change_invalidates_index(harness):
    """The dedicated late-interaction checkpoint's CONTENT identity is
    a rebuild trigger too: config model_path alone is a path string, so
    re-minting weights in place would otherwise serve a persisted LI
    index built by the old weights. load_document folds
    li_embedder.model_id into IndexSettings; swapping it re-processes."""
    import dataclasses
    import pathlib

    ckpt = pathlib.Path(__file__).parent.parent / "checkpoints" / "alps-maxsim"
    if not (ckpt / "model.safetensors").is_file():
        import pytest

        pytest.skip("maxsim checkpoint artifact not present")
    overrides = {
        "request": {
            "indexing": {"late_interaction_index": {"model_path": str(ckpt)}}
        }
    }
    async with harness(overrides) as h:
        h.fake.script_llm("Answer one.", "Answer two.")
        await h.chat({"messages": [_attach_message("first question")]})
        application = h.client.app["dial_rag"]
        key = str(ckpt)
        application._li_embedders[key] = dataclasses.replace(
            application._li_embedders[key],
            model_id="checkpoints/alps-maxsim@re-minted",
        )
        resp = await h.chat({"messages": [_attach_message("second question")]})
        body = await resp.json()
        stage_names = [
            s["name"]
            for s in body["choices"][0]["message"]["custom_content"]["stages"]
        ]
        assert any("Processing document" in n for n in stage_names)


async def test_retrieval_with_score_fusion_config(harness):
    """retrieval.fusion_method=combmnz flows request-config -> ensemble:
    the score-aware fusion path serves end to end (the measured
    zero-egress profile, eval/tune_score_fusion.py)."""
    async with harness() as h:
        resp = await h.chat(
            {
                "messages": [_attach_message("cadibona boundary")],
                "custom_fields": {
                    "configuration": {
                        "request": {"type": "retrieval"},
                        "retrieval": {
                            "fusion_method": "combmnz",
                            "fusion_depth": 15,
                            "ensemble_weights": {"semantic": 0.0},
                        },
                    }
                },
            }
        )
        assert resp.status == 200
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        payload = json.loads(
            next(
                a
                for a in custom["attachments"]
                if a.get("type")
                == "application/x.aidial-rag.retrieval-response+json"
            )["data"]
        )
        assert payload["chunks"]
        texts = " ".join(c["text"] or "" for c in payload["chunks"])
        assert "Cadibona" in texts


async def test_bad_fusion_method_is_a_400(harness):
    async with harness() as h:
        resp = await h.chat(
            {
                "messages": [_attach_message("q")],
                "custom_fields": {
                    "configuration": {
                        "retrieval": {"fusion_method": "borda"}
                    }
                },
            }
        )
        assert resp.status == 400


async def test_query_expansion_arm_e2e(harness):
    """retrieval.query_expansion boots the distributional-expansion BM25
    arm end to end: the stage advertises the expanded mode and retrieval
    still returns chunks (the expansion weights ride the weighted-query
    device path)."""
    async with harness() as h:
        h.fake.add_file(
            "files/user-bucket/big.pdf",
            build_pdf(_big_pdf_lines(), compress=True),
            "application/pdf",
        )
        resp = await h.chat(
            {
                "messages": [
                    _attach_message(
                        "cadibona boundary", url="files/user-bucket/big.pdf"
                    )
                ],
                "custom_fields": {
                    "configuration": {
                        "request": {"type": "retrieval"},
                        "retrieval": {
                            "query_expansion": {
                                "window": 3,
                                "dim": 32,
                                "neighbors": 3,
                            }
                        },
                    }
                },
            }
        )
        assert resp.status == 200, await resp.text()
        body = await resp.json()
        custom = body["choices"][0]["message"]["custom_content"]
        stages = [s["name"] for s in custom["stages"]]
        assert any("Keywords search (expanded)" in s for s in stages), stages
        payload = json.loads(
            [
                a
                for a in custom["attachments"]
                if a.get("type")
                == "application/x.aidial-rag.retrieval-response+json"
            ][0]["data"]
        )
        assert payload["chunks"]
