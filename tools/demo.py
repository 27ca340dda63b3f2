"""Self-contained local demo: boot the service against a scripted local
Dial Core, index a generated PDF, run one RAG request, print the stages
and the cited answer.

No network, no model weights, no TPU required (runs on the CPU backend;
on a TPU VM the same code uses the chips). The only scripted piece is
the answer LLM — everything else (parse, chunk, encode, index, retrieve,
citations) is the real pipeline.

    JAX_PLATFORMS=cpu python -m tools.demo          # or: make demo
"""

import asyncio
import json

from aiohttp.test_utils import TestClient, TestServer


async def run() -> None:
    from dial_rag_tpu.embeddings.embedder import BgeEmbedder
    from dial_rag_tpu.models.tokenizer import build_test_vocab
    from dial_rag_tpu.service.app import create_app
    from dial_rag_tpu.service.config import AppConfig
    from tests.utils.fake_dial import FakeDialCore
    from tests.utils.pdf_builder import build_pdf

    pdf_lines = [
        [
            (72, 720, 18, "The Alps"),
            (72, 695, 11, "The Alps are the highest mountain range entirely in Europe."),
            (72, 680, 11, "Colle di Cadibona marks the southern boundary of the Alps."),
            (72, 665, 11, "Mont Blanc is the highest peak of the Alps."),
        ],
        [
            (72, 720, 18, "Climate"),
            (72, 695, 11, "The climate in the Alps varies with elevation and latitude."),
        ],
    ]
    words = sorted(
        set(
            "the alps are highest mountain range entirely in europe colle di "
            "cadibona marks southern boundary of mont blanc is peak climate "
            "varies with elevation and latitude what bounds represent this "
            "question for searching relevant passages".split()
        )
    )

    fake = FakeDialCore()
    dial_url = await fake.start()
    fake.add_file(
        "files/user-bucket/alps.pdf",
        build_pdf(pdf_lines, compress=True),
        "application/pdf",
    )
    fake.script_llm("The southern boundary is marked by Colle di Cadibona. <[2]>")

    embedder = BgeEmbedder.from_random(
        vocab=build_test_vocab(words + ["?", ":"]), batch_size=8
    )
    app_config = AppConfig.model_validate(
        {
            "dial_url": dial_url,
            "request": {"indexing": {"description_index": None}},
        }
    )
    app = create_app(app_config, embedder=embedder)
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    try:
        question = "What bounds the Alps in the south?"
        print(f"Q: {question}\n")
        resp = await client.post(
            "/openai/deployments/dial-rag/chat/completions",
            json={
                "stream": False,
                # app-level None for an index config is dropped by
                # exclude_none (reference semantics) — the vision-LLM
                # description index must be disabled per request
                "custom_fields": {
                    "configuration": {
                        "indexing": {"description_index": None}
                    }
                },
                "messages": [
                    {
                        "role": "user",
                        "content": question,
                        "custom_content": {
                            "attachments": [
                                {"url": "files/user-bucket/alps.pdf"}
                            ]
                        },
                    }
                ],
            },
            headers={"api-key": "demo-key"},
        )
        body = await resp.json()
        if resp.status != 200:
            raise SystemExit(f"request failed ({resp.status}): {body}")
        message = body["choices"][0]["message"]
        custom = message.get("custom_content", {})
        print("stages:")
        for stage in custom.get("stages", []):
            print(f"  [{stage['status']:9s}] {stage['name']}")
        print(f"\nA: {message['content']}")
        for att in custom.get("attachments", []):
            title = att.get("title", "")
            data = (att.get("data") or "").replace("\n", " ")[:80]
            print(f"  {title}: {data}")
        print(
            "\nbuild: "
            + json.dumps(
                json.loads(custom["state"]["repository_digest"])
                if isinstance(custom["state"].get("repository_digest"), str)
                else custom["state"].get("repository_digest")
            )
        )
    finally:
        await client.close()
        await fake.stop()


def main() -> None:
    from eval._platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax

    print(f"(backend: {jax.default_backend()})")
    asyncio.run(run())


if __name__ == "__main__":
    main()
