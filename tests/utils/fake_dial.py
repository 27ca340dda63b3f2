"""Fake Dial Core for hermetic e2e tests (the analogue of the reference's
CacheMiddlewareApp record/replay proxy, tests/utils/cache_middleware.py):
serves bucket/limits/files endpoints and scripted LLM/embeddings
responses, so the app under test talks to a real HTTP server with no
network egress."""

import hashlib
import json

import numpy as np
from aiohttp import web


class FakeDialCore:
    def __init__(self):
        self.files: dict[str, bytes] = {}  # path (after /v1/) -> bytes
        self.content_types: dict[str, str] = {}
        # scripted chat completions: list of str answers or callables
        # (messages -> str); popped per request, last one repeats
        self.llm_responses: list = ["I don't know."]
        self.llm_requests: list[dict] = []
        self.embedding_dim = 16
        # set to an HTTP status (e.g. 429) to make every embeddings
        # call fail with it — simulates a rate-limit storm
        self.embeddings_status: int | None = None
        self.runner = None
        self.port = None

    def add_file(self, path: str, data: bytes, content_type: str):
        self.files[path] = data
        self.content_types[path] = content_type

    def script_llm(self, *responses):
        self.llm_responses = list(responses)

    def _next_llm_response(self, body: dict) -> str:
        self.llm_requests.append(body)
        response = self.llm_responses[0]
        if len(self.llm_responses) > 1:
            self.llm_responses.pop(0)
        if callable(response):
            return response(body)
        return response

    # -- handlers ----------------------------------------------------------

    async def bucket(self, request):
        return web.json_response({"bucket": "test-bucket"})

    async def limits(self, request):
        return web.json_response(
            {
                "minuteTokenStats": {"total": 100000, "used": 0},
                "dayTokenStats": {"total": 10000000, "used": 0},
            }
        )

    async def get_file(self, request):
        path = request.match_info["path"]
        full = f"files/{path}"
        if full not in self.files:
            raise web.HTTPNotFound()
        return web.Response(
            body=self.files[full],
            content_type=self.content_types.get(full, "application/octet-stream"),
        )

    async def put_file(self, request):
        path = request.match_info["path"]
        full = f"files/{path}"
        reader = await request.multipart()
        field = await reader.next()
        data = await field.read()
        self.files[full] = data
        self.content_types[full] = field.headers.get(
            "Content-Type", "application/octet-stream"
        )
        return web.json_response({"url": full})

    async def metadata(self, request):
        path = request.match_info["path"]
        full = f"files/{path}"
        if full not in self.files:
            raise web.HTTPNotFound()
        return web.json_response(
            {
                "name": full.split("/")[-1],
                "url": full,
                "contentType": self.content_types.get(full),
                "contentLength": len(self.files[full]),
            }
        )

    async def chat_completions(self, request):
        body = await request.json()
        answer = self._next_llm_response(body)

        tool_choice = body.get("tool_choice")
        if tool_choice:
            # forced function call (standalone question chain)
            name = tool_choice["function"]["name"]
            message = {
                "role": "assistant",
                "content": None,
                "tool_calls": [
                    {
                        "id": "call_1",
                        "type": "function",
                        "function": {
                            "name": name,
                            "arguments": json.dumps({"question": answer}),
                        },
                    }
                ],
            }
            return web.json_response(
                {
                    "id": "cmpl-1",
                    "object": "chat.completion",
                    "choices": [
                        {"index": 0, "message": message, "finish_reason": "stop"}
                    ],
                }
            )

        if body.get("stream"):
            response = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await response.prepare(request)
            # stream in small pieces to exercise chunk-boundary handling
            for i in range(0, len(answer), 7):
                chunk = {
                    "id": "cmpl-1",
                    "object": "chat.completion.chunk",
                    "choices": [
                        {
                            "index": 0,
                            "delta": {"content": answer[i : i + 7]},
                            "finish_reason": None,
                        }
                    ],
                }
                await response.write(
                    f"data: {json.dumps(chunk)}\n\n".encode()
                )
            await response.write(b"data: [DONE]\n\n")
            await response.write_eof()
            return response

        return web.json_response(
            {
                "id": "cmpl-1",
                "object": "chat.completion",
                "choices": [
                    {
                        "index": 0,
                        "message": {"role": "assistant", "content": answer},
                        "finish_reason": "stop",
                    }
                ],
            }
        )

    async def embeddings(self, request):
        if self.embeddings_status is not None:
            return web.json_response(
                {"error": {"message": "rate limited", "code": "429"}},
                status=self.embeddings_status,
            )
        body = await request.json()
        inputs = list(body.get("input") or [])
        inputs += [c["data"] for c in body.get("custom_input", [])]
        data = []
        for i, item in enumerate(inputs):
            seed = int.from_bytes(
                hashlib.sha256(str(item).encode()).digest()[:4], "big"
            )
            rng = np.random.default_rng(seed)
            vec = rng.normal(size=self.embedding_dim)
            vec /= np.linalg.norm(vec)
            data.append(
                {"object": "embedding", "index": i, "embedding": vec.tolist()}
            )
        return web.json_response({"object": "list", "data": data})

    # -- lifecycle ---------------------------------------------------------

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/v1/bucket", self.bucket)
        app.router.add_get("/v1/deployments/{model}/limits", self.limits)
        app.router.add_get("/v1/files/{path:.*}", self.get_file)
        app.router.add_put("/v1/files/{path:.*}", self.put_file)
        app.router.add_get("/v1/metadata/files/{path:.*}", self.metadata)
        app.router.add_post(
            "/openai/deployments/{model}/chat/completions",
            self.chat_completions,
        )
        app.router.add_post(
            "/openai/deployments/{model}/embeddings", self.embeddings
        )
        return app

    async def start(self) -> str:
        self.runner = web.AppRunner(self.build_app())
        await self.runner.setup()
        site = web.TCPSite(self.runner, "127.0.0.1", 0)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        return f"http://127.0.0.1:{self.port}"

    async def stop(self):
        if self.runner:
            await self.runner.cleanup()
