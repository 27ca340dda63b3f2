"""Record/replay proxy for remote-model traffic.

Port of the reference's e2e caching pattern (reference tests/utils/
cache_middleware.py:47-278): a proxy in front of a Dial Core that, for
every POST (LLM / embeddings), serves an md5-keyed cached response from
disk; on a cache miss it either fails the test (hermetic mode) or — with
``record=True`` (the reference's REFRESH=True) — forwards to the real
upstream and records the response for future runs.

Cache layout mirrors the reference: ``<cache_dir>/<md5-of-body>.response``
holding the JSON body.
"""

import hashlib
import json
from pathlib import Path

import aiohttp
from aiohttp import web


def body_cache_key(body: bytes, path: str = "") -> str:
    """Key on path + body: the deployment lives in the URL, not the
    body, so body-only keys would replay one model's fixture for
    another."""
    return hashlib.md5(path.encode() + b"\x00" + body).hexdigest()


class RecordReplayProxy:
    def __init__(
        self, upstream_url: str | None, cache_dir: str, record: bool = False
    ):
        self.upstream_url = upstream_url
        self.cache_dir = Path(cache_dir)
        self.record = record
        self.runner = None
        self.port = None
        self.misses: list[str] = []

    def _cache_path(self, key: str) -> Path:
        return self.cache_dir / f"{key}.response"

    async def _proxy_get(self, request: web.Request) -> web.StreamResponse:
        """GETs (files, metadata, bucket, limits) always pass through —
        the reference serves these from its own fixtures, not the cache."""
        if self.upstream_url is None:
            raise web.HTTPBadGateway(text="no upstream for GET")
        async with aiohttp.ClientSession() as session:
            async with session.get(
                f"{self.upstream_url}{request.rel_url}",
                headers={
                    k: v
                    for k, v in request.headers.items()
                    if k.lower() not in ("host",)
                },
            ) as upstream:
                data = await upstream.read()
                return web.Response(
                    body=data,
                    status=upstream.status,
                    content_type=upstream.content_type,
                )

    async def _proxy_post(self, request: web.Request) -> web.Response:
        body = await request.read()
        key = body_cache_key(body, str(request.rel_url))
        path = self._cache_path(key)
        if path.exists():
            return web.Response(
                body=path.read_bytes(), content_type="application/json"
            )
        self.misses.append(key)
        if not self.record or self.upstream_url is None:
            return web.json_response(
                {
                    "error": {
                        "message": f"uncached request {key}; rerun the "
                        "recorder against a live core (record=True)",
                        "type": "invalid_request_error",
                        "code": "400",
                    }
                },
                status=400,
            )
        async with aiohttp.ClientSession() as session:
            async with session.post(
                f"{self.upstream_url}{request.rel_url}",
                data=body,
                headers={
                    k: v
                    for k, v in request.headers.items()
                    if k.lower() not in ("host", "content-length")
                },
            ) as upstream:
                data = await upstream.read()
        if upstream.status == 200:
            self.cache_dir.mkdir(parents=True, exist_ok=True)
            path.write_bytes(data)
        return web.Response(
            body=data,
            status=upstream.status,
            content_type="application/json",
        )

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_post("/{path:.*}", self._proxy_post)
        app.router.add_get("/{path:.*}", self._proxy_get)
        return app

    async def start(self, port: int = 0) -> str:
        self.runner = web.AppRunner(self.build_app())
        await self.runner.setup()
        site = web.TCPSite(self.runner, "127.0.0.1", port)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        return f"http://127.0.0.1:{self.port}"

    async def stop(self):
        if self.runner is not None:
            await self.runner.cleanup()
