"""Record/replay proxy semantics (mirror of the reference's
cache_middleware REFRESH workflow, driven against the fake Dial Core as
the 'live' upstream)."""

import json

import aiohttp
import pytest

from tests.utils.fake_dial import FakeDialCore
from tests.utils.record_replay import RecordReplayProxy, body_cache_key


async def _post_chat(url: str, content: str) -> tuple[int, dict]:
    async with aiohttp.ClientSession() as session:
        async with session.post(
            f"{url}/openai/deployments/m/chat/completions",
            json={"messages": [{"role": "user", "content": content}]},
            headers={"api-key": "k"},
        ) as resp:
            return resp.status, await resp.json()


async def test_record_then_replay(tmp_path):
    fake = FakeDialCore()
    fake.script_llm("the recorded answer")
    upstream = await fake.start()

    # record mode: miss -> forward to the live core -> persist
    recorder = RecordReplayProxy(
        upstream, str(tmp_path / "cache"), record=True
    )
    rec_url = await recorder.start()
    status, body = await _post_chat(rec_url, "question one")
    assert status == 200
    assert "recorded answer" in json.dumps(body)
    assert len(recorder.misses) == 1
    await recorder.stop()
    await fake.stop()

    # hermetic replay: NO upstream at all; the cache answers
    replayer = RecordReplayProxy(None, str(tmp_path / "cache"), record=False)
    rep_url = await replayer.start()
    status, body = await _post_chat(rep_url, "question one")
    assert status == 200
    assert "recorded answer" in json.dumps(body)
    assert replayer.misses == []

    # an unrecorded request fails loudly instead of hitting the network
    status, body = await _post_chat(rep_url, "question two")
    assert status == 400
    assert "uncached request" in body["error"]["message"]
    await replayer.stop()


def test_cache_key_includes_path():
    body = b'{"messages": []}'
    a = body_cache_key(body, "/openai/deployments/model-a/chat/completions")
    b = body_cache_key(body, "/openai/deployments/model-b/chat/completions")
    assert a != b  # same body, different deployment -> different fixture


async def test_get_passthrough(tmp_path):
    fake = FakeDialCore()
    fake.add_file("files/b/x.txt", b"payload", "text/plain")
    upstream = await fake.start()
    proxy = RecordReplayProxy(upstream, str(tmp_path), record=False)
    url = await proxy.start()
    async with aiohttp.ClientSession() as session:
        async with session.get(f"{url}/v1/files/files/b/x.txt") as resp:
            # fake serves files under /v1/files/{path}
            assert resp.status in (200, 404)
    await proxy.stop()
    await fake.stop()


async def test_record_traffic_tool_records_through_proxy(tmp_path):
    """The one-command recording entry point (tools/record_traffic.py)
    wires the proxy in record mode: a POST through it reaches the fake
    upstream once and lands as an md5-keyed fixture (the reference's
    REFRESH=True flow, cache_middleware.py:181-196)."""
    import aiohttp
    from aiohttp import web

    hits = []

    async def upstream_handler(request):
        hits.append(await request.read())
        return web.json_response({"ok": True, "n": len(hits)})

    upstream = web.Application()
    upstream.router.add_post("/{p:.*}", upstream_handler)
    runner = web.AppRunner(upstream)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    up_port = site._server.sockets[0].getsockname()[1]

    from tests.utils.record_replay import RecordReplayProxy

    proxy = RecordReplayProxy(
        f"http://127.0.0.1:{up_port}", str(tmp_path), record=True
    )
    url = await proxy.start(port=0)
    try:
        async with aiohttp.ClientSession() as session:
            for _ in range(2):  # second call must replay, not re-record
                async with session.post(
                    f"{url}/openai/deployments/m/chat/completions",
                    json={"messages": []},
                ) as resp:
                    body = await resp.json()
                    assert body["ok"] is True and body["n"] == 1
    finally:
        await proxy.stop()
        await runner.cleanup()
    assert len(hits) == 1
    assert len(list(tmp_path.glob("*.response"))) == 1
