"""One-command live-traffic recording against a real Dial Core.

Boots the record/replay proxy (tests/utils/record_replay.py — the port
of the reference's cache middleware, reference
tests/utils/cache_middleware.py:181-196) in RECORD mode in front of a
real Dial Core: every POST (LLM / embeddings) is served from the
md5-keyed cache when present, and on a miss is forwarded upstream and
recorded into ``--cache-dir`` for future hermetic replays. GETs
(files, bucket, limits, metadata) always pass through.

    python -m tools.record_traffic --upstream https://core.example.com \
        --cache-dir tests/cache/live [--port 8081] [--serve-app]

Then point the service (or a test) at ``http://localhost:<port>`` as
its DIAL_URL; with ``--serve-app`` this tool also starts the RAG
service on ``--app-port`` already wired to the proxy.
"""

import argparse
import asyncio
import logging


async def run(args) -> None:
    from tests.utils.record_replay import RecordReplayProxy

    proxy = RecordReplayProxy(
        args.upstream, args.cache_dir, record=True
    )
    url = await proxy.start(port=args.port)
    print(f"recording proxy on {url} -> {args.upstream}")
    print(f"fixtures land in {args.cache_dir}/<md5>.response")

    app_runner = None
    if args.serve_app:
        from aiohttp import web

        from dial_rag_tpu.service.app import create_app
        from dial_rag_tpu.service.config import AppConfig

        app = create_app(AppConfig(dial_url=url))
        app_runner = web.AppRunner(app)
        await app_runner.setup()
        site = web.TCPSite(app_runner, "localhost", args.app_port)
        await site.start()
        print(
            f"service on http://localhost:{args.app_port} "
            f"(dial_url={url})"
        )

    print("Ctrl-C to stop.")
    try:
        while True:
            await asyncio.sleep(3600)
    except (KeyboardInterrupt, asyncio.CancelledError):
        pass
    finally:
        if app_runner is not None:
            await app_runner.cleanup()
        await proxy.stop()
        if proxy.misses:
            print(f"recorded {len(proxy.misses)} new fixtures")


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--upstream", required=True, help="real Dial Core base URL"
    )
    parser.add_argument("--cache-dir", default="tests/cache/live")
    parser.add_argument("--port", type=int, default=8081)
    parser.add_argument("--serve-app", action="store_true")
    parser.add_argument("--app-port", type=int, default=5000)
    args = parser.parse_args()
    try:
        asyncio.run(run(args))
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
