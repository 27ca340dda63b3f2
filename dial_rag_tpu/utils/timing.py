"""Timing/timeout helpers (mirrors reference utils.py:16-47,107-116)."""

import asyncio
from contextlib import asynccontextmanager
from time import perf_counter

from dial_rag_tpu.errors import DialRagError


async def periodic_ping(file, interval: float = 15.0):
    """Keep-alive pings into a stage stream while a long step runs."""
    while True:
        try:
            await asyncio.sleep(interval)
        except asyncio.CancelledError:
            break
        file.write("")


@asynccontextmanager
async def timed_block(name: str, file):
    file.write(f"{name} started\n")
    start = perf_counter()
    try:
        yield
    finally:
        file.write(f"{name} took {perf_counter() - start:.2f}s\n")


@asynccontextmanager
async def timeout(seconds: float, error_message: str | None = None):
    try:
        async with asyncio.timeout(seconds):
            yield
    except TimeoutError as e:
        raise DialRagError(
            error_message
            or f"Failed to process request in {seconds} seconds"
        ) from e


def format_size(size: int) -> str:
    for unit in ("bytes", "KiB", "MiB", "GiB"):
        if size < 1024 or unit == "GiB":
            if unit == "bytes":
                return f"{size} {unit}"
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size} bytes"
