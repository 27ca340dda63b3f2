"""Opt-in per-request profiling emitted as a stage attachment (mirror of
reference utils.profiler_if_enabled; pyinstrument is not in the image so
cProfile provides the stats).

cProfile is process-global: Python 3.12 raises if two profilers overlap,
and a single active profiler captures every interleaved request anyway.
A non-blocking guard lets one request profile at a time; concurrent
requests asking for a profile get a stage explaining the skip instead of
a 500."""

import cProfile
import io
import pstats
import threading
from contextlib import asynccontextmanager

from dial_rag_tpu.service.protocol import Choice

_profiler_guard = threading.Lock()


@asynccontextmanager
async def profiler_if_enabled(choice: Choice, enabled: bool):
    if not enabled:
        yield
        return
    if not _profiler_guard.acquire(blocking=False):
        with choice.create_stage("Profiler") as stage:
            stage.append_content(
                "Another request is being profiled; profiling skipped "
                "(the profiler is process-global).\n"
            )
        yield
        return
    profiler = cProfile.Profile()
    try:
        profiler.enable()
        try:
            yield
        finally:
            profiler.disable()
    finally:
        _profiler_guard.release()
    buf = io.StringIO()
    stats = pstats.Stats(profiler, stream=buf)
    stats.sort_stats("cumulative").print_stats(60)
    with choice.create_stage("Profiler") as stage:
        stage.append_content(f"```\n{buf.getvalue()}\n```")
        stage.add_attachment(
            type="text/plain", title="Profiler.txt", data=buf.getvalue()
        )
