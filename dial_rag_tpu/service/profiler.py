"""Opt-in per-request profiling emitted as a stage attachment (mirror of
reference utils.profiler_if_enabled; pyinstrument is not in the image so
cProfile provides the stats)."""

import cProfile
import io
import pstats
from contextlib import asynccontextmanager

from dial_rag_tpu.service.protocol import Choice


@asynccontextmanager
async def profiler_if_enabled(choice: Choice, enabled: bool):
    if not enabled:
        yield
        return
    profiler = cProfile.Profile()
    profiler.enable()
    try:
        yield
    finally:
        profiler.disable()
        buf = io.StringIO()
        stats = pstats.Stats(profiler, stream=buf)
        stats.sort_stats("cumulative").print_stats(60)
        with choice.create_stage("Profiler") as stage:
            stage.append_content(f"```\n{buf.getvalue()}\n```")
            stage.add_attachment(
                type="text/plain", title="Profiler.txt", data=buf.getvalue()
            )
