"""Opt-in per-request profiling emitted as a stage attachment (mirror of
reference utils.profiler_if_enabled, which attaches a pyinstrument
wall-clock tree — utils.py:50-68). pyinstrument is not in the image, so
a first-party sampling profiler (utils/sampling_profiler.py) provides
the same timeline-shaped call tree with per-node wall and self times,
plus cProfile's deterministic table as a second attachment.

The samplers observe process-global state (all threads' stacks;
cProfile additionally refuses to nest in 3.12), so a non-blocking guard
lets one request profile at a time; concurrent requests asking for a
profile get a stage explaining the skip instead of a 500."""

import cProfile
import io
import pstats
import threading
from contextlib import asynccontextmanager

from dial_rag_tpu.service.protocol import Choice
from dial_rag_tpu.utils.sampling_profiler import SamplingProfiler

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
    sampler = SamplingProfiler()
    profiler = cProfile.Profile()
    try:
        sampler.start()
        profiler.enable()
        try:
            yield
        finally:
            profiler.disable()
            sampler.stop()
    finally:
        _profiler_guard.release()
    tree = sampler.render()
    buf = io.StringIO()
    stats = pstats.Stats(profiler, stream=buf)
    stats.sort_stats("cumulative").print_stats(60)
    with choice.create_stage("Profiler") as stage:
        stage.append_content(f"```\n{tree}\n```")
        stage.add_attachment(
            type="text/plain", title="Profile-tree.txt", data=tree
        )
        stage.add_attachment(
            type="text/plain", title="Profiler.txt", data=buf.getvalue()
        )
