"""Wall-clock sampling profiler rendering a call tree.

First-party stand-in for the pyinstrument profile the reference attaches
to its Profiler stage (reference utils.py:50-68): a sampler thread
captures every thread's Python stack at a fixed interval and aggregates
them into a call tree with wall-clock and self times. Unlike cProfile's
deterministic flat table this shows WHERE wall-clock time went —
including time blocked on I/O and device dispatches — as a timeline-
shaped tree.
"""

import sys
import threading
import time
from dataclasses import dataclass, field

__all__ = ["SamplingProfiler", "render_tree"]


@dataclass
class _Node:
    samples: int = 0
    self_samples: int = 0
    children: dict = field(default_factory=dict)


class SamplingProfiler:
    """Samples all threads' stacks from a daemon thread.

    Usage::

        p = SamplingProfiler(interval=0.002)
        p.start()
        ...
        p.stop()
        text = p.render()
    """

    def __init__(self, interval: float = 0.002):
        self.interval = interval
        self._root = _Node()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._n_samples = 0
        self._t0 = 0.0
        self.elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(
            target=self._run, name="sampling-profiler", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self.elapsed = time.perf_counter() - self._t0

    def _run(self) -> None:
        me = threading.get_ident()
        while not self._stop.is_set():
            for tid, top in sys._current_frames().items():
                if tid == me:
                    continue
                stack = []
                frame = top
                while frame is not None:
                    code = frame.f_code
                    stack.append(
                        f"{code.co_name} "
                        f"({code.co_filename.rsplit('/', 1)[-1]}"
                        f":{frame.f_lineno})"
                    )
                    frame = frame.f_back
                stack.reverse()
                node = self._root
                node.samples += 1
                for entry in stack:
                    node = node.children.setdefault(entry, _Node())
                    node.samples += 1
                node.self_samples += 1
            self._n_samples += 1
            time.sleep(self.interval)

    def render(self, min_fraction: float = 0.01, max_depth: int = 120) -> str:
        return render_tree(
            self._root,
            self.elapsed,
            max(self._n_samples, 1),
            min_fraction=min_fraction,
            max_depth=max_depth,
        )


def render_tree(
    root: _Node,
    elapsed: float,
    n_ticks: int,
    min_fraction: float = 0.01,
    max_depth: int = 120,
) -> str:
    """Indented call tree, heaviest children first; each line shows
    wall-clock time, share of the profiled window, and self time."""
    # root.samples counts thread-ticks; normalize per sampler tick so a
    # single-threaded profile sums to ~elapsed
    per_sample = elapsed / max(n_ticks, 1)
    lines = [
        f"wall-clock call tree — {elapsed:.3f}s profiled, "
        f"{n_ticks} samples ({per_sample * 1e3:.1f}ms interval)",
        "",
    ]
    cutoff = max(1, int(n_ticks * min_fraction))

    def walk(node: _Node, name: str, depth: int):
        if node.samples < cutoff or depth > max_depth:
            return
        t = node.samples * per_sample
        self_t = node.self_samples * per_sample
        share = node.samples / max(n_ticks, 1)
        self_part = f" (self {self_t:.3f}s)" if node.self_samples else ""
        # cap visual indentation so deep framework prefixes (pytest,
        # asyncio) stay readable while true depth still recurses
        lines.append(
            f"{'  ' * min(depth, 40)}{t:8.3f}s {share:5.0%}  "
            f"{name}{self_part}"
        )
        for child_name, child in sorted(
            node.children.items(), key=lambda kv: -kv[1].samples
        ):
            walk(child, child_name, depth + 1)

    for child_name, child in sorted(
        root.children.items(), key=lambda kv: -kv[1].samples
    ):
        walk(child, child_name, 0)
    if len(lines) == 2:
        lines.append("(no samples above the reporting threshold)")
    return "\n".join(lines)
