"""LRU cache of device-resident indexes.

The reference rebuilds its (numpy) index objects per request from the
deserialized DocumentRecords (retrieval_chain.py create_retriever runs
per request); cheap on host. On TPU the equivalent rebuild uploads the
``[N, 384]`` chunk matrix to HBM — per-request host->device traffic
that repeat queries against the same documents shouldn't pay. This
cache keys a built index by the records' *content tokens* — the
``(index_url, sha256-of-serialized-bytes)`` identity the storage layer
stamps on every stored/loaded record — plus the retriever
configuration. A record without a token (never persisted) disables
caching for its record set. Byte-bounded LRU eviction.
"""

import logging
from collections import OrderedDict
from threading import Lock, Thread

logger = logging.getLogger(__name__)

DEFAULT_CAPACITY_BYTES = 1 << 30  # 1 GiB of HBM for cached indexes


class DeviceIndexCache:
    def __init__(self, capacity_bytes: int = DEFAULT_CAPACITY_BYTES):
        self.capacity_bytes = capacity_bytes
        self._entries: OrderedDict = OrderedDict()
        self._building: dict = {}  # key -> Lock (single-flight)
        self._size = 0
        self._lock = Lock()
        self._warm_threads: list[Thread] = []
        self.hits = 0
        self.misses = 0

    def get_or_build(self, records: list, config_key: tuple, builder, warm=None):
        """Return the cached index for (record tokens, config_key) or
        build + insert one. ``builder()`` must return an object with an
        ``nbytes`` attribute. Concurrent first requests for the same key
        single-flight the build: one thread uploads, the rest wait —
        without this, C cold-start requests would upload C copies of the
        index to HBM simultaneously.

        ``warm(index)``, when given, runs on a daemon thread right after
        a MISS inserts the new index: compile-ahead of the batched wave
        kernels (index.warm_query_buckets) so the first burst of
        concurrent traffic doesn't pay mid-request jit compiles — those
        measured seconds each through a remote TPU tunnel. Never runs on
        hits (the kernels are already compiled) and never blocks the
        building request."""
        tokens = [getattr(r, "cache_token", None) for r in records]
        if not records or any(t is None for t in tokens):
            return builder()  # unpersisted records: no stable identity
        key = (tuple(tokens), config_key)
        with self._lock:
            index = self._entries.get(key)
            if index is not None:
                self._entries.move_to_end(key)
                self.hits += 1
                return index
            build_lock = self._building.get(key)
            if build_lock is None:
                build_lock = Lock()
                self._building[key] = build_lock
        with build_lock:
            with self._lock:
                index = self._entries.get(key)
                if index is not None:  # a racer finished the build
                    self.hits += 1
                    return index
            try:
                index = builder()
            except BaseException:
                with self._lock:
                    self._building.pop(key, None)
                raise
            with self._lock:
                # insert before dropping the build lock from _building —
                # popping it first opens a window where a newcomer sees
                # neither an entry nor a lock and starts a duplicate build
                replaced = self._entries.pop(key, None)
                if replaced is not None:
                    self._size -= replaced.nbytes
                self._entries[key] = index
                self._size += index.nbytes
                self.misses += 1
                while (
                    self._size > self.capacity_bytes
                    and len(self._entries) > 1
                ):
                    _, evicted = self._entries.popitem(last=False)
                    self._size -= evicted.nbytes
                self._building.pop(key, None)
            if warm is not None:
                self._spawn_warm(warm, index)
        return index

    def _spawn_warm(self, warm, index) -> None:
        def run():
            try:
                warm(index)
            except Exception:
                logger.warning("index compile-ahead failed", exc_info=True)

        t = Thread(target=run, daemon=True, name="index-warm")
        with self._lock:
            self._warm_threads = [
                w for w in self._warm_threads if w.is_alive()
            ]
            self._warm_threads.append(t)
        t.start()

    def wait_warm(self, timeout: float | None = None) -> None:
        """Block until pending compile-ahead threads finish (benchmarks
        and tests use this to keep compiles out of timed phases)."""
        with self._lock:
            threads = list(self._warm_threads)
        for t in threads:
            t.join(timeout)

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def size_bytes(self) -> int:
        return self._size
