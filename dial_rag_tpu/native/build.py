"""Build + load native C++ components via g++ and ctypes.

pybind11 is not in the image, so native pieces expose a C ABI and are
loaded with ctypes. Shared objects are compiled on first use into a cache
directory keyed by a content hash, so rebuilds happen only when the
source changes; concurrent builds are serialized with an exclusive lock
file."""

import ctypes
import fcntl
import hashlib
import logging
import os
import subprocess
from pathlib import Path

logger = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent
_CACHE_DIR = Path(
    os.environ.get(
        "DIAL_RAG_NATIVE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "dial_rag_tpu",
        ),
    )
)

_loaded: dict[str, ctypes.CDLL | None] = {}


def load_native(name: str) -> ctypes.CDLL | None:
    """Compile (if needed) and load native/<name>.cpp; None on failure."""
    if name in _loaded:
        return _loaded[name]
    lib = None
    try:
        src = _SRC_DIR / f"{name}.cpp"
        source = src.read_bytes()
        digest = hashlib.sha256(source).hexdigest()[:16]
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        so_path = _CACHE_DIR / f"{name}-{digest}.so"
        if not so_path.exists():
            lock_path = _CACHE_DIR / f"{name}.lock"
            with open(lock_path, "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                if not so_path.exists():
                    tmp = so_path.with_suffix(".tmp.so")
                    subprocess.run(
                        [
                            "g++",
                            "-O3",
                            "-std=c++17",
                            "-shared",
                            "-fPIC",
                            "-pthread",
                            str(src),
                            "-o",
                            str(tmp),
                        ],
                        check=True,
                        capture_output=True,
                    )
                    tmp.replace(so_path)
                    logger.info(f"built native {name} -> {so_path}")
        lib = ctypes.CDLL(str(so_path))
    except (OSError, subprocess.CalledProcessError) as e:
        logger.warning(f"native {name} unavailable, using Python path: {e}")
        lib = None
    _loaded[name] = lib
    return lib
