"""Bake the build-provenance digest into a container image.

First-party equivalent of the reference's collect_repository_digest.py:
run at image build time (see Dockerfile), it records `git describe` and
the working-tree status into a JSON file that the service reads at
startup (dial_rag_tpu/service/digest.py:read_repository_digest) and
echoes into every response's choice state — so any served answer can be
traced to the exact build.

Usage: python -m tools.collect_repository_digest [OUT_PATH]
(default /opt/repository-digest.json).
"""

import json
import subprocess
import sys


def collect() -> dict:
    def git(*args: str) -> str:
        return subprocess.run(
            ["git", *args], capture_output=True, text=True, timeout=30
        ).stdout.strip()

    version = git("describe", "--always", "--dirty")
    status = "clean"
    if not version:
        version, status = "unknown", "no-git"
    elif version.endswith("-dirty"):
        status = "dirty"
    return {"version": version, "status": status}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/opt/repository-digest.json"
    digest = collect()
    with open(out_path, "w") as f:
        json.dump(digest, f, indent=2)
        f.write("\n")
    print(f"{out_path}: {digest}")


if __name__ == "__main__":
    main()
