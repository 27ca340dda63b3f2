"""Mine ground-truth chunk texts from the reference's cached traffic.

The reference's e2e fixtures record full LLM requests
(tests/cache/**/*.response); the QA prompts embed ``<doc ...>`` blocks
whose text is EXACTLY one chunk produced by the reference's
unstructured-0.16.14 pipeline on tests/data/alps_wiki.pdf. Those
recorded chunks are the oracle the first-party PDF segmentation
(documents/pdf/layout.py, text/texttype.py) was fitted against.

Usage:
    python -m tools.mine_oracle_chunks \
        [--cache-root /root/reference/tests/cache] \
        [--out tests/data/alps_oracle_chunks.json]

Re-run only to refresh the fixture from a new reference checkout; the
mined fixture is committed so tests stay hermetic.
"""

import argparse
import glob
import json
import re
from pathlib import Path


def mine(cache_root: str, source_marker: str = "alps_wiki.pdf") -> list[dict]:
    out, seen = [], set()
    for f in sorted(
        glob.glob(f"{cache_root}/**/*.response", recursive=True)
    ):
        try:
            data = json.load(open(f))
        except (OSError, ValueError):
            continue
        body = data.get("request", {}).get("body", {})
        for m in body.get("messages", []):
            c = m.get("content")
            if isinstance(c, list):
                c = " ".join(
                    x.get("text", "") for x in c if isinstance(x, dict)
                )
            if not isinstance(c, str) or "<doc" not in c:
                continue
            for mt in re.finditer(r"<doc ([^>]*)>(.*?)</doc>", c, re.S):
                attrs, text = mt.group(1), mt.group(2)
                src = re.search(r"source='([^']*)'", attrs)
                page = re.search(r"page_number='(\d+)'", attrs)
                if not src or source_marker not in src.group(1):
                    continue
                chunk = text.strip()
                if chunk in seen:
                    continue
                seen.add(chunk)
                out.append(
                    {
                        "page": int(page.group(1)) if page else None,
                        "cache_file": str(
                            Path(f).relative_to(cache_root)
                        ),
                        "text": chunk,
                    }
                )
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--cache-root", default="/root/reference/tests/cache"
    )
    parser.add_argument(
        "--out", default="tests/data/alps_oracle_chunks.json"
    )
    args = parser.parse_args()
    chunks = mine(args.cache_root)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(chunks, f, indent=1, ensure_ascii=False)
    print(f"{len(chunks)} oracle chunks -> {args.out}")
    html_chunks = [
        c["text"] for c in mine(args.cache_root, "alps_wiki.html")
    ]
    html_out = str(Path(args.out).parent / "alps_html_oracle_chunks.json")
    with open(html_out, "w") as f:
        json.dump(html_chunks, f, indent=1, ensure_ascii=False)
    print(f"{len(html_chunks)} html oracle chunks -> {html_out}")


if __name__ == "__main__":
    main()
