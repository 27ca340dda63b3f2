"""Generated schema docs must match the pydantic models (reference CI
keeps docs/*.generated.schema.json in sync the same way)."""

import json
from pathlib import Path

from tools.generate_docs import DOCS_DIR, generated_schemas


def test_docs_schemas_up_to_date():
    for name, schema in generated_schemas().items():
        path = DOCS_DIR / name
        assert path.exists(), f"{name} missing; run python -m tools.generate_docs"
        on_disk = json.loads(path.read_text())
        assert on_disk == schema, (
            f"{name} is stale; run python -m tools.generate_docs"
        )


def test_api_md_mentions_every_schema():
    api_md = (DOCS_DIR / "api.md").read_text()
    for name in generated_schemas():
        assert name in api_md


def test_schema_core_fields():
    schemas = generated_schemas()
    conf = schemas["configuration.generated.schema.json"]
    # request.type rag|retrieval|indexing is the dispatch contract
    text = json.dumps(conf)
    for t in ("rag", "retrieval", "indexing"):
        assert t in text
    retr = schemas["retrieval-response.generated.schema.json"]
    rtext = json.dumps(retr)
    for field in ("chunks", "images", "attachment_url", "page"):
        assert field in rtext
