"""Generate the public API JSON schemas into docs/.

Counterpart of the reference's schema-doc generation (reference
noxfile.py `update_docs` session + generate_json_schema.py, producing
docs/*.generated.schema.json). Run after changing any public model:

    python -m tools.generate_docs

tests/test_docs_schemas.py fails if the files on disk drift from the
models.
"""

import json
from pathlib import Path

DOCS_DIR = Path(__file__).parent.parent / "docs"


def generated_schemas() -> dict[str, dict]:
    from dial_rag_tpu.service.api import IndexingResponse, RetrievalResponse
    from dial_rag_tpu.service.config import Configuration

    return {
        "configuration.generated.schema.json": (
            Configuration.model_json_schema()
        ),
        "retrieval-response.generated.schema.json": (
            RetrievalResponse.model_json_schema()
        ),
        "indexing-response.generated.schema.json": (
            IndexingResponse.model_json_schema()
        ),
    }


def main() -> None:
    DOCS_DIR.mkdir(exist_ok=True)
    for name, schema in generated_schemas().items():
        path = DOCS_DIR / name
        path.write_text(json.dumps(schema, indent=2, sort_keys=True) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
