# TPU-serving image for dial_rag_tpu (counterpart of the reference's
# Dockerfile, rebuilt for a TPU VM instead of a CPU/OpenVINO host).
#
# Differences from the reference by design:
# - LibreOffice IS installed in the final stage (binary .doc/.ppt need
#   `soffice`; see the note there). OOXML/ODF additionally parse
#   through the first-party fallback (dial_rag_tpu/documents/office.py)
#   even where soffice is absent;
# - no nltk/unstructured downloads: tokenization, stemming, parsing and
#   chunking are first-party (C++ cores under dial_rag_tpu/native are
#   compiled at build time so first boot does not pay the compile);
# - jax[tpu] replaces sentence-transformers/OpenVINO — the image must
#   run on a TPU VM (v5e/v6e) where /dev/vfio exposes the chips.
#
# The bge-small-en checkpoint is copied in (no runtime HF downloads);
# point BGE_MODEL_DIR at a directory containing either a plain HF
# BertModel layout or a SentenceTransformer.save() tree.

FROM python:3.12-slim AS base

ENV PYTHONDONTWRITEBYTECODE=1
ENV PYTHONUNBUFFERED=1

# g++ compiles the native tokenizer/keyword cores; git feeds the baked
# repository digest
RUN apt-get update && \
    apt-get install --no-install-recommends -y g++ git ca-certificates && \
    apt-get clean && rm -rf /var/lib/apt/lists/*


# digest from the FULL build context: a pruned worktree would make
# `git describe --dirty` see every uncopied tracked file as deleted and
# stamp every build dirty
FROM base AS digest
WORKDIR /src
COPY . .
RUN python3 tools/collect_repository_digest.py /repository-digest.json


FROM base AS builder

ENV VIRTUAL_ENV=/opt/venv
RUN python -m venv "$VIRTUAL_ENV"
ENV PATH="$VIRTUAL_ENV/bin:$PATH"

# jax[tpu] pulls libtpu from the Google releases index
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    numpy "pydantic>=2" aiohttp pyyaml safetensors msgpack \
    optax orbax-checkpoint Pillow opentelemetry-api

WORKDIR /app
COPY pyproject.toml ./
COPY dial_rag_tpu ./dial_rag_tpu
COPY config ./config
COPY tools ./tools
RUN pip install --no-cache-dir --no-deps .

# pre-compile the native C++ cores into the image (they otherwise
# rebuild lazily on first import, keyed by source hash). The build
# cache must live under a path the final stage copies — the default
# XDG cache dir (/root/.cache) would be discarded with this stage.
ENV XDG_CACHE_HOME=/opt/cache
RUN python -c "from dial_rag_tpu.models.tokenizer import WordPieceTokenizer; \
from dial_rag_tpu.text.keywords import keywords_preprocess; \
keywords_preprocess('warm the native build')"


FROM base AS final

# LibreOffice guarantees reference-parity coverage for the BINARY
# office formats (.doc/.ppt): without `soffice` those raise
# InvalidDocumentError (the first-party fallback covers OOXML/ODF
# only — service/converter.py:43-47). The reference's image installs
# it for the same reason.
RUN apt-get update && \
    apt-get install --no-install-recommends -y \
        libreoffice-writer libreoffice-impress && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

ENV VIRTUAL_ENV=/opt/venv
ENV PATH="$VIRTUAL_ENV/bin:$PATH"
ENV XDG_CACHE_HOME=/opt/cache
COPY --from=builder /opt/venv /opt/venv
COPY --from=builder /opt/cache /opt/cache
COPY --from=digest /repository-digest.json /opt/repository-digest.json
COPY --from=builder /app /app
WORKDIR /app

# local checkpoint directory for the embedding model (mount or bake)
ENV DIAL_RAG__EMBEDDER__MODEL_PATH=/embeddings_model/bge-small-en
# compile every encoder bucket + the index kernels during startup so the
# first request does not pay jit latency on a fresh TPU VM
ENV DIAL_RAG__EMBEDDER__WARMUP_ON_STARTUP=true
# persistent XLA compile cache: warmup programs compile once per image/
# chip generation; later boots load them from this volume-mountable dir
# instead of paying 20-250s per program through the remote TPU tunnel
# (runtime/compile_cache.py)
ENV JAX_COMPILATION_CACHE_DIR=/var/cache/jax
RUN mkdir -p /var/cache/jax
ENV PORT=5000

EXPOSE 5000
CMD ["python", "-m", "dial_rag_tpu.main"]
