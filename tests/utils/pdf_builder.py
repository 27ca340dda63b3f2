"""Back-compat shim: the PDF writer moved into the package
(dial_rag_tpu/documents/pdf/writer.py) so the eval harness can use it."""

from dial_rag_tpu.documents.pdf.writer import build_pdf  # noqa: F401
