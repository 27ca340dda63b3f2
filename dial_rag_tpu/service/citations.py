"""Streamed citation rewriting.

The LLM is prompted to cite context chunks as ``<[n]>`` (1-based index
into the retrieved chunks). This transformer rewrites the streamed answer
so users see compact ``[k]`` references numbered by first use, and
reports which chunks were actually cited. Semantics ported from the
reference (qa_chain.py:144-195):

- tags may be split across stream chunks ("… <[" | "1]> …"): a trailing
  partial prefix is buffered, not emitted;
- out-of-bounds ids (e.g. a literal "[23]" inside document content) pass
  through unchanged with a warning;
- each distinct cited chunk gets the next reference number at first use;
  repeats reuse it;
- after the stream ends, the cited chunks are reported in first-use order.
"""

import logging
import re
from typing import AsyncIterator

logger = logging.getLogger(__name__)

REF_PATTERN = re.compile(r"<\[(\d+)\]>")


async def rewrite_citations(
    answer_stream: AsyncIterator[str],
    num_found_items: int,
) -> AsyncIterator[tuple[str, list[int] | None]]:
    """Yields (text_piece, None) for rewritten answer text, then finally
    ("", used_chunk_indices) with 0-based indices of cited chunks in
    first-use order."""
    used_chunk_indices: list[int] = []
    prev_piece = ""

    async for piece in answer_stream:
        answer_piece = prev_piece + piece
        last_pos = 0
        out = []
        for m in REF_PATTERN.finditer(answer_piece):
            chunk_id = int(m.group(1))
            if not (1 <= chunk_id <= num_found_items):
                logger.warning(
                    "Chunk ID in model response is out of bounds: "
                    f"{chunk_id} / {num_found_items}"
                )
                out.append(answer_piece[last_pos : m.end()])
                last_pos = m.end()
                continue
            chunk_index = chunk_id - 1
            if chunk_index not in used_chunk_indices:
                used_chunk_indices.append(chunk_index)
            reference_index = used_chunk_indices.index(chunk_index)
            out.append(
                answer_piece[last_pos : m.start()] + f"[{reference_index + 1}]"
            )
            last_pos = m.end()

        # hold back a potentially-split opening tag
        pos = answer_piece.find("<[", last_pos)
        if pos == -1:
            if answer_piece and answer_piece[-1] == "<":
                pos = len(answer_piece) - 1
            else:
                pos = len(answer_piece)
        out.append(answer_piece[last_pos:pos])
        prev_piece = answer_piece[pos:]

        text = "".join(out)
        if text:
            yield text, None

    if prev_piece:
        yield prev_piece, None

    yield "", used_chunk_indices
