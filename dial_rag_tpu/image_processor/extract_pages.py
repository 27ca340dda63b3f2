"""Page-image extraction strategies by mime type (mirror of reference
image_processor/extract_pages.py): PDFs render through the first-party
rasterizer; image documents load through PIL (multi-frame TIFFs are
multi-page). Rasterization is CPU-bound and not thread-safe by renderer
state, so callers run it in a single-worker executor."""

import asyncio
import io
from typing import AsyncIterator

from PIL import Image

from dial_rag_tpu.documents.mime import (
    IMAGE_MIMES,
    MIME_PDF,
    normalize_content_type,
)
from dial_rag_tpu.errors import InvalidDocumentError

# one worker: rasterizer/PIL frame seeking are not safe to interleave
_render_pool = None


def _get_render_pool():
    global _render_pool
    if _render_pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _render_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="page_render"
        )
    return _render_pool


def is_image(content_type: str) -> bool:
    return normalize_content_type(content_type) in IMAGE_MIMES


def are_image_pages_supported(mime_type: str) -> bool:
    return mime_type == MIME_PDF or mime_type in IMAGE_MIMES


def _image_pages(
    data: bytes, page_numbers: list[int] | None, scaled_size: int | None
):
    from dial_rag_tpu.image_processor.resize import resize_image

    with Image.open(io.BytesIO(data)) as im:
        n_frames = getattr(im, "n_frames", 1)
        numbers = page_numbers or list(range(1, n_frames + 1))
        for number in numbers:
            if not 1 <= number <= n_frames:
                raise InvalidDocumentError(
                    f"page {number} out of range 1..{n_frames}"
                )
            if n_frames > 1:
                im.seek(number - 1)
            frame = im.convert("RGB")
            if scaled_size:
                frame = resize_image(frame, scaled_size)
            yield frame


def _extract_pages_sync(
    mime_type: str,
    data: bytes,
    page_numbers: list[int] | None,
    scaled_size: int | None,
) -> list[Image.Image]:
    if mime_type == MIME_PDF:
        from dial_rag_tpu.documents.pdf.render import render_pdf_pages

        return list(render_pdf_pages(data, page_numbers, scaled_size))
    if mime_type in IMAGE_MIMES:
        return list(_image_pages(data, page_numbers, scaled_size))
    raise InvalidDocumentError(
        f"Page images are not supported for {mime_type}"
    )


async def extract_pages(
    mime_type: str,
    data: bytes,
    page_numbers: list[int] | None = None,
    scaled_size: int | None = None,
) -> AsyncIterator[Image.Image]:
    loop = asyncio.get_running_loop()
    images = await loop.run_in_executor(
        _get_render_pool(),
        _extract_pages_sync,
        mime_type,
        data,
        page_numbers,
        scaled_size,
    )
    for image in images:
        yield image


def extract_number_of_pages(mime_type: str, data: bytes) -> int:
    from dial_rag_tpu.documents.parser import extract_number_of_pages as impl

    return impl(mime_type, data)
