"""Page-image extraction + resize (mirror of reference
test_extract_pages.py / test_image_extractor.py)."""

import asyncio
import base64
import io

from PIL import Image

from dial_rag_tpu.documents.pdf.writer import build_pdf
from dial_rag_tpu.image_processor.base64_utils import (
    base64_to_pil_image,
    pil_image_as_base64,
)
from dial_rag_tpu.image_processor.extract_pages import (
    extract_number_of_pages,
    extract_pages,
    is_image,
)
from dial_rag_tpu.image_processor.resize import resize_image
from dial_rag_tpu.utils.streams import NullStream

MIME_PDF = "application/pdf"


def _pdf(n_pages=3):
    return build_pdf(
        [[(72, 720, 12, f"Page {i} content")] for i in range(n_pages)]
    )


def _png(w=100, h=60):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), (200, 10, 10)).save(buf, format="PNG")
    return buf.getvalue()


def test_pdf_page_count():
    assert extract_number_of_pages(MIME_PDF, _pdf(3)) == 3


def test_image_page_count():
    assert extract_number_of_pages("image/png", _png()) == 1


async def _collect(agen):
    return [img async for img in agen]


def test_extract_pdf_pages_renders_each_page():
    images = asyncio.run(
        _collect(extract_pages(MIME_PDF, _pdf(2), scaled_size=400))
    )
    assert len(images) == 2
    for img in images:
        assert isinstance(img, Image.Image)
        assert max(img.size) == 400  # resized to requested size


def test_extract_selected_page_numbers():
    images = asyncio.run(
        _collect(
            extract_pages(MIME_PDF, _pdf(3), page_numbers=[2], scaled_size=300)
        )
    )
    assert len(images) == 1


def test_extract_single_image_document():
    images = asyncio.run(
        _collect(
            extract_pages("image/png", _png(300, 150), scaled_size=200)
        )
    )
    assert len(images) == 1
    assert max(images[0].size) == 200


def test_page_images_helper_returns_none_for_text():
    from dial_rag_tpu.retrieval.page_images import extract_page_images

    result = asyncio.run(
        extract_page_images("text/plain", b"abc", 100, NullStream())
    )
    assert result is None


def test_is_image():
    assert is_image("image/png")
    assert is_image("image/jpeg")
    assert not is_image("application/pdf")


def test_resize_preserves_aspect_and_never_upscales():
    img = Image.new("RGB", (400, 200))
    out = resize_image(img, 100)
    assert out.size == (100, 50)
    small = Image.new("RGB", (50, 30))
    assert resize_image(small, 100).size == (50, 30)


def test_base64_png_roundtrip():
    img = Image.new("RGB", (10, 10), (1, 2, 3))
    encoded = pil_image_as_base64(img)
    base64.b64decode(encoded)  # valid base64
    back = base64_to_pil_image(encoded)
    assert back.size == (10, 10)
