"""First-party PDF page rasterizer.

Replaces the pdfplumber rasterization the reference uses for page images
(image_processor/pdf_page_image_extractor.py) — no poppler/pdfplumber in
the image. This renderer is deliberately simple but honest:

- embedded raster images (DCT/JPEG via PIL, Flate RGB/Gray bitmaps) are
  composited into their CTM rectangles;
- text is drawn at its exact page positions and sizes using PIL's
  scalable built-in font (glyph shapes approximate, content and layout
  real).

That covers the two consumers: remote multimodal/vision models (which
read content and layout) and user-facing page previews.
"""

import io
import zlib

from PIL import Image, ImageDraw, ImageFont

from dial_rag_tpu.documents.pdf.document import PdfDocument
from dial_rag_tpu.documents.pdf.filters import decode_stream
from dial_rag_tpu.documents.pdf.objects import Name, PdfError, Stream
from dial_rag_tpu.documents.pdf.layout import (
    LayoutParams,
    group_chars_to_lines,
)
from dial_rag_tpu.documents.pdf.text import TextExtractor

DEFAULT_SCALE = 2.0  # ~144 dpi


def _decode_embedded_image(doc: PdfDocument, stream: Stream) -> Image.Image | None:
    d = stream.dict
    rv = doc.resolve
    filters = rv(d.get("Filter"))
    if not isinstance(filters, list):
        filters = [filters] if filters is not None else []
    filter_names = {f.value for f in filters if isinstance(f, Name)}

    try:
        if "DCTDecode" in filter_names or "JPXDecode" in filter_names:
            return Image.open(io.BytesIO(stream.raw)).convert("RGB")
        width = int(rv(d.get("Width", 0)))
        height = int(rv(d.get("Height", 0)))
        bpc = int(rv(d.get("BitsPerComponent", 8)))
        if not width or not height or bpc != 8:
            return None
        data = decode_stream(stream, resolve=rv)
        cs = rv(d.get("ColorSpace"))
        cs_name = cs.value if isinstance(cs, Name) else ""
        n = len(data) // (width * height)
        if cs_name == "DeviceRGB" or n == 3:
            return Image.frombytes("RGB", (width, height), data[: width * height * 3])
        if cs_name == "DeviceGray" or n == 1:
            return Image.frombytes(
                "L", (width, height), data[: width * height]
            ).convert("RGB")
        if cs_name == "DeviceCMYK" or n == 4:
            return Image.frombytes(
                "CMYK", (width, height), data[: width * height * 4]
            ).convert("RGB")
    except (PdfError, zlib.error, ValueError, OSError):
        return None
    return None


def render_page(
    doc: PdfDocument, page: dict, scaled_size: int | None = None
) -> Image.Image:
    """Rasterize one page dict to a PIL RGB image."""
    media_box = doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792]
    mb = [float(doc.resolve(v)) for v in media_box]
    page_w = max(mb[2] - mb[0], 1.0)
    page_h = max(mb[3] - mb[1], 1.0)

    if scaled_size:
        scale = scaled_size / max(page_w, page_h)
    else:
        scale = DEFAULT_SCALE
    img_w = max(int(page_w * scale), 1)
    img_h = max(int(page_h * scale), 1)

    extractor = TextExtractor(doc, page)
    try:
        glyphs = extractor.extract()
    except PdfError:
        glyphs = []

    canvas = Image.new("RGB", (img_w, img_h), "white")

    # embedded images first (text overlays them, like a real renderer)
    for stream, ctm in extractor.images:
        img = _decode_embedded_image(doc, stream)
        if img is None:
            continue
        # unit square corners under ctm
        xs, ys = [], []
        for ux, uy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            px = ctm[0] * ux + ctm[2] * uy + ctm[4]
            py = ctm[1] * ux + ctm[3] * uy + ctm[5]
            xs.append((px - mb[0]) * scale)
            ys.append((page_h - (py - mb[1])) * scale)
        x0, x1 = int(min(xs)), int(max(xs))
        y0, y1 = int(min(ys)), int(max(ys))
        if x1 - x0 < 1 or y1 - y0 < 1:
            continue
        resized = img.resize((x1 - x0, y1 - y0), Image.LANCZOS)
        canvas.paste(resized, (x0, y0))

    draw = ImageDraw.Draw(canvas)
    for line in group_chars_to_lines(glyphs, LayoutParams()):
        text = line.text.strip()
        if not text:
            continue
        size_px = max(int(line.height * scale * 0.9), 4)
        try:
            font = ImageFont.load_default(size=size_px)
        except TypeError:  # very old PIL fallback
            font = ImageFont.load_default()
        x = (line.x0 - mb[0]) * scale
        y = (page_h - (line.y1 - mb[1])) * scale
        draw.text((x, y), text, fill="black", font=font)

    return canvas


def render_pdf_pages(
    data: bytes,
    page_numbers: list[int] | None = None,
    scaled_size: int | None = None,
):
    """Yield PIL images for the given 1-based pages (all pages if None)."""
    doc = PdfDocument(data)
    pages = doc.pages()
    if page_numbers is None:
        page_numbers = list(range(1, len(pages) + 1))
    for number in page_numbers:
        if not 1 <= number <= len(pages):
            raise PdfError(f"page {number} out of range 1..{len(pages)}")
        yield render_page(doc, pages[number - 1], scaled_size)
