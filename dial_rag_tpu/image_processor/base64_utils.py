"""PIL <-> base64 helpers (mirror of reference image_processor/base64.py)."""

import base64
import io

from PIL import Image


def pil_image_as_base64(image: Image.Image, format: str = "PNG") -> str:
    buf = io.BytesIO()
    image.save(buf, format=format)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def base64_to_pil_image(data: str) -> Image.Image:
    return Image.open(io.BytesIO(base64.b64decode(data)))
