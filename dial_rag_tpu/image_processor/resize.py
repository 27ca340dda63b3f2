"""Proportional LANCZOS resize (mirror of reference image_processor/
resize.py: scale so the max dimension equals scaled_size; never upscale)."""

from PIL import Image


def resize_image(image: Image.Image, scaled_size: int) -> Image.Image:
    width, height = image.size
    largest = max(width, height)
    if largest <= scaled_size:
        return image
    ratio = scaled_size / largest
    return image.resize(
        (max(int(width * ratio), 1), max(int(height * ratio), 1)),
        Image.LANCZOS,
    )
