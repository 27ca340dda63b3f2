from dial_rag_tpu.image_processor.extract_pages import (
    are_image_pages_supported,
    extract_number_of_pages,
    extract_pages,
    is_image,
)
from dial_rag_tpu.image_processor.base64_utils import (
    pil_image_as_base64,
)
from dial_rag_tpu.image_processor.resize import resize_image

__all__ = [
    "extract_pages",
    "extract_number_of_pages",
    "are_image_pages_supported",
    "is_image",
    "pil_image_as_base64",
    "resize_image",
]
