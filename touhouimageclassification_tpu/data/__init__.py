"""Data pipeline: ImageFolder indexing on the host, JPEG decode in a thread
pool, fixed-canvas uint8 batches prefetched to device; all random
augmentation happens on-device (see ``ops/augment.py``)."""
from .folder import ImageFolderIndex, get_class_to_idx, random_split
from .loader import HostImageLoader, decode_image

__all__ = [
    "ImageFolderIndex", "get_class_to_idx", "random_split",
    "HostImageLoader", "decode_image",
]
