"""End-to-end applications: image retrieval, perceptual hash, metrics."""

from cvt_tpu.apps.phash import (
    phash, hamming_distance, resize_gray_32, is_pure_image)
from cvt_tpu.apps.retrieval import ImageRetrievalIndex

__all__ = ["phash", "hamming_distance", "resize_gray_32", "is_pure_image",
           "ImageRetrievalIndex"]
