"""End-to-end applications: image retrieval, perceptual hash, metrics."""

from cvt_tpu.apps.phash import (
    phash, hamming_distance, resize_gray_32, is_pure_image)
from cvt_tpu.apps.retrieval import ImageRetrievalIndex
from cvt_tpu.apps.undistort import (undistort_camera, undistort_images,
                                    warp_between_cameras,
                                    warp_image_homography)

__all__ = ["phash", "hamming_distance", "resize_gray_32", "is_pure_image",
           "ImageRetrievalIndex", "undistort_camera", "undistort_images",
           "warp_between_cameras", "warp_image_homography"]
