"""Descriptor matching, spatial verification, robust estimation."""

from cvt_tpu.match.nn import match_descriptors, MatchResult
from cvt_tpu.match.svf import svf_inliers
from cvt_tpu.match.solvers import (
    fit_affine, fit_homography_dlt, apply_affine, apply_homography)
from cvt_tpu.match.ransac import ransac, RansacResult
from cvt_tpu.match.vote_verify import vote_and_verify

__all__ = [
    "match_descriptors", "MatchResult", "svf_inliers",
    "fit_affine", "fit_homography_dlt", "apply_affine", "apply_homography",
    "ransac", "RansacResult", "vote_and_verify",
]
