"""Template matching in frames/images: GHT-style verification.

Reference:
  * video_object_match/src/GHT.cpp — per-frame SIFT + FLANN 2-NN ratio
    match (demo.cpp distRatio=0.9, numThrehold=10), SVF spatial
    validation (:6-156), OCTAVE-difference histogram validation
    (`OctaveDiff`/`OctaveValidate`, :157-180: matches must agree on a
    dominant scale ratio), optional cv::findHomography RANSAC (:238-255).
  * detection_and_tracking/logo_detection — SIFT templates packed into a
    model (make_model.cc), per-image 1-NN threshold match
    (logo.cc:104-105, sift_near_thresh), SVF validation (logo.cc:237).
  * ffmpeg_read_memory / the FFDecoder path: video decode stays host-side
    here (any [T, H, W] gray frame array source: imageio, cv2, ...) —
    the TPU consumes batched frame tensors.

TPU-native: frames are processed as a BATCH — one extract_sift call for
all frames, vmapped matching/verification. No per-frame Python loops on
the device path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.features.covdet import SiftFeatures, extract_sift
from cvt_tpu.match.nn import match_descriptors
from cvt_tpu.match.ransac import ransac
from cvt_tpu.match.svf import svf_inliers


def octave_validate(sigma1, sigma2, valid, *, n_bins: int = 11,
                    min_frac: float = 0.5):
    """Scale-ratio (octave-difference) histogram validation
    (GHT.cpp:157-180): inlier matches must agree on a dominant
    log2(sigma2/sigma1) bin. Returns mask of matches in the dominant bin
    (all False when no bin reaches `min_frac` of the votes)."""
    ds = jnp.log2((sigma2 + 1e-6) / (sigma1 + 1e-6))
    bins = jnp.clip(jnp.round(ds).astype(jnp.int32) + n_bins // 2,
                    0, n_bins - 1)
    hist = jnp.zeros((n_bins,), jnp.float32).at[bins].add(
        valid.astype(jnp.float32))
    total = jnp.maximum(jnp.sum(hist), 1.0)
    best = jnp.argmax(hist)
    ok = hist[best] / total >= min_frac
    return valid & (bins == best) & ok


@dataclass
class TemplateMatch:
    """Per-frame result: hit flag, #verified inliers, affine model."""
    hits: np.ndarray        # [T] bool
    n_inliers: np.ndarray   # [T] int32
    models: np.ndarray      # [T, 2, 3] affine template->frame


class TemplateMatcher:
    """Find a template object inside a batch of frames/images."""

    def __init__(self, template_image, *, max_features: int = 256,
                 ratio: float = 0.9, min_matches: int = 10,
                 use_octave_check: bool = True,
                 use_ransac: bool = True, ransac_threshold: float = 10.0):
        """template_image [H, W] gray in [0, 1]."""
        t = jnp.asarray(template_image, jnp.float32)[None]
        self.tmpl = extract_sift(t, max_features=max_features,
                                 rootsift=True)
        self.ratio = ratio
        self.min_matches = min_matches
        self.use_octave_check = use_octave_check
        self.use_ransac = use_ransac
        self.ransac_threshold = ransac_threshold
        self.max_features = max_features

    def match_features(self, feats: SiftFeatures, key=None) -> TemplateMatch:
        """Verify the template against pre-extracted frame features."""
        if key is None:
            key = jax.random.key(0)
        td = self.tmpl.descriptors[0]
        tf = self.tmpl.frames[0]
        tv = self.tmpl.valid[0]
        n_frames = feats.descriptors.shape[0]

        def per_frame(fd, ff, fv, k_):
            m = match_descriptors(td, fd, valid1=tv, valid2=fv,
                                  ratio=self.ratio)
            p1 = tf[:, :2]
            f2 = ff[m.idx2]
            inl = svf_inliers(p1, tf[:, 3], f2[:, :2], f2[:, 3], m.valid)
            if self.use_octave_check:
                inl = octave_validate(tf[:, 2], f2[:, 2], inl)
            if self.use_ransac:
                res = ransac(k_, p1, f2[:, :2], inl, model="affine",
                             threshold=self.ransac_threshold,
                             n_hypotheses=128,
                             min_inliers=self.min_matches)
                return res.n_inliers, res.model
            return jnp.sum(inl).astype(jnp.int32), jnp.zeros((2, 3))

        keys = jax.random.split(key, n_frames)
        n_inl, models = jax.vmap(per_frame)(
            feats.descriptors, feats.frames, feats.valid, keys)
        n_inl = np.asarray(n_inl)
        return TemplateMatch(hits=n_inl >= self.min_matches,
                             n_inliers=n_inl, models=np.asarray(models))

    def match_frames(self, frames, key=None) -> TemplateMatch:
        """frames [T, H, W] gray in [0, 1] -> per-frame verification."""
        feats = extract_sift(jnp.asarray(frames, jnp.float32),
                             max_features=self.max_features, rootsift=True)
        return self.match_features(feats, key=key)


class LogoDetector:
    """Multi-template detector (logo_detection equivalent): each logo is
    a set of template images; an image is flagged when any template
    verifies with enough inliers (logo.cc decision rules :387-394,
    without the HOG secondary check)."""

    def __init__(self, templates: dict, **matcher_kwargs):
        """templates: {logo_name: [template_image, ...]}."""
        self.matchers = {
            name: [TemplateMatcher(img, **matcher_kwargs) for img in imgs]
            for name, imgs in templates.items()}

    def detect(self, images, key=None):
        """images [B, H, W] -> list of {logo_name: n_inliers} per image."""
        if key is None:
            key = jax.random.key(0)
        feats = extract_sift(jnp.asarray(images, jnp.float32),
                             rootsift=True)
        out = [dict() for _ in range(images.shape[0])]
        for name, matchers in self.matchers.items():
            for m in matchers:
                res = m.match_features(feats, key=key)
                for i in range(images.shape[0]):
                    if res.hits[i]:
                        out[i][name] = max(out[i].get(name, 0),
                                           int(res.n_inliers[i]))
        return out
