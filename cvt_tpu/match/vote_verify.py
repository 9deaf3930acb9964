"""Vote-and-verify: Hough-space voting + affine refit re-ranking.

Reference: retrieval/vlindex/src/retrieval/vote_and_verify.cc — each
match casts a vote for a 4-D similarity (tx, ty, log sigma, theta) in a
multi-resolution Hough pyramid (:238-288), top bins are scored (:294-333)
and the best bins seed an affine LO-refit with an effective-inlier count
(:339-415). Also GHT octave-histogram validation
(video_object_match/src/GHT.cpp:157-180).

TPU-native: votes are a batched scatter-add into a dense 4-D histogram
(one level, sized like the pyramid's finest useful level); the refit
reuses the batched RANSAC machinery with hypotheses seeded from the top
Hough bins instead of random minimal sets.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cvt_tpu.match.solvers import apply_affine, fit_affine


class VoteVerifyResult(NamedTuple):
    score: jax.Array       # scalar: effective inlier count of best model
    model: jax.Array       # [2, 3] affine
    inliers: jax.Array     # [N] bool


@partial(jax.jit, static_argnames=("bins_t", "bins_s", "bins_r",
                                   "n_seeds", "threshold"))
def vote_and_verify(frames1, frames2, valid=None, *,
                    image_extent: float = 1024.0, bins_t: int = 16,
                    bins_s: int = 8, bins_r: int = 8, n_seeds: int = 8,
                    threshold: float = 8.0) -> VoteVerifyResult:
    """frames1/frames2 [N, 4] matched (x, y, sigma, angle) keypoint
    frames; each match votes for a similarity transform; the densest
    Hough bins seed affine refits; the best refit's inlier count is the
    verification score.
    """
    f1 = jnp.asarray(frames1, jnp.float32)
    f2 = jnp.asarray(frames2, jnp.float32)
    n = f1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    # per-match similarity parameters (TransformFromMatch, geometry.cc)
    ds = jnp.log2((f2[:, 2] + 1e-6) / (f1[:, 2] + 1e-6))   # log2 scale
    dr = f2[:, 3] - f1[:, 3]                               # rotation
    dr = jnp.arctan2(jnp.sin(dr), jnp.cos(dr))             # wrap to [-pi,pi]
    s = 2.0 ** ds
    ca, sa = jnp.cos(dr), jnp.sin(dr)
    tx = f2[:, 0] - s * (ca * f1[:, 0] - sa * f1[:, 1])
    ty = f2[:, 1] - s * (sa * f1[:, 0] + ca * f1[:, 1])

    # quantize into the 4-D histogram
    bt = jnp.clip(((tx / (2 * image_extent) + 0.5) * bins_t)
                  .astype(jnp.int32), 0, bins_t - 1)
    bty = jnp.clip(((ty / (2 * image_extent) + 0.5) * bins_t)
                   .astype(jnp.int32), 0, bins_t - 1)
    bs = jnp.clip(((ds / 8.0 + 0.5) * bins_s).astype(jnp.int32),
                  0, bins_s - 1)
    br = jnp.clip(((dr / (2 * jnp.pi) + 0.5) * bins_r).astype(jnp.int32),
                  0, bins_r - 1)
    flat_bin = ((bt * bins_t + bty) * bins_s + bs) * bins_r + br
    n_bins = bins_t * bins_t * bins_s * bins_r
    hist = jnp.zeros((n_bins,), jnp.float32).at[flat_bin].add(
        valid.astype(jnp.float32))

    # top bins seed refits: matches voting into a seed bin fit an affine
    _, top_bins = jax.lax.top_k(hist, n_seeds)             # [S]
    in_bin = (flat_bin[None, :] == top_bins[:, None]) & valid[None, :]
    w = in_bin.astype(jnp.float32)                         # [S, N]
    src = jnp.broadcast_to(f1[:, :2], (n_seeds, n, 2))
    dst = jnp.broadcast_to(f2[:, :2], (n_seeds, n, 2))
    models = fit_affine(src, dst, w)                       # [S, 2, 3]
    proj = apply_affine(models, src)
    res2 = jnp.sum((proj - dst) ** 2, axis=-1)             # [S, N]
    inl = (res2 < threshold * threshold) & valid[None, :]
    support = jnp.sum(inl, axis=-1)
    # guard degenerate fits
    finite = jnp.all(jnp.isfinite(models.reshape(n_seeds, -1)), axis=-1)
    support = jnp.where(finite & (jnp.sum(w, axis=-1) >= 3), support, 0)
    best = jnp.argmax(support)

    # one more refit on the winning inlier set (LO step)
    w2 = inl[best].astype(jnp.float32)
    model2 = fit_affine(f1[:, :2], f2[:, :2], w2)
    proj2 = apply_affine(model2, f1[:, :2])
    res2b = jnp.sum((proj2 - f2[:, :2]) ** 2, axis=-1)
    inl2 = (res2b < threshold * threshold) & valid
    better = jnp.sum(inl2) >= support[best]
    model = jnp.where(better, model2, models[best])
    inliers = jnp.where(better, inl2, inl[best])
    return VoteVerifyResult(score=jnp.sum(inliers).astype(jnp.float32),
                            model=model, inliers=inliers)
