"""Two-view epipolar estimators: fundamental (8-point), essential.

Reference: retrieval/vlindex/src/estimators/ — fundamental_matrix
(7/8-point), essential_matrix (5-point via Ceres polynomial solve),
two_view_geometry decision logic. Here: the batched normalized 8-point
algorithm (DLT + rank-2 projection) and essential-from-fundamental with
known intrinsics, plus Sampson error scoring — all batched so RANSAC
evaluates S hypotheses in one SVD batch. The 5-point minimal solver is
deliberately replaced by 8-point-over-batched-hypotheses: on TPU, extra
hypotheses are cheaper than a Groebner-basis polynomial solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cvt_tpu.match.solvers import _hartley_normalize


def fit_fundamental_8pt(src: jax.Array, dst: jax.Array,
                        weights: jax.Array | None = None) -> jax.Array:
    """Normalized 8-point fundamental matrix. src/dst [..., n>=8, 2].

    `weights` [..., n] (e.g. an inlier mask) scales design rows — zeroed
    rows drop out of the DLT null-space fit, giving a weighted refit
    without dynamic shapes. Returns F [..., 3, 3] with rank-2
    enforcement, dst^T F src ~ 0.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    sn, t1 = _hartley_normalize(src)
    dn, t2 = _hartley_normalize(dst)
    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    one = jnp.ones_like(x)
    a = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one],
                  axis=-1)                                  # [..., n, 9]
    if weights is not None:
        a = a * weights[..., None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f = vt[..., -1, :].reshape(src.shape[:-2] + (3, 3))
    # rank-2 projection
    uf, sf, vtf = jnp.linalg.svd(f)
    sf = sf.at[..., 2].set(0.0)
    f = jnp.einsum("...ij,...j,...jk->...ik", uf, sf, vtf)
    # denormalize: F = T2^T Fn T1
    f = jnp.einsum("...ji,...jk,...kl->...il", t2, f, t1)
    norm = jnp.linalg.norm(f.reshape(f.shape[:-2] + (9,)),
                           axis=-1)[..., None, None]
    return f / (norm + 1e-12)


def essential_from_fundamental(f: jax.Array, k1: jax.Array,
                               k2: jax.Array) -> jax.Array:
    """E = K2^T F K1, with the (1,1,0) singular-value projection."""
    e = jnp.einsum("...ji,...jk,...kl->...il", k2, f, k1)
    u, _, vt = jnp.linalg.svd(e)
    s = jnp.ones(e.shape[:-2] + (3,), e.dtype).at[..., 2].set(0.0)
    return jnp.einsum("...ij,...j,...jk->...ik", u, s, vt)


def sampson_error(f: jax.Array, src: jax.Array, dst: jax.Array):
    """First-order geometric (Sampson) distance of correspondences to the
    epipolar constraint. f [..., 3, 3]; src/dst [..., n, 2] -> [..., n].
    """
    ones = jnp.ones(src.shape[:-1] + (1,), src.dtype)
    x1 = jnp.concatenate([src, ones], axis=-1)             # [..., n, 3]
    x2 = jnp.concatenate([dst, ones], axis=-1)
    fx1 = jnp.einsum("...ij,...nj->...ni", f, x1)
    ftx2 = jnp.einsum("...ji,...nj->...ni", f, x2)
    num = jnp.square(jnp.sum(x2 * fx1, axis=-1))
    den = (jnp.square(fx1[..., 0]) + jnp.square(fx1[..., 1])
           + jnp.square(ftx2[..., 0]) + jnp.square(ftx2[..., 1]))
    return num / jnp.maximum(den, 1e-12)


def ransac_fundamental(key, src, dst, valid=None, *,
                       threshold: float = 2.0, n_hypotheses: int = 256,
                       min_inliers: int = 12):
    """Batched-hypothesis RANSAC for F with Sampson scoring.
    src/dst [N, 2]; returns (F [3,3], inliers [N] bool, n_inliers)."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hypotheses, n)) + logits[None, :]
    _, picks = jax.lax.top_k(g, 8)
    models = fit_fundamental_8pt(src[picks], dst[picks])   # [S, 3, 3]
    err = sampson_error(models, jnp.broadcast_to(src, (n_hypotheses, n, 2)),
                        jnp.broadcast_to(dst, (n_hypotheses, n, 2)))
    inl = (err < threshold * threshold) & valid[None, :]
    support = jnp.sum(inl, axis=-1)
    finite = jnp.all(jnp.isfinite(models.reshape(n_hypotheses, -1)), -1)
    support = jnp.where(finite, support, -1)
    best = jnp.argmax(support)
    # LO refit: weighted 8-point over ALL points with the winner's inlier
    # mask as row weights (zero rows drop out of the null-space fit)
    w = inl[best]
    f2 = fit_fundamental_8pt(src, dst, w.astype(jnp.float32))
    err2 = sampson_error(f2, src, dst)
    inl2 = (err2 < threshold * threshold) & valid
    better = jnp.sum(inl2) > support[best]
    model = jnp.where(better, f2, models[best])
    inliers = jnp.where(better, inl2, w)
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    return model, inliers, n_inl
