"""Matching + geometric verification: 2NN ratio, SVF, RANSAC, V&V."""

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.match import (
    apply_affine, apply_homography, fit_affine, fit_homography_dlt,
    match_descriptors, ransac, svf_inliers, vote_and_verify)


def _correspondences(rng, n_inl=40, n_out=20, model="affine"):
    src = rng.uniform(0, 512, size=(n_inl + n_out, 2)).astype(np.float32)
    a = np.array([[0.9, -0.2, 30.0], [0.15, 1.1, -12.0]], np.float32)
    dst = src @ a[:, :2].T + a[:, 2]
    dst += rng.normal(0, 0.5, dst.shape).astype(np.float32)
    dst[n_inl:] = rng.uniform(0, 512, size=(n_out, 2))  # outliers
    return src, dst, a


def test_match_descriptors_identity(rng):
    d = rng.normal(size=(32, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    res = match_descriptors(d, d, ratio=0.95)
    assert np.array_equal(np.asarray(res.idx2), np.arange(32))
    assert np.asarray(res.valid).all()
    np.testing.assert_allclose(np.asarray(res.dist), 0.0, atol=1e-4)


def test_match_ratio_rejects_ambiguous(rng):
    # two nearly identical database entries -> ratio test kills the match
    q = rng.normal(size=(1, 16)).astype(np.float32)
    db = np.concatenate([q + 1e-3, q - 1e-3,
                         rng.normal(size=(5, 16)).astype(np.float32)])
    res = match_descriptors(q, db, ratio=0.9)
    assert not np.asarray(res.valid)[0]


def test_match_respects_masks(rng):
    d1 = rng.normal(size=(8, 16)).astype(np.float32)
    v1 = np.zeros(8, bool)
    v1[:4] = True
    res = match_descriptors(d1, d1, valid1=v1, valid2=v1, ratio=0.99)
    assert not np.asarray(res.valid)[4:].any()


def test_fit_affine_exact(rng):
    src = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    a = np.array([[1.2, 0.1, 5.0], [-0.3, 0.8, 2.0]], np.float32)
    dst = src @ a[:, :2].T + a[:, 2]
    est = np.asarray(fit_affine(src, dst))
    np.testing.assert_allclose(est, a, atol=1e-3)


def test_fit_homography_exact(rng):
    src = rng.uniform(0, 100, (12, 2)).astype(np.float32)
    h = np.array([[1.1, 0.05, 10.0], [-0.1, 0.95, 5.0],
                  [1e-4, -2e-4, 1.0]], np.float32)
    ph = np.concatenate([src, np.ones((12, 1), np.float32)], 1) @ h.T
    dst = (ph[:, :2] / ph[:, 2:]).astype(np.float32)
    est = np.asarray(fit_homography_dlt(src, dst))
    proj = np.asarray(apply_homography(jnp.asarray(est), src))
    np.testing.assert_allclose(proj, dst, atol=0.05)


def test_ransac_affine_recovers_inliers(rng):
    src, dst, a = _correspondences(rng)
    res = ransac(jax.random.key(0), src, dst, model="affine",
                 threshold=4.0, n_hypotheses=128)
    inl = np.asarray(res.inliers)
    assert bool(res.success)
    assert inl[:40].mean() > 0.9      # recovers real inliers
    assert inl[40:].mean() < 0.1      # rejects outliers
    est = np.asarray(res.model)
    np.testing.assert_allclose(est, a, atol=0.5)


def test_ransac_homography(rng):
    src, dst, _ = _correspondences(rng)
    res = ransac(jax.random.key(1), src, dst, model="homography",
                 threshold=4.0, n_hypotheses=256)
    inl = np.asarray(res.inliers)
    assert inl[:40].mean() > 0.8
    assert inl[40:].mean() < 0.15


def test_ransac_preemptive_matches_full(rng):
    from cvt_tpu.match.ransac import ransac_preemptive
    src, dst, a = _correspondences(rng)
    res = ransac_preemptive(jax.random.key(3), src, dst, model="affine",
                            threshold=4.0, n_hypotheses=512,
                            n_survivors=32, n_probe=24)
    inl = np.asarray(res.inliers)
    assert bool(res.success)
    assert inl[:40].mean() > 0.9 and inl[40:].mean() < 0.1
    np.testing.assert_allclose(np.asarray(res.model), a, atol=0.5)


def test_ransac_preemptive_homography(rng):
    from cvt_tpu.match.ransac import ransac_preemptive
    src, dst, _ = _correspondences(rng)
    res = ransac_preemptive(jax.random.key(4), src, dst,
                            model="homography", threshold=4.0,
                            n_hypotheses=512, n_survivors=64, n_probe=24)
    inl = np.asarray(res.inliers)
    assert inl[:40].mean() > 0.8 and inl[40:].mean() < 0.15


def test_ransac_with_valid_mask(rng):
    src, dst, _ = _correspondences(rng, n_inl=30, n_out=10)
    valid = np.ones(40, bool)
    valid[35:] = False
    res = ransac(jax.random.key(2), src, dst, valid=valid, model="affine")
    assert not np.asarray(res.inliers)[35:].any()


def test_svf_consistent_rotation(rng):
    """Matches under a global rotation+translation are mutually
    consistent; random matches are not."""
    n = 30
    pts1 = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    theta = 0.4
    c, s = np.cos(theta), np.sin(theta)
    r = np.array([[c, -s], [s, c]], np.float32)
    pts2 = pts1 @ r.T + np.array([50, -20], np.float32)
    ang1 = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    ang2 = (ang1 + theta).astype(np.float32)
    # corrupt the last 8 matches
    pts2[-8:] = rng.uniform(0, 200, (8, 2))
    ang2[-8:] = rng.uniform(0, 2 * np.pi, 8)
    inl = np.asarray(svf_inliers(pts1, ang1, pts2, ang2))
    assert inl[:22].mean() > 0.9
    assert inl[-8:].mean() < 0.3


def test_svf_respects_valid_mask(rng):
    pts = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    ang = np.zeros(10, np.float32)
    valid = np.ones(10, bool)
    valid[7:] = False
    inl = np.asarray(svf_inliers(pts, ang, pts, ang, valid=valid))
    assert not inl[7:].any()
    # identical geometry is fully consistent; the greedy extraction stops
    # when the active set's degree hits 0, dropping the final clique
    # member — matching the reference loop (svf.cc:129-151)
    assert inl[:7].sum() >= 6


def test_vote_and_verify_similarity(rng):
    n = 50
    x1 = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    s, th = 1.5, 0.3
    c, sn = np.cos(th), np.sin(th)
    x2 = s * (x1 @ np.array([[c, sn], [-sn, c]], np.float32)) + [40, 10]
    sig1 = rng.uniform(2, 4, n).astype(np.float32)
    f1 = np.concatenate([x1, sig1[:, None],
                         rng.uniform(0, 2 * np.pi, (n, 1))], 1)
    f2 = np.concatenate([x2, (s * sig1)[:, None],
                         (f1[:, 3:] + th)], 1).astype(np.float32)
    # corrupt 15 matches
    f2[-15:, :2] = rng.uniform(0, 400, (15, 2))
    res = vote_and_verify(f1, f2, image_extent=512.0)
    inl = np.asarray(res.inliers)
    assert float(res.score) >= 25
    assert inl[:35].mean() > 0.8
    assert inl[-15:].mean() < 0.2


def test_vote_and_verify_pyramid_beats_single_level(rng):
    """Cluttered scene (VERDICT r2 item 8): the true transform's votes
    are jittered across several ADJACENT fine bins, while a decoy
    transform concentrates all its votes in ONE bin. Single-level
    scoring (n_levels=1) seeds from the decoy bin; the multi-resolution
    pyramid aggregates the true cluster's parent votes and wins
    (vote_and_verify.cc:294-318). n_seeds=1 isolates the scoring."""
    n_true, n_decoy = 20, 8
    x1t = rng.uniform(50, 450, (n_true, 2)).astype(np.float32)
    # true transform: identity rotation/scale, translation (64, 64) —
    # exactly a translation-bin BOUNDARY (bin width 64 px at
    # image_extent=512, bins_t=16), so +-40 px jitter splits the votes
    # evenly over a 2x2 block of fine bins (~5 votes each)
    jit = rng.uniform(-40, 40, (n_true, 2)).astype(np.float32)
    x2t = x1t + np.float32([64.0, 64.0]) + jit
    x1d = rng.uniform(50, 450, (n_decoy, 2)).astype(np.float32)
    # decoy: one EXACT consistent translation, all votes in one bin
    x2d = x1d + np.float32([-200.0, 150.0])
    sig = rng.uniform(2, 4, n_true + n_decoy).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, n_true + n_decoy).astype(np.float32)
    f1 = np.concatenate([np.concatenate([x1t, x1d]), sig[:, None],
                         ang[:, None]], 1).astype(np.float32)
    f2 = np.concatenate([np.concatenate([x2t, x2d]), sig[:, None],
                         ang[:, None]], 1).astype(np.float32)
    res_flat = vote_and_verify(f1, f2, image_extent=512.0, n_seeds=1,
                               n_levels=1, threshold=60.0)
    res_pyr = vote_and_verify(f1, f2, image_extent=512.0, n_seeds=1,
                              n_levels=6, threshold=60.0)
    # flat scoring locks onto the decoy (8 inliers); the pyramid ranks
    # the true cluster's bin first (20 jittered inliers at thresh 60)
    assert float(res_pyr.n_inliers) > float(res_flat.n_inliers)
    assert np.asarray(res_pyr.inliers)[:n_true].mean() > 0.8
    assert np.asarray(res_flat.inliers)[n_true:].mean() > 0.8
