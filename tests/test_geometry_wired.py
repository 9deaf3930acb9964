"""Round-3 geometry wiring: 5pt/7pt solvers inside RANSAC, the
calibrated two-view decision, and guided matching inside match_pairs.

Mirrors the reference call paths: TwoViewGeometry::EstimateCalibrated
(two_view_geometry.cc) drives EssentialMatrixFivePointEstimator through
RANSAC; SiftMatchingOptions.guided_matching re-matches verified pairs
(sift.cc:252-340)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvt_tpu.match import (ransac_essential, ransac_fundamental,
                           estimate_two_view_geometry, sampson_error)


def _two_view_scene(n, seed=0, noise=0.0, outliers=0):
    rng = np.random.default_rng(seed)
    aa = rng.normal(size=3) * 0.2
    th = np.linalg.norm(aa)
    k = aa / (th + 1e-12)
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    r = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t)
    pts3 = rng.uniform([-1, -1, 4], [1, 1, 8], size=(n, 3))
    p1 = pts3[:, :2] / pts3[:, 2:3]
    c2 = pts3 @ r.T + t
    p2 = c2[:, :2] / c2[:, 2:3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e = tx @ r
    e = e / np.linalg.norm(e)
    if noise:
        p1 = p1 + rng.normal(size=p1.shape) * noise
        p2 = p2 + rng.normal(size=p2.shape) * noise
    if outliers:
        p2[:outliers] = rng.uniform(-1, 1, size=(outliers, 2))
    return (p1.astype(np.float32), p2.astype(np.float32),
            e.astype(np.float32), r, t)


def test_ransac_essential_with_outliers():
    n, n_out = 60, 18
    p1, p2, e_true, r, t = _two_view_scene(n, seed=4, noise=1e-4,
                                           outliers=n_out)
    # threshold ~5x the coordinate noise: a loose threshold (50x) lets
    # wrong-direction E candidates tie the true model's support on this
    # shallow frustum geometry (epipolar ambiguity), which is a property
    # of the problem, not the solver
    emat, inl, n_inl = ransac_essential(
        jax.random.key(0), p1, p2, threshold=0.0005, n_hypotheses=48)
    n_inl = int(n_inl)
    assert n_inl >= int(0.9 * (n - n_out)), n_inl
    em = np.asarray(emat)
    em = em / np.linalg.norm(em)
    d = min(np.linalg.norm(em - e_true), np.linalg.norm(em + e_true))
    assert d < 0.05, d
    # outlier rows rejected
    assert np.asarray(inl)[:n_out].sum() <= 2


def test_ransac_fundamental_7pt_method():
    n, n_out = 50, 12
    p1, p2, e_true, _, _ = _two_view_scene(n, seed=9, noise=1e-4,
                                           outliers=n_out)
    f7, inl7, n7 = ransac_fundamental(
        jax.random.key(1), p1, p2, threshold=0.005, n_hypotheses=64,
        method="7pt")
    assert int(n7) >= int(0.9 * (n - n_out)), int(n7)
    fm = np.asarray(f7) / np.linalg.norm(np.asarray(f7))
    # normalized coords: F == E up to sign/scale
    d = min(np.linalg.norm(fm - e_true), np.linalg.norm(fm + e_true))
    assert d < 0.08, d
    with pytest.raises(ValueError):
        ransac_fundamental(jax.random.key(0), p1, p2, method="6pt")


def test_two_view_calibrated_uses_essential():
    """With correct intrinsics the pair must classify CALIBRATED (E
    holds up vs F) and recover the true relative pose direction."""
    n = 80
    p1n, p2n, e_true, r_true, t_true = _two_view_scene(n, seed=2,
                                                       noise=5e-5)
    focal = 600.0
    kmat = np.array([[focal, 0, 320], [0, focal, 240], [0, 0, 1]],
                    np.float32)
    px1 = p1n * focal + np.array([320, 240], np.float32)
    px2 = p2n * focal + np.array([320, 240], np.float32)
    geom = estimate_two_view_geometry(
        jax.random.key(0), px1, px2, k1=kmat, k2=kmat, f_threshold=2.0,
        min_inliers=15)
    assert geom.config_name == "calibrated", geom.config_name
    assert geom.n_inliers >= int(0.9 * n)
    assert geom.r is not None and geom.t is not None
    # pose direction matches ground truth (t up to scale)
    tdir = geom.t / np.linalg.norm(geom.t)
    assert min(np.linalg.norm(tdir - t_true),
               np.linalg.norm(tdir + t_true)) < 0.1
    rd = np.abs(np.trace(geom.r.T @ r_true))
    assert rd > 2.9, rd  # trace(R^T R_true) ~ 3 when equal


def test_guided_matching_in_match_pairs(tmp_path):
    """guided=True recovers more two-view inlier matches than the plain
    ratio pass on a pair with near-duplicate descriptors."""
    from cvt_tpu.io.database import FeatureDatabase
    from cvt_tpu.match.pipelines import match_pairs

    rng = np.random.default_rng(0)
    n = 60
    # planar scene: image 2 = image 1 translated
    kp1 = rng.uniform(10, 200, size=(n, 2)).astype(np.float32)
    kp2 = kp1 + np.array([7.0, -3.0], np.float32)
    base = rng.normal(size=(n, 32)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + rng.normal(size=base.shape).astype(np.float32) * 0.15
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    # 40 queries sit halfway between their true match and a far-away
    # decoy (ratio ~1 -> plain Lowe test rejects them); 20 are clean so
    # the plain pass still finds enough matches to verify a geometry
    d1 = 0.5 * base + 0.5 * dup
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d1[:20] = base[:20]
    d2 = np.concatenate([base, dup])
    decoy_kp = kp2 + rng.uniform(80, 120, size=kp2.shape).astype(np.float32)
    kp2_all = np.concatenate([kp2, decoy_kp]).astype(np.float32)

    def build_db(path):
        db = FeatureDatabase(path)
        i1 = db.add_image("a.jpg", 1)
        i2 = db.add_image("b.jpg", 1)
        db.write_keypoints(i1, kp1)
        db.write_descriptors(i1, d1)
        db.write_keypoints(i2, kp2_all)
        db.write_descriptors(i2, d2)
        db.commit()
        return db, i1, i2

    db_p, a, b = build_db(str(tmp_path / "plain.db"))
    match_pairs(db_p, [(a, b)], ratio=0.85, min_num_matches=5,
                guided=False)
    inl_plain, _, _ = db_p.read_two_view_geometry(a, b)

    db_g, a2, b2 = build_db(str(tmp_path / "guided.db"))
    match_pairs(db_g, [(a2, b2)], ratio=0.85, min_num_matches=5,
                guided=True, guided_error=4.0)
    inl_guided, _, _ = db_g.read_two_view_geometry(a2, b2)

    assert len(inl_guided) > len(inl_plain), (len(inl_guided),
                                              len(inl_plain))
    # guided matches point at the true (first-half) entries
    assert (inl_guided[:, 1] < n).mean() > 0.9
