"""Tests for the remaining optim-layer surfaces: combination sampler
(optim/combination_sampler.cc), LAD ADMM solver
(optim/least_absolute_deviations.cc), and the ImagePairs/FeaturePairs
matcher front-ends (feature/matching.cc:1454-1660)."""

import itertools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cvt_tpu.match import (combination_minimal_samples, n_combinations,
                           ransac, solve_lad)  # noqa: E402


def test_combination_sampler_exhaustive_lexicographic():
    # matches itertools lexicographic order, all distinct, wraps around
    n, mn = 6, 3
    total = n_combinations(n, mn)
    assert total == 20
    picks = np.asarray(combination_minimal_samples(total + 3, mn, n))
    ref = np.asarray(list(itertools.combinations(range(n), mn)), np.int32)
    np.testing.assert_array_equal(picks[:total], ref)
    # wrap-around resets to the first combinations (reference resets its
    # iota state, combination_sampler.cc:64-68)
    np.testing.assert_array_equal(picks[total:], ref[:3])


def test_ransac_combination_sampler_exhaustive_recovers_model():
    # tiny problem where exhaustive enumeration is feasible: 10 points,
    # C(10, 3) = 120 affine hypotheses covers every minimal set
    rs = np.random.default_rng(0)
    A = np.array([[1.1, -0.2], [0.3, 0.9]], np.float32)
    t = np.array([5.0, -3.0], np.float32)
    src = rs.uniform(0, 100, (10, 2)).astype(np.float32)
    dst = src @ A.T + t
    dst[7] += 40.0                      # one outlier
    res = ransac(jax.random.PRNGKey(0), src, dst, model="affine",
                 threshold=2.0, n_hypotheses=120, sampler="combination",
                 min_inliers=6)
    assert bool(res.success)
    assert int(res.n_inliers) == 9
    assert not bool(res.inliers[7])


def test_lad_robust_to_outliers_vs_lstsq():
    # l1 regression must ignore gross outliers that wreck least squares
    rs = np.random.default_rng(1)
    x_true = np.array([2.0, -1.0, 0.5], np.float32)
    A = rs.normal(size=(200, 3)).astype(np.float32)
    b = A @ x_true
    b[:20] += rs.uniform(50, 100, 20)   # 10% gross outliers
    res = solve_lad(A, b, max_iters=500)
    x_l2, *_ = np.linalg.lstsq(A, b, rcond=None)
    err_l1 = np.linalg.norm(np.asarray(res.x) - x_true)
    err_l2 = np.linalg.norm(x_l2 - x_true)
    assert err_l1 < 0.05
    assert err_l1 < err_l2 / 10
    assert bool(res.converged)


def test_lad_exact_on_clean_system():
    rs = np.random.default_rng(2)
    A = rs.normal(size=(50, 4)).astype(np.float32)
    x_true = rs.normal(size=(4,)).astype(np.float32)
    res = solve_lad(A, A @ x_true, max_iters=400)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=5e-3)


@pytest.fixture
def db_with_features(tmp_path):
    from cvt_tpu.io.database import FeatureDatabase
    rs = np.random.default_rng(3)
    db = FeatureDatabase(str(tmp_path / "f.db"))
    # three images; image b's keypoints are image a's shifted by (10, 5)
    kp_a = rs.uniform(20, 200, (60, 2)).astype(np.float32)
    desc = rs.normal(size=(60, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    ids = {}
    for name, shift in (("a.jpg", (0, 0)), ("b.jpg", (10, 5)),
                        ("c.jpg", (-4, 8))):
        iid = db.add_image(name, 256, 256)
        kp = kp_a + np.asarray(shift, np.float32)
        kp4 = np.concatenate([kp, np.ones((60, 1), np.float32),
                              np.zeros((60, 1), np.float32)], 1)
        db.write_keypoints(iid, kp4)
        db.write_descriptors(iid, desc)
        ids[name] = iid
    db.commit()
    return db, ids


def test_pairs_from_file_and_image_pairs_matcher(db_with_features, tmp_path):
    from cvt_tpu.match import pipelines as pl
    db, ids = db_with_features
    listing = tmp_path / "pairs.txt"
    listing.write_text("a.jpg b.jpg\nmissing.jpg a.jpg\nb.jpg c.jpg\n")
    pairs = pl.pairs_from_file(db, str(listing))
    assert pairs == [(ids["a.jpg"], ids["b.jpg"]),
                     (ids["b.jpg"], ids["c.jpg"])]
    stats = pl.match_pairs(db, pairs, min_num_matches=10)
    assert stats.n_pairs == 2 and stats.n_matched == 2
    m = db.read_matches(ids["a.jpg"], ids["b.jpg"])
    assert m is not None and len(m) >= 50      # identical descriptors


def test_import_feature_matches_verify(db_with_features, tmp_path):
    from cvt_tpu.match import pipelines as pl
    db, ids = db_with_features
    # ground-truth correspondence i <-> i (b = a shifted): importing it
    # should verify as a translation-consistent homography/fundamental
    rows = "\n".join(f"{i} {i}" for i in range(60))
    mfile = tmp_path / "matches.txt"
    mfile.write_text(f"a.jpg b.jpg\n{rows}\n\nb.jpg c.jpg\n{rows}\n")
    stats = pl.import_feature_matches(db, str(mfile), verify=True)
    assert stats.n_pairs == 2
    assert stats.n_matched == 2
    assert stats.n_verified == 2
    tv = db.read_two_view_geometry(ids["a.jpg"], ids["b.jpg"])
    assert tv is not None
    inl = tv[0]
    assert len(inl) >= 50
    # re-import skips existing pairs (resume semantics)
    stats2 = pl.import_feature_matches(db, str(mfile), verify=True)
    assert stats2.n_skipped == 2


def test_import_feature_matches_trusted(db_with_features, tmp_path):
    from cvt_tpu.match import pipelines as pl
    from cvt_tpu.match.two_view import UNCALIBRATED
    db, ids = db_with_features
    mfile = tmp_path / "m2.txt"
    mfile.write_text("a.jpg c.jpg\n0 0\n1 1\n2 2\n")
    stats = pl.import_feature_matches(db, str(mfile), verify=False,
                                      min_num_matches=2)
    assert stats.n_pairs == 1
    tv = db.read_two_view_geometry(ids["a.jpg"], ids["c.jpg"])
    assert tv is not None and len(tv[0]) == 3
    # trusted imports store UNCALIBRATED (reference's no-prior-focal
    # default), never config 0 which downstream consumers would drop
    assert tv[1] == UNCALIBRATED


def test_import_feature_matches_higher_id_first(db_with_features, tmp_path):
    """File lists the higher-id image first: columns must stay
    (idx-in-name1, idx-in-name2) — the db canonicalizes, the importer
    must NOT pre-swap the ids without swapping the columns."""
    from cvt_tpu.match import pipelines as pl
    db, ids = db_with_features
    assert ids["c.jpg"] > ids["a.jpg"]
    # asymmetric correspondence: idx-in-c = i, idx-in-a = 59 - i
    rows = "\n".join(f"{i} {59 - i}" for i in range(60))
    mfile = tmp_path / "m3.txt"
    mfile.write_text(f"c.jpg a.jpg\n{rows}\n")
    pl.import_feature_matches(db, str(mfile), verify=False,
                              min_num_matches=2)
    m = db.read_matches(ids["c.jpg"], ids["a.jpg"])
    assert m is not None and len(m) == 60
    m = m[np.argsort(m[:, 0])]
    np.testing.assert_array_equal(m[:, 0], np.arange(60))
    np.testing.assert_array_equal(m[:, 1], 59 - np.arange(60))
