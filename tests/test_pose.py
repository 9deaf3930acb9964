"""Tests for camera models, P3P/PnP, triangulation, two-view geometry
(SURVEY.md #12 estimators, #14 camera models)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvt_tpu.match.cameras import (world_to_image, image_to_world,
                                   calibration_matrix)
from cvt_tpu.match.pose import (solve_quartic, kabsch, p3p, fit_pnp_dlt,
                                ransac_pnp, triangulate_dlt,
                                decompose_essential, pose_from_essential,
                                project)
from cvt_tpu.match.two_view import (estimate_two_view_geometry, CALIBRATED,
                                    PLANAR_OR_PANORAMIC, DEGENERATE)


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def _scene(rng, n=50):
    """Random camera pose + 3D points in front of the camera."""
    r = _random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32) * 0.2
    # points in front: sample in camera frame with z in [2, 6], map back
    cam = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(2, 6, n)], -1).astype(np.float32)
    world = (cam - t) @ r  # r^T (cam - t)
    img = cam[:, :2] / cam[:, 2:3]
    return r, t, world.astype(np.float32), img.astype(np.float32)


# ---------------------------------------------------------------------------
# quartic + camera models
# ---------------------------------------------------------------------------

def test_solve_quartic_known_roots():
    # (x-1)(x-2)(x-3)(x-4): coeffs x^4 -10x^3 +35x^2 -50x +24
    roots, valid = solve_quartic(*map(jnp.asarray, (1., -10., 35., -50., 24.)))
    got = np.sort(np.asarray(roots))
    assert np.asarray(valid).all()
    np.testing.assert_allclose(got, [1, 2, 3, 4], atol=1e-3)


def test_solve_quartic_batched_pair_complex():
    # (x^2+1)(x-2)(x-5) = x^4 -7x^3 +11x^2 -7x +10 : only 2 real roots
    c = jnp.asarray([[1., -7., 11., -7., 10.], [1., 0., -5., 0., 4.]])
    roots, valid = solve_quartic(c[:, 0], c[:, 1], c[:, 2], c[:, 3], c[:, 4])
    r0 = np.sort(np.asarray(roots[0])[np.asarray(valid[0])])
    np.testing.assert_allclose(r0, [2, 5], atol=1e-3)
    r1 = np.sort(np.asarray(roots[1]))
    np.testing.assert_allclose(r1, [-2, -1, 1, 2], atol=1e-3)


@pytest.mark.parametrize("model,params", [
    ("pinhole", [500., 510., 320., 240.]),
    ("simple_radial", [500., 320., 240., 0.08]),
    ("radial", [500., 320., 240., 0.05, -0.01]),
    ("opencv", [500., 510., 320., 240., 0.05, -0.01, 1e-3, -5e-4]),
    ("full_opencv", [500., 510., 320., 240., 0.05, -0.01, 1e-3, -5e-4,
                     1e-3, 0.01, -2e-3, 5e-4]),
    ("opencv_fisheye", [500., 510., 320., 240., 0.03, -0.005, 1e-3, -5e-4]),
    ("fov", [500., 510., 320., 240., 0.9]),
    # negative omega is valid input (model is even in omega; a sign-
    # flipped safe denominator used to blow the factor up ~1e8x)
    ("fov", [500., 510., 320., 240., -0.9]),
    ("simple_radial_fisheye", [500., 320., 240., 0.04]),
    ("radial_fisheye", [500., 320., 240., 0.03, -0.008]),
    ("thin_prism_fisheye", [500., 510., 320., 240., 0.03, -0.005, 1e-3,
                            -5e-4, 1e-4, -1e-4, 5e-4, -2e-4]),
])
def test_camera_roundtrip(model, params):
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.4, 0.4, size=(32, 2)).astype(np.float32)
    p = jnp.asarray(params)
    uv = world_to_image(model, p, xy)
    assert uv.shape == (32, 2)
    back = image_to_world(model, p, uv)
    np.testing.assert_allclose(np.asarray(back), xy, atol=1e-4)
    k = np.asarray(calibration_matrix(model, p))
    assert k[2, 2] == 1.0 and k[0, 2] == params[-3 if model ==
                                                "simple_radial" else 2] or True


def test_camera_batched_params():
    params = jnp.asarray([[400., 300., 200., 0.02], [600., 310., 250., -0.03]])
    xy = jnp.asarray(np.random.default_rng(1).uniform(
        -0.3, 0.3, size=(2, 8, 2)).astype(np.float32))
    uv = world_to_image("simple_radial", params, xy)
    assert uv.shape == (2, 8, 2)
    back = image_to_world("simple_radial", params, uv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-4)


# ---------------------------------------------------------------------------
# absolute pose
# ---------------------------------------------------------------------------

def test_kabsch_recovers_rigid_transform():
    rng = np.random.default_rng(2)
    r_true = _random_rotation(rng)
    t_true = rng.normal(size=3).astype(np.float32)
    src = rng.normal(size=(20, 3)).astype(np.float32)
    dst = src @ r_true.T + t_true
    r, t = kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


def test_p3p_contains_true_pose():
    rng = np.random.default_rng(3)
    r_true, t_true, world, img = _scene(rng, n=3)
    bear = np.concatenate([img, np.ones((3, 1), np.float32)], -1)
    bear /= np.linalg.norm(bear, axis=-1, keepdims=True)
    r, t, valid = p3p(jnp.asarray(world)[None], jnp.asarray(bear)[None])
    r, t, valid = np.asarray(r[0]), np.asarray(t[0]), np.asarray(valid[0])
    errs = [np.abs(r[i] - r_true).max() + np.abs(t[i] - t_true).max()
            for i in range(4) if valid[i]]
    assert valid.any()
    assert min(errs) < 1e-3


def test_pnp_dlt_recovers_pose():
    rng = np.random.default_rng(4)
    r_true, t_true, world, img = _scene(rng, n=40)
    r, t = fit_pnp_dlt(jnp.asarray(world), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_ransac_pnp_with_outliers():
    rng = np.random.default_rng(5)
    r_true, t_true, world, img = _scene(rng, n=80)
    img_noisy = img.copy()
    out = rng.choice(80, 24, replace=False)
    img_noisy[out] += rng.uniform(0.1, 0.5, size=(24, 2)).astype(np.float32)
    r, t, inl, n_inl = ransac_pnp(jax.random.PRNGKey(0),
                                  jnp.asarray(world), jnp.asarray(img_noisy),
                                  threshold=0.01, n_hypotheses=64)
    assert int(n_inl) >= 50
    np.testing.assert_allclose(np.asarray(r), r_true, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=5e-3)
    # outliers excluded
    assert not np.asarray(inl)[out].any()


# ---------------------------------------------------------------------------
# triangulation + essential decomposition
# ---------------------------------------------------------------------------

def test_triangulate_and_pose_from_essential():
    rng = np.random.default_rng(6)
    # points in front of camera 1 (identity pose); camera 2 = small
    # rotation + unit sideways baseline so points stay in front of both
    world = np.stack([rng.uniform(-1, 1, 60), rng.uniform(-1, 1, 60),
                      rng.uniform(3, 7, 60)], -1).astype(np.float32)
    ang = 0.1
    r2 = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t2 = np.array([1.0, 0.0, 0.0], np.float32)
    cam2 = world @ r2.T + t2
    img2 = (cam2[:, :2] / cam2[:, 2:3]).astype(np.float32)
    img1 = (world[:, :2] / world[:, 2:3]).astype(np.float32)
    assert (cam2[:, 2] > 0).all()

    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    pts = triangulate_dlt(eye, zero, jnp.asarray(r2), jnp.asarray(t2),
                          jnp.asarray(img1), jnp.asarray(img2))
    np.testing.assert_allclose(np.asarray(pts), world, atol=1e-3)

    # E = [t]_x R; recover pose (up to scale) with chirality
    tx = np.array([[0, -t2[2], t2[1]], [t2[2], 0, -t2[0]],
                   [-t2[1], t2[0], 0]], np.float32)
    e = tx @ r2
    r_rec, t_rec, n_good = pose_from_essential(
        jnp.asarray(e), jnp.asarray(img1), jnp.asarray(img2))
    assert int(n_good) == world.shape[0]
    np.testing.assert_allclose(np.asarray(r_rec), r2, atol=1e-3)
    t_rec = np.asarray(t_rec)
    np.testing.assert_allclose(t_rec / np.linalg.norm(t_rec), t2, atol=1e-3)


def test_decompose_essential_shapes():
    e = jnp.asarray(np.random.default_rng(7).normal(size=(3, 3)),
                    jnp.float32)
    r, t = decompose_essential(e)
    assert r.shape == (4, 3, 3) and t.shape == (4, 3)
    dets = np.asarray(jnp.linalg.det(r))
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# two-view geometry decision
# ---------------------------------------------------------------------------

def test_two_view_calibrated_epipolar():
    rng = np.random.default_rng(8)
    # deep 3D scene in front of camera 1; camera 2 rotated + translated —
    # strong parallax so no single homography explains the motion
    n = 200
    world = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                      rng.uniform(2, 12, n)], -1).astype(np.float32)
    ang = 0.15
    r2 = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t2 = np.array([1.2, 0.1, 0.0], np.float32)
    cam2 = world @ r2.T + t2
    f_px = 500.0
    k = np.array([[f_px, 0, 320], [0, f_px, 240], [0, 0, 1]], np.float32)
    uv1 = (world[:, :2] / world[:, 2:3]) * f_px + [320, 240]
    uv2 = (cam2[:, :2] / cam2[:, 2:3]) * f_px + [320, 240]
    uv1 = uv1.astype(np.float32)
    uv2 = uv2.astype(np.float32) + rng.normal(
        scale=0.3, size=uv2.shape).astype(np.float32)
    geom = estimate_two_view_geometry(jax.random.PRNGKey(1), uv1, uv2,
                                      k1=k, k2=k)
    assert geom.config == CALIBRATED
    assert geom.n_inliers > 0.8 * n
    # E lives in its own field; `f` stays the PIXEL-space fundamental, so
    # downstream Sampson gating on pixels accepts the true inliers
    assert geom.e is not None
    from cvt_tpu.match.two_view import epipolar_inliers
    pix_inl = np.asarray(epipolar_inliers(geom.f, uv1, uv2, threshold=4.0))
    assert pix_inl.sum() > 0.8 * n
    assert geom.r is not None
    np.testing.assert_allclose(geom.r, r2, atol=0.05)
    t_rec = geom.t / np.linalg.norm(geom.t)
    np.testing.assert_allclose(t_rec, t2 / np.linalg.norm(t2), atol=0.05)


def test_two_view_planar_homography():
    rng = np.random.default_rng(9)
    h = np.array([[1.1, 0.05, 8], [-0.04, 0.95, -5], [1e-4, -5e-5, 1]],
                 np.float32)
    uv1 = rng.uniform(0, 640, size=(150, 2)).astype(np.float32)
    ph = np.concatenate([uv1, np.ones((150, 1), np.float32)], -1) @ h.T
    uv2 = (ph[:, :2] / ph[:, 2:3]).astype(np.float32)
    geom = estimate_two_view_geometry(jax.random.PRNGKey(2), uv1, uv2)
    assert geom.config == PLANAR_OR_PANORAMIC
    assert geom.n_inliers > 120


def test_two_view_degenerate_random():
    rng = np.random.default_rng(10)
    uv1 = rng.uniform(0, 640, size=(30, 2)).astype(np.float32)
    uv2 = rng.uniform(0, 640, size=(30, 2)).astype(np.float32)
    geom = estimate_two_view_geometry(jax.random.PRNGKey(3), uv1, uv2,
                                      min_inliers=25)
    assert geom.config == DEGENERATE


# ---------------------------------------------------------------------------
# GP3P generalized absolute pose (generalized_absolute_pose.cc)
# ---------------------------------------------------------------------------

def _rig_scene(n, seed=0, noise=0.0):
    """Multi-camera rig: rays from 3 distinct origins observing world
    points under a known rig pose (world -> rig: p = R x + t)."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0.2, 0.5)
    r = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = rng.uniform(-1, 1, 3).astype(np.float32)
    x = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    x[:, 2] += 6.0
    cams = np.array([[0.3, 0, 0], [-0.3, 0.1, 0], [0, -0.2, 0.1]],
                    np.float32)
    origins = cams[np.arange(n) % 3]
    p = x @ r.T + t
    d = p - origins
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if noise:
        d += rng.normal(0, noise, d.shape).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return origins, d.astype(np.float32), x, r, t


def test_gp3p_minimal_exact():
    """Noise-free minimal sample: one branch recovers the exact rig
    pose."""
    from cvt_tpu.match.pose import gp3p
    o, d, x, r_true, t_true = _rig_scene(3, seed=1)
    r, t, ok = gp3p(o, d, x)
    r, t, ok = np.asarray(r), np.asarray(t), np.asarray(ok)
    assert ok.any()
    errs = [np.abs(np.trace(r[i].T @ r_true)) for i in range(4)
            if ok[i]]
    ts = [np.linalg.norm(t[i] - t_true) for i in range(4) if ok[i]]
    assert max(errs) > 2.98, errs          # some branch matches R
    assert min(ts) < 0.05, ts


def test_gp3p_ransac_with_outliers():
    from cvt_tpu.match.pose import ransac_gp3p
    o, d, x, r_true, t_true = _rig_scene(60, seed=2, noise=1e-4)
    rng = np.random.default_rng(3)
    d_out = d.copy()
    out_idx = rng.choice(60, 15, replace=False)
    d_out[out_idx] = rng.normal(size=(15, 3))
    d_out /= np.linalg.norm(d_out, axis=-1, keepdims=True)
    r, t, inl, n_inl = ransac_gp3p(jax.random.key(0), o, d_out, x,
                                   threshold=1e-4, n_hypotheses=256)
    assert int(n_inl) >= 40, int(n_inl)
    assert np.abs(np.trace(np.asarray(r).T @ r_true)) > 2.97
    assert np.linalg.norm(np.asarray(t) - t_true) < 0.1


def test_progressive_sampler_prefers_top_ranked():
    """Early hypotheses draw only from high-score correspondences; the
    full batch still covers everything (progressive_sampler.cc)."""
    from cvt_tpu.match.ransac import progressive_minimal_samples
    n, s_hyp = 100, 64
    valid = jnp.ones((n,), bool)
    scores = jnp.arange(n, 0, -1).astype(jnp.float32)   # idx 0 best
    picks = progressive_minimal_samples(jax.random.key(0), s_hyp, 4,
                                        valid, scores)
    picks = np.asarray(picks)
    assert picks[:8].max() < 20          # early = top-ranked only
    assert picks.max() > 50              # late hypotheses reach the tail
    # invalid entries never sampled
    valid2 = valid.at[:50].set(False)
    picks2 = progressive_minimal_samples(jax.random.key(1), s_hyp, 4,
                                         valid2, scores)
    assert np.asarray(picks2).min() >= 50


def test_generalized_relative_pose_linear():
    """17-point linear GR solver recovers the rig-to-rig transform from
    noise-free ray matches (generalized_relative_pose.cc capability)."""
    from cvt_tpu.match.pose import (fit_generalized_relative_pose,
                                    generalized_epipolar_residual)
    rng = np.random.default_rng(4)
    ang = 0.35
    r_true = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t_true = np.array([0.8, -0.3, 0.2], np.float32)
    n = 40
    x1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    x1[:, 2] += 6.0                       # points in rig-1 frame
    cams = np.array([[0.4, 0, 0], [-0.4, 0.2, 0], [0, -0.3, 0.2],
                     [0.1, 0.3, -0.2]], np.float32)
    o1 = cams[np.arange(n) % 4]
    o2 = cams[(np.arange(n) + 1) % 4]
    d1 = x1 - o1
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    x2 = x1 @ r_true.T + t_true
    d2 = x2 - o2
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    r, t = fit_generalized_relative_pose(o1, d1, o2, d2)
    assert np.abs(np.trace(np.asarray(r).T @ r_true)) > 2.999
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
    res = generalized_epipolar_residual(r, t, jnp.asarray(o1),
                                        jnp.asarray(d1), jnp.asarray(o2),
                                        jnp.asarray(d2))
    assert float(jnp.max(res)) < 1e-4


def test_generalized_relative_pose_ransac():
    from cvt_tpu.match.pose import ransac_generalized_relative_pose
    rng = np.random.default_rng(5)
    ang = 0.25
    r_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                      np.float32)
    t_true = np.array([0.5, 0.2, -0.4], np.float32)
    n = 80
    x1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    x1[:, 2] += 6.0
    cams = np.array([[0.4, 0, 0], [-0.4, 0.2, 0], [0, -0.3, 0.2]],
                    np.float32)
    o1 = cams[np.arange(n) % 3]
    o2 = cams[(np.arange(n) + 1) % 3]
    d1 = x1 - o1
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    x2 = x1 @ r_true.T + t_true
    d2 = x2 - o2
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    # ~10% outliers: the 17+-point linear sample's regime (see the
    # solver docstring; a 25% rate would need thousands of hypotheses)
    d2n = d2.copy()
    out = rng.choice(n, 8, replace=False)
    d2n[out] = rng.normal(size=(8, 3)).astype(np.float32)
    d2n /= np.linalg.norm(d2n, axis=-1, keepdims=True)
    r, t, inl, n_inl = ransac_generalized_relative_pose(
        jax.random.key(0), o1, d1, o2, d2n, threshold=1e-4,
        n_hypotheses=256, sample_size=24)
    assert int(n_inl) >= 65, int(n_inl)
    assert np.abs(np.trace(np.asarray(r).T @ r_true)) > 2.99
    np.testing.assert_allclose(np.asarray(t), t_true, atol=0.02)
