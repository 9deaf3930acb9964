"""Bundle adjustment tests (SURVEY.md #13 optim / #17 PBA)."""

import numpy as np
import jax.numpy as jnp

from cvt_tpu.match.bundle import (BAProblem, bundle_adjust, rodrigues,
                                  rotation_to_rvec)


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(0)
    rv = rng.normal(size=(10, 3)).astype(np.float32)
    r = rodrigues(jnp.asarray(rv))
    dets = np.asarray(jnp.linalg.det(r))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)
    back = np.asarray(rotation_to_rvec(r))
    np.testing.assert_allclose(back, rv, atol=1e-4)


def _synthetic_ba(rng, n_cams=4, n_pts=60, noise=0.0):
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
    poses = []
    for c in range(n_cams):
        ang = 0.05 * c
        rv = np.array([0, ang, 0], np.float32)
        tv = np.array([0.3 * c, 0, 0], np.float32)
        poses.append(np.concatenate([rv, tv]))
    poses = np.stack(poses)
    cam_idx, pt_idx, uvs = [], [], []
    for c in range(n_cams):
        r = np.asarray(rodrigues(jnp.asarray(poses[c, :3])))
        cam = pts @ r.T + poses[c, 3:]
        uv = cam[:, :2] / cam[:, 2:3]
        cam_idx.append(np.full(n_pts, c))
        pt_idx.append(np.arange(n_pts))
        uvs.append(uv + rng.normal(scale=noise, size=uv.shape))
    return (poses, pts,
            np.concatenate(cam_idx).astype(np.int32),
            np.concatenate(pt_idx).astype(np.int32),
            np.concatenate(uvs).astype(np.float32))


def test_ba_recovers_from_perturbation():
    rng = np.random.default_rng(1)
    poses, pts, cam_idx, pt_idx, uv = _synthetic_ba(rng)
    poses_noisy = poses.copy()
    poses_noisy[1:] += rng.normal(scale=0.01, size=poses[1:].shape
                                  ).astype(np.float32)
    pts_noisy = pts + rng.normal(scale=0.05, size=pts.shape
                                 ).astype(np.float32)
    prob = BAProblem(jnp.asarray(poses_noisy), jnp.asarray(pts_noisy),
                     jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                     jnp.asarray(uv), jnp.ones(uv.shape[0]))
    p_out, x_out, cost = bundle_adjust(prob, iters=25, cg_iters=40)
    # reprojection cost should collapse to ~0 (exact observations)
    assert float(cost) < 1e-6
    # first (gauge-fixing) camera untouched
    np.testing.assert_allclose(np.asarray(p_out)[0], poses[0], atol=1e-7)


def test_ba_masked_padding_ignored():
    rng = np.random.default_rng(2)
    poses, pts, cam_idx, pt_idx, uv = _synthetic_ba(rng, n_cams=3, n_pts=30)
    # append garbage padded observations with mask 0
    pad = 17
    cam_idx = np.concatenate([cam_idx, np.zeros(pad, np.int32)])
    pt_idx = np.concatenate([pt_idx, np.zeros(pad, np.int32)])
    uv_pad = np.concatenate([uv, rng.normal(size=(pad, 2)).astype(
        np.float32) * 100])
    mask = np.concatenate([np.ones(uv.shape[0]), np.zeros(pad)])
    pts_noisy = pts + rng.normal(scale=0.03, size=pts.shape
                                 ).astype(np.float32)
    prob = BAProblem(jnp.asarray(poses), jnp.asarray(pts_noisy),
                     jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                     jnp.asarray(uv_pad), jnp.asarray(mask))
    p_out, x_out, cost = bundle_adjust(prob, iters=20, cg_iters=30,
                                       n_fixed_poses=3)
    assert float(cost) < 1e-6
    np.testing.assert_allclose(np.asarray(x_out), pts, atol=1e-2)


def test_ba_huber_downweights_outliers():
    rng = np.random.default_rng(3)
    poses, pts, cam_idx, pt_idx, uv = _synthetic_ba(rng, n_cams=3, n_pts=40)
    uv_bad = uv.copy()
    bad = rng.choice(uv.shape[0], 10, replace=False)
    uv_bad[bad] += rng.uniform(0.3, 0.8, size=(10, 2)).astype(np.float32)
    pts_noisy = pts + rng.normal(scale=0.02, size=pts.shape
                                 ).astype(np.float32)
    prob = BAProblem(jnp.asarray(poses), jnp.asarray(pts_noisy),
                     jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                     jnp.asarray(uv_bad), jnp.ones(uv.shape[0]))
    _, x_rob, _ = bundle_adjust(prob, iters=25, cg_iters=30,
                                n_fixed_poses=3, huber_delta=0.01)
    _, x_l2, _ = bundle_adjust(prob, iters=25, cg_iters=30,
                               n_fixed_poses=3)
    err_rob = np.abs(np.asarray(x_rob) - pts).mean()
    err_l2 = np.abs(np.asarray(x_l2) - pts).mean()
    assert err_rob < err_l2
