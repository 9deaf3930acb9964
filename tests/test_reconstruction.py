"""Tests for the scene-graph layer (SURVEY.md #14: correspondence graph,
tracks, reconstruction) and GPS transforms (base/gps.cc)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cvt_tpu.match import gps
from cvt_tpu.match.bundle import rodrigues
from cvt_tpu.match.reconstruction import (
    CorrespondenceGraph, Reconstruction, triangulate_tracks)


# ---------------------------------------------------------------------------
# GPS
# ---------------------------------------------------------------------------

def test_gps_ecef_roundtrip():
    lla = np.array([[37.7749, -122.4194, 10.0],
                    [-33.8688, 151.2093, 58.0],
                    [0.0, 0.0, 0.0]])
    xyz = gps.ell_to_ecef(lla)
    # equator/prime-meridian point sits at (a, 0, 0)
    np.testing.assert_allclose(xyz[2], [6378137.0, 0.0, 0.0], atol=1e-6)
    back = gps.ecef_to_ell(xyz)
    np.testing.assert_allclose(back, lla, atol=1e-7)


def test_gps_enu_local():
    # ENU at the reference point itself is the origin; a point 100m up
    # is (0, 0, 100)
    lat0, lon0, alt0 = 48.8566, 2.3522, 35.0
    enu = gps.ell_to_enu(np.array([[lat0, lon0, alt0],
                                   [lat0, lon0, alt0 + 100.0]]),
                         lat0, lon0, alt0)
    np.testing.assert_allclose(enu[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(enu[1], [0.0, 0.0, 100.0], atol=1e-4)
    # roundtrip through ECEF
    ecef = gps.enu_to_ecef(enu, lat0, lon0, alt0)
    np.testing.assert_allclose(
        ecef, gps.ell_to_ecef(np.array([[lat0, lon0, alt0],
                                        [lat0, lon0, alt0 + 100.0]])),
        atol=1e-6)


def test_gps_unknown_ellipsoid():
    with pytest.raises(ValueError):
        gps.ell_to_ecef(np.zeros(3), "sphere")


# ---------------------------------------------------------------------------
# correspondence graph / tracks
# ---------------------------------------------------------------------------

def test_correspondence_graph_tracks():
    g = CorrespondenceGraph()
    # feature 0 of img1 <-> feature 2 of img2 <-> feature 5 of img3
    g.add_correspondences(1, 2, [[0, 2]])
    g.add_correspondences(2, 3, [[2, 5]])
    # independent 2-track
    g.add_correspondences(1, 3, [[7, 9]])
    tracks = g.build_tracks()
    assert len(tracks) == 2
    assert tracks[0].shape == (3, 2)      # longest first
    assert set(map(tuple, tracks[0])) == {(1, 0), (2, 2), (3, 5)}
    assert set(map(tuple, tracks[1])) == {(1, 7), (3, 9)}
    assert g.num_correspondences(1) == 2


def test_correspondence_graph_drops_inconsistent():
    g = CorrespondenceGraph()
    # track that would observe image 1 twice (features 0 and 1)
    g.add_correspondences(1, 2, [[0, 3], [1, 3]])
    assert g.build_tracks() == []


# ---------------------------------------------------------------------------
# triangulation + reconstruction + BA
# ---------------------------------------------------------------------------

def _synthetic_scene(rng, n_cams=4, n_pts=30):
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(4, 8, n_pts)], -1)
    poses = []
    for c in range(n_cams):
        rvec = rng.normal(size=3) * 0.05
        tvec = np.array([0.5 * c - 0.75, 0.0, 0.0]) + rng.normal(size=3) * .02
        poses.append(np.concatenate([rvec, tvec]))
    poses = np.stack(poses).astype(np.float32)
    rots = np.asarray(rodrigues(jnp.asarray(poses[:, :3])))
    uv = np.zeros((n_cams, n_pts, 2), np.float32)
    for c in range(n_cams):
        cam = pts @ rots[c].T + poses[c, 3:]
        uv[c] = cam[:, :2] / cam[:, 2:3]
    return poses, pts, uv


def test_triangulate_tracks_exact():
    rng = np.random.default_rng(0)
    poses, pts, uv = _synthetic_scene(rng)
    n_cams, n_pts = uv.shape[:2]
    rots = np.asarray(rodrigues(jnp.asarray(poses[:, :3])))
    cam_idx = np.tile(np.arange(n_cams, dtype=np.int32), (n_pts, 1))
    obs = np.transpose(uv, (1, 0, 2)).astype(np.float32)
    mask = np.ones((n_pts, n_cams), np.float32)
    got, ok = triangulate_tracks(
        jnp.asarray(rots), jnp.asarray(poses[:, 3:].astype(np.float32)),
        jnp.asarray(cam_idx), jnp.asarray(obs), jnp.asarray(mask))
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(got), pts, atol=1e-2)


def test_reconstruction_end_to_end():
    rng = np.random.default_rng(1)
    poses, pts, uv = _synthetic_scene(rng)
    n_cams, n_pts = uv.shape[:2]
    rec = Reconstruction()
    for c in range(n_cams):
        rec.register_image(c, f"im{c}", poses[c, :3], poses[c, 3:], uv[c])
    g = CorrespondenceGraph()
    for c in range(n_cams - 1):
        g.add_correspondences(
            c, c + 1, np.stack([np.arange(n_pts)] * 2, -1))
    tracks = g.build_tracks()
    assert len(tracks) == n_pts and all(len(t) == n_cams for t in tracks)
    added = rec.triangulate(tracks, max_error=0.01)
    assert added == n_pts
    # perturb points, BA should pull the cost back down
    for p in rec.points3d.values():
        p.xyz = p.xyz + rng.normal(size=3) * 0.05
    cost = rec.bundle_adjust(iters=10, n_fixed_poses=n_cams)
    assert cost < 1e-6
    assert rec.filter_points(max_error=1e-3) == 0
