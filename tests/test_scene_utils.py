"""Scene utilities (base/{scene_clustering, visibility_pyramid,
graph_cut}), translation/similarity estimators, image warps."""

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.match.scene_graph_utils import (SceneCluster, cluster_scene,
                                             min_st_cut, normalized_cut,
                                             VisibilityPyramid)


def _two_community_graph(rng, n_half=12, p_in=0.8, p_out=0.05):
    edges, weights = [], []
    n = 2 * n_half
    for a in range(n):
        for b in range(a + 1, n):
            same = (a < n_half) == (b < n_half)
            if rng.random() < (p_in if same else p_out):
                edges.append((a, b))
                weights.append(rng.uniform(5, 10) if same
                               else rng.uniform(0.1, 0.5))
    return np.asarray(edges), np.asarray(weights), n


def test_normalized_cut_separates_communities():
    rng = np.random.default_rng(0)
    edges, weights, n = _two_community_graph(rng)
    labels = normalized_cut(edges, weights, n)
    a = labels[:n // 2]
    b = labels[n // 2:]
    # homogeneous within each community (up to label swap)
    assert (a == a[0]).mean() > 0.9
    assert (b == b[0]).mean() > 0.9
    assert a[0] != b[0]


def test_min_st_cut_simple():
    # s -1- a -0.1- b -1- t : min cut severs the 0.1 edge
    edges = [(0, 1), (1, 2), (2, 3)]
    caps = [1.0, 0.1, 1.0]
    flow, labels = min_st_cut(edges, caps, 4, 0, 3)
    assert abs(flow - 0.1) < 1e-9
    assert labels[0] == 1 and labels[1] == 1
    assert labels[2] == 0 and labels[3] == 0


def test_cluster_scene_recursive():
    rng = np.random.default_rng(1)
    edges, weights, n = _two_community_graph(rng, n_half=16)
    ids = [100 + i for i in range(n)]
    root = cluster_scene(ids, edges, weights, leaf_max_images=20,
                        image_overlap=2)
    assert not root.is_leaf
    leaves = root.leaves()
    assert len(leaves) >= 2
    covered = set()
    for lf in leaves:
        covered |= set(lf.image_ids)
    assert covered == set(ids)
    # each community mostly lands in one leaf
    first = [lf for lf in leaves if 100 in lf.image_ids][0]
    in_first = sum(1 for i in range(16) if 100 + i in first.image_ids)
    assert in_first >= 14


def test_visibility_pyramid_scores():
    vp = VisibilityPyramid(num_levels=4, width=100, height=100)
    assert vp.score == 0
    vp.add_point(10, 10)
    s1 = vp.score
    assert s1 == sum(1 << (2 * lv) for lv in range(1, 5))
    # same cell again: no score change
    vp.add_point(10.5, 10.5)
    assert vp.score == s1
    # far point: doubles
    vp.add_point(90, 90)
    assert vp.score == 2 * s1
    vp.remove_point(10, 10)
    vp.remove_point(10.5, 10.5)
    assert vp.score == s1


def test_translation_similarity_ransac():
    from cvt_tpu.match.ransac import ransac
    rng = np.random.default_rng(2)
    src = rng.uniform(0, 640, (80, 2)).astype(np.float32)
    dst = src + np.array([7.0, -3.0], np.float32)
    out = rng.choice(80, 20, replace=False)
    dst[out] += rng.uniform(40, 90, (20, 2)).astype(np.float32)
    res = ransac(jax.random.key(0), src, dst, model="translation",
                 threshold=2.0, min_inliers=4)
    assert int(res.n_inliers) >= 58
    np.testing.assert_allclose(np.asarray(res.model), [7.0, -3.0],
                               atol=0.1)
    # similarity: scale 1.5 + 30deg rotation
    ang = np.pi / 6
    rot = np.array([[np.cos(ang), -np.sin(ang)],
                    [np.sin(ang), np.cos(ang)]], np.float32)
    dst2 = 1.5 * src @ rot.T + np.array([10.0, 5.0], np.float32)
    res2 = ransac(jax.random.key(1), src, dst2, model="similarity",
                  threshold=2.0, min_inliers=4)
    assert int(res2.n_inliers) >= 75
    m = np.asarray(res2.model)
    np.testing.assert_allclose(m[:, :2], 1.5 * rot, atol=1e-2)


def test_similarity_transform_umeyama():
    from cvt_tpu.match.pose import similarity_transform
    rng = np.random.default_rng(3)
    src = rng.normal(size=(30, 3)).astype(np.float32)
    ang = 0.4
    r_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                      np.float32)
    dst = 2.5 * src @ r_true.T + np.array([1, -2, 3], np.float32)
    s, r, t = similarity_transform(src, dst)
    np.testing.assert_allclose(float(s), 2.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), [1, -2, 3], atol=1e-3)


def test_warp_image_homography_translation():
    from cvt_tpu.apps.undistort import warp_image_homography
    img = np.zeros((32, 32), np.float32)
    img[8:12, 8:12] = 1.0
    # H maps target pixel -> source pixel: shift content by (+4, +2)
    h = np.array([[1, 0, -4], [0, 1, -2], [0, 0, 1]], np.float32)
    out = np.asarray(warp_image_homography(img, h, 32, 32))
    assert out[10 + 2, 10 + 4] == 1.0
    assert out[10, 10] == 0.0


def test_warp_between_cameras_identity():
    from cvt_tpu.apps.undistort import warp_between_cameras
    rng = np.random.default_rng(4)
    img = rng.random((24, 24)).astype(np.float32)
    p = np.array([30.0, 11.5, 11.5], np.float32)   # simple_pinhole
    out = np.asarray(warp_between_cameras(img, "simple_pinhole", p,
                                          "simple_pinhole", p))
    np.testing.assert_allclose(out, img, atol=1e-4)
