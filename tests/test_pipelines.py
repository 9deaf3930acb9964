"""Tests for matching front-ends (SURVEY.md #11 matching.cc zoo)."""

import numpy as np
import pytest

from cvt_tpu.io.database import FeatureDatabase
from cvt_tpu.match.pipelines import (exhaustive_pairs, sequential_pairs,
                                     spatial_pairs, transitive_pairs,
                                     match_pairs, vocab_tree_pairs)


def test_exhaustive_pairs_complete():
    ids = [10, 20, 30, 40, 50]
    pairs = exhaustive_pairs(ids, block_size=2)
    assert len(pairs) == 10                      # C(5,2)
    assert len(set(pairs)) == 10
    for a, b in pairs:
        assert a in ids and b in ids and a != b


def test_sequential_pairs_overlap():
    ids = list(range(6))
    pairs = sequential_pairs(ids, overlap=2)
    assert (0, 1) in pairs and (0, 2) in pairs and (0, 3) not in pairs
    quad = sequential_pairs(ids, overlap=3, quadratic=True)
    assert (0, 1) in quad and (0, 2) in quad and (0, 4) in quad


def test_spatial_pairs_by_distance():
    ids = [1, 2, 3, 4]
    pos = np.array([[0, 0], [1, 0], [50, 0], [51, 0]], np.float32)
    pairs = spatial_pairs(ids, pos, max_num_neighbors=3, max_distance=5.0)
    assert (1, 2) in pairs and (3, 4) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def _make_db_with_features(rng, n_images=4, n_kp=64, dim=32,
                           overlap_noise=0.01):
    """Images share a common descriptor pool -> all pairs match."""
    db = FeatureDatabase(":memory:")
    base_desc = rng.normal(size=(n_kp, dim)).astype(np.float32)
    base_desc /= np.linalg.norm(base_desc, axis=1, keepdims=True)
    base_xy = rng.uniform(0, 640, size=(n_kp, 2)).astype(np.float32)
    ids = []
    for i in range(n_images):
        iid = db.add_image(f"im{i}.jpg", 640, 480)
        ids.append(iid)
        d = base_desc + rng.normal(scale=overlap_noise,
                                   size=base_desc.shape).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        # keypoints: same layout shifted per image (affine-consistent)
        kp = np.concatenate([base_xy + 5.0 * i,
                             np.zeros((n_kp, 2), np.float32)], -1)
        db.write_keypoints(iid, kp)
        db.write_descriptors(iid, d)
    return db, ids


def test_match_pairs_end_to_end():
    rng = np.random.default_rng(0)
    db, ids = _make_db_with_features(rng)
    pairs = exhaustive_pairs(ids)
    stats = match_pairs(db, pairs, ratio=0.95, max_dist=0.5,
                        min_num_matches=10)
    assert stats.n_pairs == len(pairs)
    assert stats.n_matched == len(pairs)
    assert stats.n_verified == len(pairs)        # pure translation: planar
    m = db.read_matches(ids[0], ids[1])
    assert m is not None and len(m) >= 10
    # matches are identity correspondences on the shared pool
    agree = (m[:, 0] == m[:, 1]).mean()
    assert agree > 0.9
    # resume semantics: second run skips everything
    stats2 = match_pairs(db, pairs)
    assert stats2.n_skipped == len(pairs)
    geom = db.read_two_view_geometry(ids[0], ids[1])
    assert geom is not None
    inl, config, model = geom
    assert len(inl) >= 10 and model is not None


def test_transitive_pairs_closure():
    rng = np.random.default_rng(1)
    db, ids = _make_db_with_features(rng, n_images=3)
    # match only the chain (0,1) and (1,2)
    match_pairs(db, [(ids[0], ids[1]), (ids[1], ids[2])], verify=False,
                ratio=0.95, max_dist=0.5)
    new = transitive_pairs(db, ids)
    assert new == [(ids[0], ids[2])]


def test_vocab_tree_pairs_retrieval():
    pytest.importorskip("jax")
    from cvt_tpu.index import VocabHEIndex
    rng = np.random.default_rng(2)
    # two clusters of near-duplicate images; retrieval should pair
    # within clusters
    db = FeatureDatabase(":memory:")
    ids, cluster = [], []
    for c in range(2):
        pool = rng.normal(size=(48, 32)).astype(np.float32)
        pool /= np.linalg.norm(pool, axis=1, keepdims=True)
        for i in range(2):
            iid = db.add_image(f"c{c}_{i}.jpg")
            d = pool + rng.normal(scale=0.02, size=pool.shape
                                  ).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            db.write_descriptors(iid, d)
            ids.append(iid)
            cluster.append(c)
    import jax
    index = VocabHEIndex(n_words=16, dim=32)
    index.train(jax.random.PRNGKey(0),
                np.concatenate([db.read_descriptors(i) for i in ids]))
    pairs = vocab_tree_pairs(db, index, num_images=1, image_ids=ids)
    by_cluster = {(ids[0], ids[1]), (ids[2], ids[3])}
    assert by_cluster <= set(pairs)
