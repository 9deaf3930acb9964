"""CLI matcher commands e2e: extract -> match -> verified geometries in
the database (the colmap.cc:93-139 dispatch surface: feature_extractor,
exhaustive_matcher, sequential_matcher, spatial_matcher,
vocab_tree_matcher)."""

import json

import numpy as np
import pytest

from cvt_tpu.cli import main
from cvt_tpu.io.database import FeatureDatabase


def _make_db(path, rng, n_images=4, n_kp=48, dim=32):
    """Disk database whose images share a descriptor pool (all pairs
    match; translation-consistent keypoints verify as planar)."""
    base_desc = rng.normal(size=(n_kp, dim)).astype(np.float32)
    base_desc /= np.linalg.norm(base_desc, axis=1, keepdims=True)
    base_xy = rng.uniform(0, 640, size=(n_kp, 2)).astype(np.float32)
    with FeatureDatabase(path) as db:
        ids = []
        for i in range(n_images):
            iid = db.add_image(f"im{i}.jpg", 640, 480)
            ids.append(iid)
            d = base_desc + rng.normal(
                scale=0.01, size=base_desc.shape).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            kp = np.concatenate([base_xy + 5.0 * i,
                                 np.zeros((n_kp, 2), np.float32)], -1)
            db.write_keypoints(iid, kp)
            db.write_descriptors(iid, d)
        db.commit()
    return ids


def test_exhaustive_matcher_cli(tmp_path, rng, capsys):
    dbp = str(tmp_path / "feat.db")
    ids = _make_db(dbp, rng)
    main(["exhaustive_matcher", "--database", dbp, "--ratio", "0.95",
          "--min-matches", "10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_pairs = len(ids) * (len(ids) - 1) // 2
    assert out["n_pairs"] == n_pairs
    assert out["n_verified"] == n_pairs
    with FeatureDatabase(dbp) as db:
        inl, config, model = db.read_two_view_geometry(ids[0], ids[1])
        assert len(inl) >= 10 and model is not None
        assert config in (2, 3, 4, 5, 6)      # non-degenerate


def test_sequential_matcher_cli(tmp_path, rng, capsys):
    dbp = str(tmp_path / "feat.db")
    _make_db(dbp, rng, n_images=5)
    main(["sequential_matcher", "--database", dbp, "--overlap", "2",
          "--ratio", "0.95", "--min-matches", "10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pairs"] == 4 + 3            # overlap-2 chain over 5
    assert out["n_matched"] == out["n_pairs"]


def test_spatial_matcher_cli(tmp_path, rng, capsys):
    dbp = str(tmp_path / "feat.db")
    _make_db(dbp, rng, n_images=4)
    pos = np.array([[0, 0], [1, 0], [50, 50], [51, 50]], np.float32)
    pp = str(tmp_path / "pos.npy")
    np.save(pp, pos)
    main(["spatial_matcher", "--database", dbp, "--positions", pp,
          "--max-neighbors", "1", "--max-distance", "5",
          "--ratio", "0.95", "--min-matches", "10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pairs"] == 2                # (1,2) and (3,4) only


def test_vocab_tree_matcher_cli(tmp_path, rng, capsys):
    dbp = str(tmp_path / "feat.db")
    _make_db(dbp, rng, n_images=3, n_kp=64, dim=128)
    main(["vocab_tree_matcher", "--database", dbp, "--num-words", "64",
          "--num-images", "2", "--ratio", "0.95", "--min-matches", "10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pairs"] >= 1
    assert out["n_matched"] >= 1


def test_feature_extractor_cli_to_database(tmp_path, capsys):
    """extract -> DB -> exhaustive match: the full colmap.cc loop on
    synthetic blob images the DoG detector can actually fire on."""
    rng = np.random.default_rng(0)
    h = w = 96
    base = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(24):
        cy, cx = rng.uniform(12, h - 12), rng.uniform(12, w - 12)
        s = rng.uniform(1.5, 3.0)
        base += rng.uniform(0.4, 1.0) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    images = np.stack([base, np.roll(base, 2, axis=1)])
    ip = str(tmp_path / "imgs.npy")
    np.save(ip, images.astype(np.float32))
    dbp = str(tmp_path / "feat.db")
    main(["feature_extractor", "--images", ip, "--max-features", "128",
          "--database", dbp, "--out", str(tmp_path / "feats.npz")])
    capsys.readouterr()
    with FeatureDatabase(dbp) as db:
        ids = [i for i, _ in db.iter_images()]
        assert len(ids) == 2
        for iid in ids:
            d = db.read_descriptors(iid)
            assert d is not None and len(d) >= 5
    main(["exhaustive_matcher", "--database", dbp, "--ratio", "0.9",
          "--min-matches", "5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_pairs"] == 1
    assert out["n_matched"] == 1
