"""Binary IO round-trips for fvecs/bvecs/ivecs and cvt's record format."""

import numpy as np

from cvt_tpu.io import (
    read_cvt_records, read_fvecs, read_ivecs,
    write_bvecs, write_cvt_records, write_fvecs, write_ivecs,
)
from cvt_tpu.io.datasets import synthetic_sift


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.normal(size=(17, 24)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, x)
    np.testing.assert_array_equal(read_fvecs(p), x)


def test_ivecs_roundtrip(tmp_path, rng):
    x = rng.integers(0, 1000, size=(5, 100)).astype(np.int32)
    p = str(tmp_path / "gt.ivecs")
    write_ivecs(p, x)
    np.testing.assert_array_equal(read_ivecs(p), x)


def test_cvt_records_roundtrip(tmp_path, rng):
    feats = rng.normal(size=(7, 128)).astype(np.float32)
    ids = [f"img_{i:04d}.jpg" for i in range(7)]
    p = str(tmp_path / "db.bin")
    write_cvt_records(p, ids, feats)
    rids, rfeats = read_cvt_records(p)
    assert rids == ids
    np.testing.assert_array_equal(rfeats, feats)


def test_synthetic_sift_stats():
    base, q = synthetic_sift(1000, 128, n_queries=10, seed=3)
    assert base.shape == (1000, 128) and q.shape == (10, 128)
    assert base.min() >= 0.0 and base.max() <= 255.0
    # deterministic
    base2 = synthetic_sift(1000, 128, seed=3)
    np.testing.assert_array_equal(base, base2)


def test_bvecs_roundtrip(tmp_path, rng):
    from cvt_tpu.io.vecs import read_bvecs
    x = rng.integers(0, 256, size=(37, 64)).astype(np.uint8)
    p = str(tmp_path / "x.bvecs")
    write_bvecs(p, x)
    y = read_bvecs(p)
    assert y.dtype == np.uint8
    np.testing.assert_array_equal(x, y)
