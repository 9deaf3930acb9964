"""Tests: feature database + extraction pipeline (SURVEY.md §2 #14,
#11 pipeline, #15 JobQueue pattern)."""

import numpy as np

from cvt_tpu.io.database import (
    FeatureDatabase, images_from_pair_id, pair_id_from_images)


def test_pair_id_roundtrip():
    pid = pair_id_from_images(42, 7)
    assert pid == pair_id_from_images(7, 42)      # order-independent
    assert images_from_pair_id(pid) == (7, 42)


def test_image_registry():
    with FeatureDatabase() as db:
        a = db.add_image("a.jpg", 640, 480)
        b = db.add_image("b.jpg")
        assert db.add_image("a.jpg") == a          # idempotent
        assert db.num_images() == 2
        assert db.image_id("b.jpg") == b
        assert db.image_name(a) == "a.jpg"
        assert db.image_id("missing.jpg") is None
        assert [n for _, n in db.iter_images()] == ["a.jpg", "b.jpg"]


def test_keypoints_descriptors_roundtrip(rng):
    with FeatureDatabase() as db:
        i = db.add_image("x.jpg")
        kp = rng.random((37, 4)).astype(np.float32)
        desc = (rng.random((37, 128)) * 255).astype(np.uint8)
        db.write_keypoints(i, kp)
        db.write_descriptors(i, desc)
        np.testing.assert_array_equal(db.read_keypoints(i), kp)
        got = db.read_descriptors(i)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, desc)
        assert db.has_features(i)
        assert not db.has_features(999)
        assert db.read_keypoints(999) is None


def test_matches_canonical_order(rng):
    with FeatureDatabase() as db:
        m = rng.integers(0, 100, (20, 2)).astype(np.int32)
        db.write_matches(5, 2, m)      # stored under (2, 5) canonical
        np.testing.assert_array_equal(db.read_matches(5, 2), m)
        np.testing.assert_array_equal(db.read_matches(2, 5), m[:, ::-1])
        assert db.has_matches(2, 5) and db.has_matches(5, 2)
        assert not db.has_matches(1, 2)


def test_two_view_geometry_roundtrip(rng):
    with FeatureDatabase() as db:
        m = rng.integers(0, 50, (9, 2)).astype(np.int32)
        h = np.eye(3)
        db.write_two_view_geometry(1, 2, m, config=3, model=h.ravel())
        got_m, cfg, model = db.read_two_view_geometry(1, 2)
        np.testing.assert_array_equal(got_m, m)
        assert cfg == 3
        np.testing.assert_allclose(model.reshape(3, 3), h)


def test_global_features(rng):
    with FeatureDatabase() as db:
        ids = [db.add_image(f"{i}.jpg") for i in range(4)]
        vecs = rng.random((4, 16)).astype(np.float32)
        for i, v in zip(ids, vecs):
            db.write_global_feature(i, v)
        got_ids, mat = db.read_all_global_features()
        np.testing.assert_array_equal(got_ids, ids)
        np.testing.assert_allclose(mat, vecs)


def test_persistence(tmp_path, rng):
    p = str(tmp_path / "features.db")
    with FeatureDatabase(p) as db:
        i = db.add_image("persist.jpg")
        db.write_descriptors(i, rng.random((5, 8)).astype(np.float32))
    with FeatureDatabase(p) as db2:
        j = db2.image_id("persist.jpg")
        assert j == i and db2.read_descriptors(j).shape == (5, 8)


def test_extraction_pipeline(rng):
    """End-to-end: ndarray sources -> batched extract -> sqlite rows.
    Uses a stub extractor so the test stays fast on CPU."""
    from cvt_tpu.features.pipeline import FeatureExtractionPipeline
    from cvt_tpu.features.covdet import SiftFeatures
    import jax.numpy as jnp

    def stub_extract(imgs):
        b = imgs.shape[0]
        k = 16
        return SiftFeatures(
            frames=jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.float32)[None, :, None],
                (b, k, 4)),
            descriptors=jnp.ones((b, k, 128), jnp.float32),
            response=jnp.ones((b, k)),
            valid=jnp.arange(k)[None, :].repeat(b, 0) < 10)

    with FeatureDatabase() as db:
        pipe = FeatureExtractionPipeline(
            db, image_size=(32, 32), batch_size=3,
            extract_fn=stub_extract, n_reader_threads=2)
        imgs = [(f"img{i}.png", rng.random((32, 32)).astype(np.float32))
                for i in range(7)]
        stats = pipe.run(imgs)
        assert stats.n_images == 7 and stats.n_failed == 0
        for name, _ in imgs:
            i = db.image_id(name)
            assert db.has_features(i)
            assert db.read_descriptors(i).shape == (10, 128)
            assert db.read_keypoints(i).shape == (10, 4)
        # second run skips everything (incremental resume)
        stats2 = pipe.run(imgs)
        assert stats2.n_skipped == 7 and stats2.n_images == 0
