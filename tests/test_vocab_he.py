"""Vocabulary + Hamming-embedding index: the reference's own test
pattern — seeded random descriptors, self-query ranks itself first
(vlindex visual_index_test.cc:44-106)."""

import jax
import numpy as np
import pytest

from cvt_tpu.index import VocabHEIndex


@pytest.fixture(scope="module")
def vocab_setup():
    # module-scoped: uses its own generator (the shared `rng` fixture is
    # function-scoped by design)
    rng = np.random.default_rng(0)
    # 20 "images" of 64 descriptors each, SIFT-like
    train = rng.gamma(1.5, 20.0, size=(4096, 128)).astype(np.float32)
    images = [np.clip(train[rng.integers(0, 4096, 64)]
                      + rng.normal(0, 2.0, (64, 128)), 0, 255)
              .astype(np.float32) for _ in range(20)]
    idx = VocabHEIndex(n_words=256)
    idx.train(jax.random.key(0), train, iters=10)
    for i, d in enumerate(images):
        idx.add_image(d, name=f"im{i}")
    idx.prepare()
    return idx, images


def test_self_query_ranks_first(vocab_setup):
    idx, images = vocab_setup
    hits = 0
    for i in (0, 5, 13):
        names, scores = idx.query(images[i], topk=5)
        if names[0] == f"im{i}":
            hits += 1
        assert scores[0] <= 1.5  # normalized-ish
    assert hits == 3


def test_noisy_query_retrieves_source(vocab_setup, rng):
    idx, images = vocab_setup
    q = (images[7] + rng.normal(0, 1.0, images[7].shape)).astype(np.float32)
    names, _ = idx.query(q, topk=3)
    assert "im7" in names[:2]


def test_save_load_same_scores(tmp_path, vocab_setup):
    idx, images = vocab_setup
    p = str(tmp_path / "vocab.npz")
    idx.save(p)
    idx2 = VocabHEIndex.load(p)
    n1, s1 = idx.query(images[3], topk=5)
    n2, s2 = idx2.query(images[3], topk=5)
    assert n1 == n2
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_signatures_are_64_bits(vocab_setup, rng):
    idx, _ = vocab_setup
    d = rng.gamma(1.5, 20.0, size=(16, 128)).astype(np.float32)
    _, sigs = idx._encode(d)
    sigs = np.asarray(sigs)
    assert sigs.shape == (16, 2) and sigs.dtype == np.uint32
    # bits should be roughly balanced around the per-word thresholds
    bits = np.unpackbits(np.ascontiguousarray(sigs).view(np.uint8), axis=-1)
    assert 0.2 < bits.mean() < 0.8


def _geom_img(rng, pool, scramble=False):
    k = pool.shape[0]
    d = pool + rng.normal(scale=0.02, size=pool.shape).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    g = np.zeros((k, 4), np.float32)
    g[:, 0] = np.linspace(10, 500, k)
    g[:, 1] = np.linspace(20, 400, k)
    g[:, 2] = 2.0
    g[:, 3] = 0.3
    if scramble:
        g[:, :2] = rng.uniform(0, 512, size=(k, 2)).astype(np.float32)
        g[:, 3] = rng.uniform(-3, 3, size=k).astype(np.float32)
    return d, g


def test_query_verification_demotes_geometric_impostor(rng):
    """visual_index.h:260-501 semantics: Hamming match -> 1-to-1 dedup ->
    vote-and-verify reorders the top-N; an image with identical
    descriptors but scrambled geometry must rank below the true match."""
    import jax
    d_dim, k = 32, 64
    pool = rng.normal(size=(k, d_dim)).astype(np.float32)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    other = rng.normal(size=(k, d_dim)).astype(np.float32)
    other /= np.linalg.norm(other, axis=1, keepdims=True)
    idx = VocabHEIndex(n_words=16, dim=d_dim)
    idx.train(jax.random.PRNGKey(0), np.concatenate([pool, other]))
    d0, g0 = _geom_img(rng, pool)
    d1, g1 = _geom_img(rng, pool, scramble=True)
    d2, g2 = _geom_img(rng, other)
    for nm, (d, g) in {"true": (d0, g0), "twin": (d1, g1),
                       "bg": (d2, g2)}.items():
        idx.add_image(d, name=nm, geometries=g)
    idx.prepare()
    qd, qg = _geom_img(rng, pool)
    qg[:, 0] += 15.0
    qg[:, 1] -= 9.0
    names_v, scores_v = idx.query(qd, topk=3, geometries=qg, verify=3,
                                  image_extent=512.0)
    assert names_v[0] == "true"
    assert (scores_v[names_v.index("true")]
            > scores_v[names_v.index("twin")] + 5.0)
    # dim < 64 exercised throughout (HE projection must still be 64-bit)
    assert np.asarray(idx.he_proj).shape == (d_dim, 64)


def test_overflow_tail_scored_exactly(rng):
    """Bucket overflow entries must still contribute to scores
    (the reference inverted file never drops entries)."""
    import jax
    d_dim = 32
    pool = rng.normal(size=(48, d_dim)).astype(np.float32)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    imgs = []
    for i in range(3):
        d = pool + rng.normal(scale=0.02, size=pool.shape
                              ).astype(np.float32)
        imgs.append(d / np.linalg.norm(d, axis=1, keepdims=True))
    big = VocabHEIndex(n_words=4, dim=d_dim)          # generous cap
    tiny = VocabHEIndex(n_words=4, dim=d_dim, bucket_cap=2)
    for idx in (big, tiny):
        idx.train(jax.random.PRNGKey(0), pool)
        for i, d in enumerate(imgs):
            idx.add_image(d, name=f"im{i}")
        idx.prepare()
    assert tiny.n_overflow > 0
    q = pool + rng.normal(scale=0.02, size=pool.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    n1, s1 = big.query(q, topk=3)
    n2, s2 = tiny.query(q, topk=3)
    # tail pass makes the tiny-capped index score identically
    assert n1 == n2
    np.testing.assert_allclose(s1, s2, rtol=1e-4)


def test_hierarchical_vocab_retrieval():
    """VocabHEIndex with a hierarchical two-level vocabulary: self-query
    ranks itself first, and save/load roundtrips the tree."""
    import tempfile, os
    rng = np.random.default_rng(3)
    train = rng.gamma(1.5, 20.0, size=(4096, 128)).astype(np.float32)
    images = [np.clip(train[rng.integers(0, 4096, 48)]
                      + rng.normal(0, 2.0, (48, 128)), 0, 255)
              .astype(np.float32) for _ in range(8)]
    idx = VocabHEIndex(n_words=256, hierarchical=True, probes=4)
    assert idx.hierarchical
    idx.train(jax.random.key(0), train, iters=8)
    assert idx.coarse.shape == (16, 128)
    assert idx.fine.shape == (16, 16, 128)
    for i, d in enumerate(images):
        idx.add_image(d, name=f"im{i}")
    idx.prepare()
    for i in (0, 3, 7):
        names, scores = idx.query(images[i], topk=3)
        assert names[0] == f"im{i}"
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "vocab.npz")
        idx.save(p)
        idx2 = VocabHEIndex.load(p)
        assert idx2.hierarchical
        n1, s1 = idx.query(images[2], topk=3)
        n2, s2 = idx2.query(images[2], topk=3)
        assert n1 == n2
        np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_hierarchical_auto_threshold():
    assert VocabHEIndex(n_words=16384).hierarchical
    assert not VocabHEIndex(n_words=4096).hierarchical


def test_vocab_exact_blocked_assignment(rng):
    """probes=0 (exact blocked assignment over the flat vocabulary — the
    1M-word operating-point path at reduced scale) retrieves correctly
    and its word assignments match the exact flat argmin."""
    from cvt_tpu.ops.kmeans import kmeans_assign
    train = rng.gamma(1.5, 20.0, size=(4096, 128)).astype(np.float32)
    images = [np.clip(train[rng.integers(0, 4096, 48)]
                      + rng.normal(0, 2.0, (48, 128)), 0, 255)
              .astype(np.float32) for _ in range(6)]
    idx = VocabHEIndex(n_words=256, hierarchical=True, probes=0)
    idx.train(jax.random.key(0), train, iters=8)
    for i, d in enumerate(images):
        idx.add_image(d, name=f"im{i}")
    idx.prepare()
    for i in (0, 5):
        names, _ = idx.query(images[i], topk=3)
        assert names[0] == f"im{i}"
    w, _ = idx._encode(images[0])
    w_flat, _ = kmeans_assign(jax.numpy.asarray(images[0]), idx.words)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_flat))


def test_query_batch_matches_single(rng):
    """query_batch == per-image query (ids, scores, verify path)."""
    import jax
    from cvt_tpu.io.datasets import synthetic_sift

    base = synthetic_sift(2000, 64, seed=3)[:, :64]
    idx = VocabHEIndex(n_words=128, dim=64, hierarchical=False)
    idx.train(jax.random.key(0), base[:1000])
    geoms = rng.uniform(0, 512, (10, 80, 4)).astype(np.float32)
    for i in range(10):
        idx.add_image(base[i * 80:(i + 1) * 80], name=f"im{i}",
                      geometries=geoms[i])
    idx.prepare()
    qs = np.stack([
        np.clip(base[i * 80:(i + 1) * 80]
                + rng.normal(0, 6, (80, 64)), 0, 255)
        for i in (1, 4, 7)]).astype(np.float32)
    ids, sc, names = idx.query_batch(qs, topk=4)
    for qi, src in enumerate((1, 4, 7)):
        n1, s1 = idx.query(qs[qi], topk=4)
        assert [names[j] for j in ids[qi]] == n1
        np.testing.assert_allclose(sc[qi], s1, atol=1e-5)
        assert n1[0] == f"im{src}"
    # verified batch path agrees with the verified single-query path
    # (random geometries: verification scores are noise, so assert
    # batch==single rather than self-retrieval)
    qg = rng.uniform(0, 512, (3, 80, 4)).astype(np.float32)
    ids2, sc2, names2 = idx.query_batch(qs, topk=4, verify=3,
                                        geometries=qg)
    for qi in range(3):
        n1, s1 = idx.query(qs[qi], topk=4, verify=3,
                           geometries=qg[qi])
        assert [names2[j] for j in ids2[qi]] == n1
        np.testing.assert_allclose(sc2[qi], s1, atol=1e-4)
