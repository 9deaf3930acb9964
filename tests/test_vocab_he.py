"""Vocabulary + Hamming-embedding index: the reference's own test
pattern — seeded random descriptors, self-query ranks itself first
(vlindex visual_index_test.cc:44-106)."""

import jax
import numpy as np
import pytest

from cvt_tpu.index import VocabHEIndex


@pytest.fixture(scope="module")
def vocab_setup(rng):
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
