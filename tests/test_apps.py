"""Applications: pHash and end-to-end image retrieval."""

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.apps import (
    ImageRetrievalIndex, hamming_distance, is_pure_image, phash,
    resize_gray_32)
from cvt_tpu.features import extract_sift


def test_phash_stability_and_discrimination(rng):
    img = rng.random((1, 32, 32)).astype(np.float32)
    h1 = np.asarray(phash(jnp.asarray(img)))
    # small noise -> small hamming distance
    h2 = np.asarray(phash(jnp.asarray(
        img + 0.01 * rng.random((1, 32, 32)).astype(np.float32))))
    # different image -> large distance
    h3 = np.asarray(phash(jnp.asarray(
        rng.random((1, 32, 32)).astype(np.float32))))
    d12 = int(np.asarray(hamming_distance(jnp.asarray(h1),
                                          jnp.asarray(h2)))[0, 0])
    d13 = int(np.asarray(hamming_distance(jnp.asarray(h1),
                                          jnp.asarray(h3)))[0, 0])
    assert d12 <= 6
    assert d13 >= 15


def test_phash_brightness_invariance(rng):
    """DCT mean-thresholding ignores global brightness/contrast shifts."""
    img = rng.random((1, 32, 32)).astype(np.float32)
    h1 = np.asarray(phash(jnp.asarray(img)))
    h2 = np.asarray(phash(jnp.asarray(img * 2.0 + 0.3)))
    d = int(np.asarray(hamming_distance(jnp.asarray(h1),
                                        jnp.asarray(h2)))[0, 0])
    assert d <= 2


def test_phash_resize_path(rng):
    big = rng.random((2, 100, 140)).astype(np.float32)
    small = resize_gray_32(jnp.asarray(big))
    assert small.shape == (2, 32, 32)
    h = np.asarray(phash(small))
    assert h.shape == (2, 2) and h.dtype == np.uint32


def test_is_pure_image():
    pure = np.full((1, 40, 40), 128.0, np.float32)
    noisy = np.random.default_rng(0).uniform(0, 255, (1, 40, 40))
    flags = np.asarray(is_pure_image(jnp.asarray(
        np.concatenate([pure, noisy]).astype(np.float32))))
    assert flags[0] and not flags[1]


def _scene(rng, seed_blobs):
    img = np.zeros((96, 96), np.float32)
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    for (cy, cx, s) in seed_blobs:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += 0.02 * rng.random((96, 96)).astype(np.float32)
    return np.clip(img, 0, 1)


def test_image_retrieval_end_to_end(rng):
    """Distinct scenes; querying with a (noisy copy of a) database image
    must rank it first. Exercises extract -> index -> vote -> SVF rerank,
    the hnsw_sifts_retrieval app flow."""
    scenes = [
        [(30, 30, 4.0), (60, 70, 6.0), (70, 25, 3.0)],
        [(48, 48, 8.0), (20, 70, 3.5)],
        [(25, 50, 5.0), (70, 60, 4.0), (40, 20, 6.0)],
    ]
    imgs = np.stack([_scene(rng, s) for s in scenes])
    feats = extract_sift(imgs, max_features=64, first_octave=0,
                         rootsift=True)
    idx = ImageRetrievalIndex()
    for i in range(3):
        idx.add_image(feats, name=f"scene{i}", batch_index=i)

    # query = scene 1 with fresh noise
    q_img = _scene(np.random.default_rng(99), scenes[1])[None]
    q_feats = extract_sift(q_img, max_features=64, first_octave=0,
                           rootsift=True)
    names, scores = idx.search(q_feats, topk=3, rerank=None,
                               max_dist=0.3)
    assert names[0] == "scene1", (names, scores)

    names2, scores2 = idx.search(q_feats, topk=3, rerank="svf",
                                 max_dist=0.3)
    assert names2[0] == "scene1", (names2, scores2)
