"""PQ / OPQ: train-encode-decode invariants and ADC scoring equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from cvt_tpu.quant import OPQ, ProductQuantizer


def test_pq_shapes_and_roundtrip(sift_like):
    base, _ = sift_like
    pq = ProductQuantizer.train(jax.random.key(0), base[:2048], m=8, k=64,
                                iters=8)
    assert pq.codebooks.shape == (8, 64, 16)
    codes = pq.encode(base[:256])
    assert codes.shape == (256, 8) and codes.dtype == jnp.uint8
    rec = pq.decode(codes)
    assert rec.shape == (256, 128)
    # reconstruction must beat the trivial zero predictor by a wide margin
    mse = float(pq.reconstruction_mse(base[:256]))
    var = float(np.sum(np.var(base[:256], axis=0)))
    assert mse < 0.5 * var


def test_pq_encode_is_nearest_codeword(rng):
    pq = ProductQuantizer.train(jax.random.key(1),
                                rng.normal(size=(512, 32)).astype(np.float32),
                                m=4, k=16, iters=5)
    x = rng.normal(size=(64, 32)).astype(np.float32)
    codes = np.asarray(pq.encode(x))
    cb = np.asarray(pq.codebooks)            # [4, 16, 8]
    xs = x.reshape(64, 4, 8)
    d = ((xs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1)  # [64, 4, 16]
    np.testing.assert_array_equal(codes, d.argmin(-1).astype(np.uint8))


def test_pq_lut_and_adc_scores_match_decoded_distance(rng):
    pq = ProductQuantizer.train(jax.random.key(2),
                                rng.normal(size=(512, 32)).astype(np.float32),
                                m=4, k=16, iters=5)
    q = rng.normal(size=(8, 32)).astype(np.float32)
    codes = pq.encode(rng.normal(size=(32, 32)).astype(np.float32))
    lut = pq.lut(q, "l2")
    scores = np.asarray(pq.adc_scores(lut, codes))
    dec = np.asarray(pq.decode(codes))
    naive = ((q[:, None, :] - dec[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(scores, naive, rtol=1e-3, atol=1e-3)


def test_opq_rotation_orthogonal_and_improves(sift_like):
    base, _ = sift_like
    x = base[:2048]
    key = jax.random.key(0)
    pq = ProductQuantizer.train(key, x, m=8, k=64, iters=10)
    opq = OPQ.train(key, x, m=8, k=64, opq_iters=4, kmeans_iters=5,
                    final_kmeans_iters=10)
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(128), atol=1e-4)
    mse_pq = float(pq.reconstruction_mse(x))
    mse_opq = float(opq.reconstruction_mse(x))
    # OPQ should not be materially worse than PQ (usually better on
    # correlated data).
    assert mse_opq < 1.1 * mse_pq


def test_opq_lut_scores_match_raw_space_distance(rng):
    x = rng.normal(size=(1024, 32)).astype(np.float32)
    # introduce cross-subspace correlation so the rotation matters
    mix = rng.normal(size=(32, 32)).astype(np.float32)
    x = x @ mix
    opq = OPQ.train(jax.random.key(3), x, m=4, k=16, opq_iters=3,
                    kmeans_iters=5, final_kmeans_iters=5)
    q = rng.normal(size=(4, 32)).astype(np.float32) @ mix
    codes = opq.encode(x[:16])
    lut = opq.lut(q, "l2")
    scores = np.asarray(opq.pq.adc_scores(lut, codes))
    dec_raw = np.asarray(opq.decode(codes))      # back in raw space
    naive = ((q[:, None, :] - dec_raw[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(scores, naive, rtol=1e-2, atol=1e-2)


def test_pq_save_load(tmp_path, rng):
    pq = ProductQuantizer.train(jax.random.key(4),
                                rng.normal(size=(256, 16)).astype(np.float32),
                                m=2, k=8, iters=3)
    p = str(tmp_path / "pq.npz")
    pq.save(p)
    pq2 = ProductQuantizer.load(p)
    np.testing.assert_array_equal(np.asarray(pq.codebooks),
                                  np.asarray(pq2.codebooks))
