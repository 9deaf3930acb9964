"""Core ops: normalize, pairwise distances, top-k, k-means."""

import jax
import jax.numpy as jnp
import numpy as np

from cvt_tpu.ops import (
    kmeans, kmeans_assign, l2_normalize, merge_topk,
    pairwise_ip, pairwise_l2sq, top_k_smallest,
)
from cvt_tpu.ops.topk import chunked_topk_scan


def test_l2_normalize_matches_reference_semantics(rng):
    x = rng.normal(size=(32, 64)).astype(np.float32)
    y = np.asarray(l2_normalize(x))
    expect = x / np.sqrt((x * x).sum(-1, keepdims=True) + 1e-12)
    np.testing.assert_allclose(y, expect, rtol=1e-5)
    # zero vector stays finite
    z = np.asarray(l2_normalize(np.zeros((1, 8), np.float32)))
    assert np.all(np.isfinite(z))


def test_pairwise_l2_matches_naive(rng):
    q = rng.normal(size=(8, 16)).astype(np.float32)
    db = rng.normal(size=(32, 16)).astype(np.float32)
    d = np.asarray(pairwise_l2sq(q, db))
    naive = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, naive, rtol=1e-4, atol=1e-4)


def test_pairwise_ip_matches_naive(rng):
    q = rng.normal(size=(8, 16)).astype(np.float32)
    db = rng.normal(size=(32, 16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(pairwise_ip(q, db)), q @ db.T,
                               rtol=1e-4, atol=1e-5)


def test_topk_and_merge(rng):
    d = rng.normal(size=(4, 100)).astype(np.float32)
    v, i = top_k_smallest(jnp.asarray(d), 5)
    expect_i = np.argsort(d, axis=-1)[:, :5]
    np.testing.assert_allclose(np.sort(v, -1),
                               np.sort(np.take_along_axis(d, expect_i, -1), -1),
                               rtol=1e-6)
    # merge two halves == global top-k
    va, ia = top_k_smallest(jnp.asarray(d[:, :50]), 5)
    vb, ib = top_k_smallest(jnp.asarray(d[:, 50:]), 5)
    mv, mi = merge_topk(jnp.concatenate([va, vb], -1),
                        jnp.concatenate([ia, ib + 50], -1), 5)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(v), rtol=1e-6)


def test_chunked_scan_equals_dense(rng):
    q = rng.normal(size=(16, 32)).astype(np.float32)
    db = rng.normal(size=(1000, 32)).astype(np.float32)  # non-multiple of chunk
    d, i = chunked_topk_scan(jnp.asarray(q), jnp.asarray(db), 10,
                             "l2", chunk=256)
    dense = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    expect_i = np.argsort(dense, axis=-1)[:, :10]
    expect_d = np.take_along_axis(dense, expect_i, -1)
    np.testing.assert_allclose(np.asarray(d), expect_d, rtol=1e-3, atol=1e-3)
    # ids may differ on exact ties; distances must match
    got_d = np.take_along_axis(dense, np.asarray(i), -1)
    np.testing.assert_allclose(got_d, expect_d, rtol=1e-3, atol=1e-3)


def test_kmeans_converges_and_repairs(rng):
    # 4 well-separated blobs
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    x = (centers[rng.integers(0, 4, 512)]
         + rng.normal(scale=0.3, size=(512, 2))).astype(np.float32)
    res = kmeans(jax.random.key(0), x, 4, iters=20)
    # every blob center recovered within tolerance
    d = ((np.asarray(res.centroids)[:, None, :]
          - centers[None, :, :]) ** 2).sum(-1)
    assert np.sqrt(d.min(axis=0)).max() < 0.5
    assert float(res.objective) < 0.5


def test_kmeans_assign_chunked_consistent(rng):
    x = rng.normal(size=(700, 8)).astype(np.float32)
    c = rng.normal(size=(16, 8)).astype(np.float32)
    a1, d1 = kmeans_assign(jnp.asarray(x), jnp.asarray(c))
    a2, d2 = kmeans_assign(jnp.asarray(x), jnp.asarray(c), chunk=128)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_kmeans_more_clusters_than_natural_groups(rng):
    # k close to n exercises the empty-cluster repair path
    x = rng.normal(size=(64, 4)).astype(np.float32)
    res = kmeans(jax.random.key(1), x, 32, iters=10)
    counts = np.bincount(np.asarray(res.assignments), minlength=32)
    assert counts.sum() == 64
    assert np.all(np.isfinite(np.asarray(res.centroids)))


def test_hierarchical_kmeans_agreement(rng):
    """Multi-probe hierarchical assignment agrees >=95% with the exact
    flat argmin over the flattened k1*k2 vocabulary (VERDICT round-1
    item 7 acceptance; reference: FLANN tree, visual_index.h:624-665)."""
    from cvt_tpu.ops.kmeans import (hierarchical_assign,
                                    hierarchical_kmeans, kmeans_assign)
    import jax as _jax
    x = rng.gamma(1.5, 20.0, size=(8192, 32)).astype(np.float32)
    res = hierarchical_kmeans(_jax.random.key(0), x, k1=8, k2=8,
                              coarse_iters=8, fine_iters=8,
                              sample_per_cell=2048)
    assert res.fine.shape == (8, 8, 32)
    w_h, d_h = hierarchical_assign(x[:2048], res.coarse, res.fine,
                                   probes=4)
    w_flat, d_flat = kmeans_assign(jnp.asarray(x[:2048]),
                                   res.flat_words())
    agree = (np.asarray(w_h) == np.asarray(w_flat)).mean()
    assert agree >= 0.95, f"agreement {agree}"
    # probed distance never beats the exact flat minimum (up to f32
    # rounding of two different contraction orders at ~1e4 magnitudes)
    dh, df = np.asarray(d_h), np.asarray(d_flat)
    assert (dh >= df - 1e-4 * np.abs(df) - 1e-2).all()


def test_hierarchical_kmeans_quality(rng):
    """Hierarchical 64-word quantizer is within 25% of flat 64-means
    quantization error on clustered data."""
    from cvt_tpu.ops.kmeans import (hierarchical_assign,
                                    hierarchical_kmeans, kmeans)
    import jax as _jax
    centers = rng.normal(size=(64, 16)).astype(np.float32) * 10
    x = (centers[rng.integers(0, 64, 4096)]
         + rng.normal(size=(4096, 16)).astype(np.float32))
    flat = kmeans(_jax.random.key(1), x, 64, iters=15)
    hier = hierarchical_kmeans(_jax.random.key(1), x, k1=8, k2=8,
                               coarse_iters=10, fine_iters=10)
    _, d_h = hierarchical_assign(x, hier.coarse, hier.fine, probes=4)
    err_h = float(np.mean(np.asarray(d_h)))
    err_f = float(flat.objective)
    assert err_h <= err_f * 1.25, (err_h, err_f)


def test_kmeans_assign_blocked_exact(rng):
    """Blocked running-min assignment (the 1M-word vocabulary path,
    exe/vocab_tree.cc:74-78) returns EXACTLY the flat argmin — ids and
    distances — across chunk and word-block boundaries."""
    from cvt_tpu.ops.kmeans import kmeans_assign, kmeans_assign_blocked
    x = rng.normal(size=(1000, 32)).astype(np.float32) * 5
    c = rng.normal(size=(96, 32)).astype(np.float32) * 5
    w_b, d_b = kmeans_assign_blocked(x, c, chunk=256, word_block=32)
    w_f, d_f = kmeans_assign(jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(w_b), np.asarray(w_f))
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_f),
                               rtol=1e-5, atol=1e-3)
    # non-power-of-two K falls back to a dividing word block
    w_b2, _ = kmeans_assign_blocked(x, c[:72], chunk=512, word_block=48)
    w_f2, _ = kmeans_assign(jnp.asarray(x), jnp.asarray(c[:72]))
    np.testing.assert_array_equal(np.asarray(w_b2), np.asarray(w_f2))
