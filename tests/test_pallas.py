"""Pallas kernels cross-checked against the pure-XLA engines
(the reference's interpreter-vs-fast pattern, SURVEY.md §4) — run in
interpreter mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvt_tpu.index import FlatADCIndex, FlatIndex
from cvt_tpu.ops.pallas.adc_scan import adc_scan_topk
from cvt_tpu.quant import ProductQuantizer


@pytest.fixture(scope="module")
def small_pq(sift_like):
    base, queries = sift_like
    pq = ProductQuantizer.train(jax.random.key(0), base[:2048], m=8, k=64,
                                iters=8)
    return pq, base, queries


def _prep(pq, base, n_valid=None, tile_n=512):
    codes = pq.encode(base)
    n = codes.shape[0] if n_valid is None else n_valid
    npad = -(-codes.shape[0] // tile_n) * tile_n
    pad = npad - codes.shape[0]
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, pq.m), jnp.uint8)], axis=0)
    cbn = pq.codeword_sqnorms()
    dsq = jnp.sum(jax.vmap(lambda t, c: t[c], in_axes=(0, 1))(
        cbn, codes.astype(jnp.int32)), axis=0)
    return codes, dsq, n


def test_adc_kernel_matches_xla_engine(small_pq):
    pq, base, queries = small_pq
    q = jnp.asarray(queries[:32], jnp.float32)
    q_sq = jnp.sum(jnp.square(q), axis=-1)
    codes, dsq, n = _prep(pq, base, tile_n=512)
    d_pl, i_pl = adc_scan_topk(q, q_sq, codes, dsq, pq.codebooks, 10,
                               n, tile_n=512, interpret=True)

    idx = FlatADCIndex(pq, chunk=1024, impl="xla")
    idx.add(codes=pq.encode(base))
    d_x, i_x = idx.search(queries[:32], 10)
    # same bf16 decode/score math -> distances match tightly
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_x),
                               rtol=1e-2, atol=1e-2)
    # kernel computes ||decode||^2 from the bf16 decode (self-consistent)
    # while the XLA engine uses f32 precomputed norms -> rare tie flips
    assert (np.asarray(i_pl)[:, 0] == np.asarray(i_x)[:, 0]).mean() > 0.9


def test_adc_kernel_n_not_multiple_of_tile(small_pq):
    """Padding rows must never appear in results."""
    pq, base, queries = small_pq
    n_valid = 3000   # not a multiple of 512
    sub = base[:n_valid]
    q = jnp.asarray(queries[:8], jnp.float32)
    q_sq = jnp.sum(jnp.square(q), axis=-1)
    codes, dsq, n = _prep(pq, sub, tile_n=512)
    d, i = adc_scan_topk(q, q_sq, codes, dsq, pq.codebooks, 10, n_valid,
                         tile_n=512, interpret=True)
    assert np.asarray(i).max() < n_valid
    assert np.all(np.isfinite(np.asarray(d)))


def test_adc_kernel_exact_topk_ordering(small_pq):
    """Kernel top-k must equal brute-force over the decoded database."""
    pq, base, queries = small_pq
    sub = base[:1024]
    q = jnp.asarray(queries[:16], jnp.float32)
    q_sq = jnp.sum(jnp.square(q), axis=-1)
    codes, dsq, n = _prep(pq, sub, tile_n=512)
    d, i = adc_scan_topk(q, q_sq, codes, dsq, pq.codebooks, 5, n,
                         tile_n=512, interpret=True)
    dec = np.asarray(pq.decode(pq.encode(sub)))
    exact = FlatIndex(128, "l2", chunk=1024)
    exact.add(dec)
    de, ie = exact.search(queries[:16], 5)
    np.testing.assert_allclose(np.sort(np.asarray(d), -1),
                               np.sort(np.asarray(de), -1),
                               rtol=2e-2, atol=2e-2)


def test_flat_adc_index_pallas_impl(small_pq):
    """FlatADCIndex(impl='pallas') drives the kernel through the index API
    (interpret mode auto-selected off-TPU)."""
    pq, base, queries = small_pq
    idx = FlatADCIndex(pq, impl="pallas")
    idx.add(base)
    d, i = idx.search(queries[:16], 10)
    idx_x = FlatADCIndex(pq, chunk=1024, impl="xla")
    idx_x.add(codes=pq.encode(base))
    d2, i2 = idx_x.search(queries[:16], 10)
    assert (np.asarray(i)[:, 0] == np.asarray(i2)[:, 0]).mean() > 0.95
