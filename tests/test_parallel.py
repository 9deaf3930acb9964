"""Sharded search and distributed k-means on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvt_tpu.index import FlatADCIndex
from cvt_tpu.parallel import ShardedADCSearcher, cpu_mesh, sharded_kmeans_step
from cvt_tpu.quant import OPQ, ProductQuantizer

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 4, reason="needs >=4 virtual CPU devices")


@pytest.fixture(scope="module")
def trained(sift_like):
    base, queries = sift_like
    pq = ProductQuantizer.train(jax.random.key(0), base[:2048], m=8, k=64,
                                iters=8)
    return pq, base, queries


def test_sharded_search_matches_single_device(trained):
    pq, base, queries = trained
    mesh = cpu_mesh({"db": 4})
    s = ShardedADCSearcher(pq, mesh, chunk=512)
    s.load(base)
    with jax.default_device(jax.devices("cpu")[0]):
        d_s, i_s = s.search(queries[:16], 10)
        ref = FlatADCIndex(pq, chunk=1024, impl="xla")
        ref.add(codes=pq.encode(base))
        d_r, i_r = ref.search(queries[:16], 10)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r),
                               rtol=1e-2, atol=1e-2)
    assert (np.asarray(i_s)[:, 0] == np.asarray(i_r)[:, 0]).mean() > 0.95


def test_sharded_search_pallas_impl(trained):
    """The production Pallas kernel inside the shard_map body (interpret
    mode on the CPU mesh) matches the XLA shard body at top-1."""
    pq, base, queries = trained
    mesh = cpu_mesh({"db": 4})
    s = ShardedADCSearcher(pq, mesh, chunk=512, impl="pallas", tile_n=256,
                           seg=64)
    s.load(base)
    d, i = s.search(queries[:16], 10)
    s_x = ShardedADCSearcher(pq, mesh, chunk=512, impl="xla")
    s_x.load(base)
    d_x, i_x = s_x.search(queries[:16], 10)
    assert (np.asarray(i)[:, 0] == np.asarray(i_x)[:, 0]).mean() >= 0.85
    assert np.asarray(i).max() < base.shape[0]


def test_sharded_search_n_not_divisible(trained):
    """Database size not divisible by the shard count: padding rows must
    never surface."""
    pq, base, queries = trained
    mesh = cpu_mesh({"db": 4})
    n = 3000
    s = ShardedADCSearcher(pq, mesh, chunk=512)
    s.load(base[:n])
    d, i = s.search(queries[:8], 10)
    ids = np.asarray(i)
    assert ids.max() < n
    assert (ids >= 0).all()


def test_sharded_search_with_opq(trained):
    _, base, queries = trained
    opq = OPQ.train(jax.random.key(1), base[:2048], m=8, k=64, opq_iters=2,
                    kmeans_iters=4, final_kmeans_iters=6)
    mesh = cpu_mesh({"db": 2})
    s = ShardedADCSearcher(opq, mesh, chunk=512)
    s.load(base)
    d, i = s.search(queries[:8], 5)
    ref = FlatADCIndex(opq, chunk=1024, impl="xla")
    ref.add(base)
    d_r, i_r = ref.search(queries[:8], 5)
    assert (np.asarray(i)[:, 0] == np.asarray(i_r)[:, 0]).mean() > 0.8


def test_sharded_kmeans_matches_single_device(rng):
    x = rng.normal(size=(1024, 16)).astype(np.float32)
    c0 = x[:8].copy()
    mesh = cpu_mesh({"dp": 4})
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    cs = jax.device_put(c0, NamedSharding(mesh, P()))
    new_c, obj = sharded_kmeans_step(mesh, xs, cs)

    # single-device reference Lloyd step
    d = ((x[:, None, :] - c0[None, :, :]) ** 2).sum(-1)
    a = d.argmin(-1)
    expect = np.stack([x[a == j].mean(0) if (a == j).any() else c0[j]
                       for j in range(8)])
    np.testing.assert_allclose(np.asarray(new_c), expect, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(obj), d.min(-1).mean(), rtol=1e-4)
