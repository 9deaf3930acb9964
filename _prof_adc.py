import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from cvt_tpu.ops.pallas.adc_scan import (_adc_segmin, _fold_queries,
                                         _group_codebooks, adc_search)
from cvt_tpu.utils.profile import chained_time, measure_launch_overhead

rng = np.random.default_rng(0)
N, M, K, D, B = 1_000_000, 8, 256, 128, 4096
ITERS = 16
npad = -(-N // 16384) * 16384
codes = rng.integers(0, K, size=(npad, M), dtype=np.uint8)
cb = rng.normal(size=(M, K, D // M)).astype(np.float32) * 20
cbt_q, srow, group = _group_codebooks(jnp.asarray(cb))
ct = np.ascontiguousarray(codes.astype(np.int32).T)
codes_t = jax.device_put(jnp.asarray(ct))
q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32) * 20)
srow_j = jnp.asarray(srow)
overhead = measure_launch_overhead()
print("launch overhead ms", overhead * 1e3, flush=True)

# phase 1 only
stack = jnp.asarray(rng.normal(size=(ITERS, B, D)).astype(np.float32) * 20)
def p1(qb):
    q2s, qs = _fold_queries(qb, srow_j)
    s2 = (srow_j * srow_j)[:, None]
    return _adc_segmin(q2s, qs, codes_t, cbt_q, s2, N, 1024, 128, group, False)
t = chained_time(p1, stack, launch_overhead_s=overhead)
print(f"phase1 int8 seg=128: {t*1e3:.2f} ms/batch  {B/t:.0f} qps", flush=True)

# full fast search
def full(qb):
    return adc_search(qb, None, None, None, jnp.asarray(cb), 10, N,
                      codes_t=codes_t, cbt_q=cbt_q, srow=srow_j,
                      group=group, interpret=False)
t2 = chained_time(full, stack, launch_overhead_s=overhead)
print(f"full fast k=10: {t2*1e3:.2f} ms/batch  {B/t2:.0f} qps", flush=True)

for B2 in (8192, 16384):
    stack2 = jnp.asarray(rng.normal(size=(8, B2, D)).astype(np.float32) * 20)
    def full2(qb):
        return adc_search(qb, None, None, None, jnp.asarray(cb), 10, N,
                          codes_t=codes_t, cbt_q=cbt_q, srow=srow_j,
                          group=group, interpret=False)
    t3 = chained_time(full2, stack2, launch_overhead_s=overhead)
    print(f"full fast B={B2}: {t3*1e3:.2f} ms/batch  {B2/t3:.0f} qps", flush=True)

for tile in (2048, 4096):
    def p1t(qb, tile=tile):
        q2s, qs = _fold_queries(qb, srow_j)
        s2 = (srow_j * srow_j)[:, None]
        return _adc_segmin(q2s, qs, codes_t, cbt_q, s2, N, tile, 128, group, False)
    try:
        tb = chained_time(p1t, stack, launch_overhead_s=overhead)
        print(f"phase1 tile={tile}: {tb*1e3:.2f} ms/batch", flush=True)
    except Exception as e:
        print(f"tile={tile} failed: {str(e)[:150]}", flush=True)
