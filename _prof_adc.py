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
print("launch overhead ms", overhead * 1e3)

# phase 1 only
stack = jnp.asarray(rng.normal(size=(ITERS, B, D)).astype(np.float32) * 20)
def p1(qb):
    q2s = _fold_queries(qb, srow_j)
    s2 = (srow_j * srow_j)[:, None]
    return _adc_segmin(q2s, codes_t, cbt_q, s2, N, 1024, 128, group, False)
t = chained_time(p1, stack, launch_overhead_s=overhead)
print(f"phase1 seg=128: {t*1e3:.2f} ms/batch  {B/t:.0f} qps")

# full fast search
def full(qb):
    return adc_search(qb, None, None, None, jnp.asarray(cb), 10, N,
                      codes_t=codes_t, cbt_q=cbt_q, srow=srow_j,
                      group=group, interpret=False)
t2 = chained_time(full, stack, launch_overhead_s=overhead)
print(f"full fast k=10: {t2*1e3:.2f} ms/batch  {B/t2:.0f} qps")

# selection only (segmin fixed)
q2s = _fold_queries(q, srow_j)
s2 = (srow_j * srow_j)[:, None]
segmin, segarg = _adc_segmin(q2s, codes_t, cbt_q, s2, N, 1024, 128, group, False)
segstack_d = jnp.broadcast_to(segmin[None], (ITERS,) + segmin.shape) + \
    jnp.arange(ITERS, dtype=jnp.float32)[:, None, None]
def sel(sm):
    smT = sm.T
    neg, j = jax.lax.top_k(-smT, 10)
    ids = jnp.take_along_axis(segarg.T, j, axis=-1)
    return -neg, ids
t3 = chained_time(sel, segstack_d, launch_overhead_s=overhead)
print(f"selection (transpose+topk): {t3*1e3:.2f} ms/batch")

# phase1 with seg=256 / tile 2048
for tile, seg in ((1024, 256), (2048, 256), (2048, 512)):
    try:
        def p1b(qb, tile=tile, seg=seg):
            q2s = _fold_queries(qb, srow_j)
            return _adc_segmin(q2s, codes_t, cbt_q, s2, N, tile, seg, group, False)
        tb = chained_time(p1b, stack, launch_overhead_s=overhead)
        print(f"phase1 tile={tile} seg={seg}: {tb*1e3:.2f} ms/batch")
    except Exception as e:
        print(f"tile={tile} seg={seg} failed: {str(e)[:200]}")
