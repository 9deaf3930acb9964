"""Reference-scale vocabulary demonstration (VERDICT r2 item 5).

Trains the hierarchical 65,536-word vocabulary (256 x 256) on 1M
synthetic SIFT descriptors on the real TPU, times train + assignment,
and measures multi-probe assignment agreement vs exact flat argmin on a
control slice (reference operating point: visual_index.h:624-665,
1M-word tree in exe/vocab_tree.cc:74 — 65,536 is the round-1 "done"
bar). Writes BENCH_VOCAB.md.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from cvt_tpu.io.datasets import synthetic_sift
from cvt_tpu.ops.kmeans import (hierarchical_kmeans, hierarchical_assign,
                                kmeans_assign)

N, K1, K2 = 1_000_000, 256, 256
base = synthetic_sift(N, 128, seed=0)
x = jnp.asarray(base, jnp.float32)

t0 = time.time()
res = hierarchical_kmeans(jax.random.key(0), x, K1, K2,
                          coarse_iters=12, fine_iters=8)
float(jnp.sum(res.fine[-1, -1]))
t_train = time.time() - t0

t0 = time.time()
asg, _ = hierarchical_assign(x, res.coarse, res.fine, probes=4)
int(np.asarray(asg[-1]))
t_assign = time.time() - t0

# agreement vs flat argmin over all 65,536 words on a control slice
ctrl = x[:20000]
t0 = time.time()
flat_words = res.flat_words()                       # [65536, 128]
fa, _ = kmeans_assign(ctrl, flat_words, chunk=4096)
t_flat = time.time() - t0
ha, _ = hierarchical_assign(ctrl, res.coarse, res.fine, probes=4)
agree4 = float((np.asarray(fa) == np.asarray(ha)).mean())
ha8, _ = hierarchical_assign(ctrl, res.coarse, res.fine, probes=8)
agree8 = float((np.asarray(fa) == np.asarray(ha8)).mean())

report = f"""# BENCH_VOCAB — hierarchical vocabulary at the 65,536-word operating point

Run on one real TPU chip (round 3). Reference: FLANN hierarchical
k-means vocabulary (visual_index.h:624-665; 1M-word Flickr100K tree in
exe/vocab_tree.cc:74; round-1 bar = 65,536 words on 1M descriptors).

| item | value |
|---|---|
| descriptors | {N:,} x 128 (synthetic SIFT) |
| vocabulary | {K1} x {K2} = {K1*K2:,} words |
| train time (coarse 12 it + fine 8 it) | {t_train:.1f} s |
| assign 1M descriptors (multi-probe 4) | {t_assign:.1f} s ({N/t_assign:,.0f} desc/s) |
| assignment agreement vs exact flat argmin (probes=4) | {agree4*100:.2f}% |
| assignment agreement vs exact flat argmin (probes=8) | {agree8*100:.2f}% |
| exact flat argmin on 20k control slice | {t_flat:.1f} s |

The per-word Hamming-embedding median thresholds are computed by the
vectorized grouped-median (one lexsort per 64 projection columns,
vocab_he.py) — O(D log N), independent of word count.
"""
open("BENCH_VOCAB.md", "w").write(report)
print(report)
