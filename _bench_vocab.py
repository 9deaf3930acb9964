"""1M-word vocabulary-tree operating point, end-to-end on the real chip.

VERDICT r3 item 1: the reference's retriever runs a 1,048,576-word
Flickr100K tree (exe/vocab_tree.cc:74-78, visual_index.h:624-665). This
script proves the SAME operating point in cvt_tpu: train the 1024x1024
hierarchical vocabulary on 1M+ synthetic SIFT descriptors, build a
corpus with Hamming-embedding + geometry, and run verified queries —
all at W=1,048,576 — with timings, plus the retrieval-quality impact of
multi-probe vs exact assignment (VERDICT r3 item 9). Writes
BENCH_VOCAB.md.

Run on the real chip:  python _bench_vocab.py
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.index.vocab_he import VocabHEIndex
from cvt_tpu.ops.kmeans import hierarchical_assign, kmeans_assign_blocked

SMALL = bool(int(os.environ.get("VOCAB_BENCH_SMALL", "0")))
W = 4_096 if SMALL else 1_048_576             # 1024 x 1024
N_TRAIN = 32_768 if SMALL else 1_048_576
N_IMAGES = 16 if SMALL else 256
K_FEAT = 64 if SMALL else 512                 # features per corpus image
N_QUERIES = 4 if SMALL else 48

rng = np.random.default_rng(0)
# SIFT-like heavy-tailed mixture (same family as io.datasets.synthetic_sift
# but drawn inline so corpus images are coherent feature SETS: each image
# samples one "scene" = a subset of clusters, so word histograms look like
# real image BoW vectors rather than iid noise)
n_clusters = 2_048 if SMALL else 65_536
centers = rng.gamma(1.2, 24.0, size=(n_clusters, 128)).astype(np.float32)


def draw(m):
    ci = rng.integers(0, n_clusters, size=m)
    x = centers[ci] + rng.normal(0, 12.0, size=(m, 128))
    return np.clip(x, 0, 255).astype(np.float32)


def make_image(seed):
    r = np.random.default_rng(seed)
    scene = r.choice(n_clusters, size=24, replace=False)
    ci = r.choice(scene, size=K_FEAT)
    desc = np.clip(centers[ci] + r.normal(0, 12.0, (K_FEAT, 128)),
                   0, 255).astype(np.float32)
    geom = np.stack([r.uniform(0, 1024, K_FEAT), r.uniform(0, 1024, K_FEAT),
                     r.uniform(2, 8, K_FEAT), r.uniform(-3, 3, K_FEAT)],
                    1).astype(np.float32)
    return desc, geom


print(f"platform: {jax.default_backend()}  devices: {jax.devices()}")
train = draw(N_TRAIN)

# ---------------------------------------------------------------- train
idx = VocabHEIndex(n_words=W, probes=0,   # probes=0: exact blocked assign
                   hierarchical=True)
assert idx.hierarchical
t0 = time.time()
idx.train(jax.random.key(0), train, iters=10)
t_train = time.time() - t0
print(f"train {W:,} words on {N_TRAIN:,} desc: {t_train:.1f}s")

# ------------------------------------------------- assignment throughput
t0 = time.time()
asg_exact, _ = kmeans_assign_blocked(train, idx.words)
asg_exact = np.asarray(asg_exact)
t_exact = time.time() - t0
print(f"exact blocked assign 1M x 1M: {t_exact:.1f}s "
      f"({N_TRAIN / t_exact:,.0f} desc/s)")

ctrl = train[:min(100_000, N_TRAIN)]
t0 = time.time()
a8, _ = hierarchical_assign(ctrl, idx.coarse, idx.fine, probes=8)
a8 = np.asarray(a8)
t_probe8 = time.time() - t0
agree8 = float((a8 == asg_exact[:len(ctrl)]).mean())
a16, _ = hierarchical_assign(ctrl, idx.coarse, idx.fine, probes=16)
agree16 = float((np.asarray(a16) == asg_exact[:len(ctrl)]).mean())
print(f"probes=8 on 100k: {t_probe8:.1f}s  agree={agree8:.4f}  "
      f"agree16={agree16:.4f}")

# ------------------------------------------------------------ add corpus
images = [make_image(1000 + i) for i in range(N_IMAGES)]
t0 = time.time()
for i, (d, g) in enumerate(images):
    idx.add_image(d, name=f"im{i}", geometries=g)
t_add = time.time() - t0
t0 = time.time()
idx.prepare()
t_prep = time.time() - t0
cap = idx._b_img.shape[1]
print(f"add {N_IMAGES} images ({N_IMAGES * K_FEAT:,} desc): {t_add:.1f}s; "
      f"prepare: {t_prep:.1f}s; bucket cap {cap}; overflow {idx.n_overflow}")

# ------------------------------------------------------- verified queries
def run_queries(probes, verify=0):
    """Noisy re-renders of corpus images; recall@1 of the source image."""
    idx.probes = probes
    hits = 0
    t_q = 0.0
    for i in range(N_QUERIES):
        src = i * (N_IMAGES // N_QUERIES)
        d, g = images[src]
        r = np.random.default_rng(9000 + i)
        keep = r.random(K_FEAT) < 0.7          # 30% feature dropout
        # fixed [K_FEAT] shape + valid mask: one compile for all queries
        qd = np.clip(d + r.normal(0, 18.0, d.shape), 0, 255)
        t0 = time.time()
        names, _ = idx.query(qd.astype(np.float32), topk=5, valid=keep,
                             geometries=g if verify else None,
                             verify=verify)
        t_q += time.time() - t0
        hits += names[0] == f"im{src}"
    return hits / N_QUERIES, t_q / N_QUERIES


r_exact, lat_exact = run_queries(0)
r_p4, lat_p4 = run_queries(4)
r_p8, lat_p8 = run_queries(8)
r_p16, lat_p16 = run_queries(16)
r_ver, lat_ver = run_queries(0, verify=10)
print(f"recall@1: exact={r_exact:.3f} p4={r_p4:.3f} p8={r_p8:.3f} "
      f"p16={r_p16:.3f} verified={r_ver:.3f}")

report = f"""# BENCH_VOCAB — the 1,048,576-word vocabulary-tree operating point

Run end-to-end on one real TPU chip (round 4). Reference: FLANN
hierarchical-kmeans 1M-word Flickr100K tree (visual_index.h:624-665,
exe/vocab_tree.cc:74-78), 64-bit Hamming embedding, query-time spatial
verification (visual_index.h:376-501).

## Scale

| item | value |
|---|---|
| vocabulary | 1024 x 1024 = {W:,} words |
| training descriptors | {N_TRAIN:,} x 128 (synthetic SIFT mixture) |
| corpus | {N_IMAGES} images x {K_FEAT} features = {N_IMAGES * K_FEAT:,} entries |
| bucket layout | [W={W:,}, L={cap}] padded dense + {idx.n_overflow:,}-entry exact tail |

## Timings (real chip)

| stage | time |
|---|---|
| train (coarse 10 it @ K1=1024 + fine 5 it @ K2=1024/cell) | {t_train:.1f} s |
| EXACT assignment of 1M desc to 1M words (blocked running-min) | {t_exact:.1f} s ({N_TRAIN / t_exact:,.0f} desc/s) |
| multi-probe (8) assignment, 100k slice | {t_probe8:.1f} s |
| add + HE-encode {N_IMAGES} images | {t_add:.1f} s |
| prepare (buckets + idf + burstiness + self-sim) | {t_prep:.1f} s |
| query latency (exact assign, tf-idf only) | {lat_exact * 1e3:.0f} ms |
| query latency (+ spatial verification of top-10) | {lat_ver * 1e3:.0f} ms |

The exact-assignment point is something the reference cannot do at all:
FLANN's tree descent is approximate by construction; the blocked
running-min argmin (ops/kmeans.py:kmeans_assign_blocked) does the full
2*N*W*D = 256 TFLOP scan on the MXU in {t_exact:.0f} s with no gather
traffic.

## Assignment quality -> retrieval quality (VERDICT r3 item 9)

Corpus built with EXACT assignment; queries assigned at varying probes.
Agreement measured on a 100k control slice vs the exact argmin.

| assignment | agreement | recall@1 ({N_QUERIES} noisy queries, 30% dropout) | latency |
|---|---|---|---|
| exact (probes=0) | 100% | {r_exact:.3f} | {lat_exact * 1e3:.0f} ms |
| probes=16 | {agree16 * 100:.2f}% | {r_p16:.3f} | {lat_p16 * 1e3:.0f} ms |
| probes=8 | {agree8 * 100:.2f}% | {r_p8:.3f} | {lat_p8 * 1e3:.0f} ms |
| probes=4 | — | {r_p4:.3f} | {lat_p4 * 1e3:.0f} ms |
| exact + verify top-10 | 100% | {r_ver:.3f} | {lat_ver * 1e3:.0f} ms |

Reduced-scale tests exercising the same code paths:
tests/test_vocab_he.py::test_vocab_exact_blocked_assignment,
tests/test_ops.py::test_kmeans_assign_blocked_exact.
"""
if not SMALL:
    open("BENCH_VOCAB.md", "w").write(report)
print(report)
