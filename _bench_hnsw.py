"""HNSW headline bench at the reference operating point.

Reproduces hnsw_sifts_retrieval/makeIdx.cpp:271-312: N=125,402 SIFT
descriptors, d=128, inner-product space, M=32, efConstruction=80, and
the test_vs_recall harness — recall@k vs us/query across an ef sweep
against exact ground truth (the brute_force_search role).

Host-side CPU bench (the graph core is native C++ + OpenMP); run with
an optional descriptor corpus:  python _bench_hnsw.py [corpus.fvecs]
(falls back to synthetic SIFT-statistics vectors).
"""
import json
import sys
import time

import numpy as np

from cvt_tpu.index.hnsw import HnswIndex
from cvt_tpu.io.vecs import read_fvecs

N = 125402          # makeIdx.cpp operating point
D = 128
N_QUERIES = 1000
K = 10
M = 32
EF_C = 80
EF_SWEEP = (10, 20, 40, 80, 160, 320, 640, 1000)


def load_corpus():
    if len(sys.argv) > 1:
        x = read_fvecs(sys.argv[1])
        src = sys.argv[1]
    else:
        from cvt_tpu.io.datasets import synthetic_sift
        x = synthetic_sift(N + N_QUERIES, D, seed=7)
        src = "synthetic_sift"
    x = np.asarray(x, np.float32)
    # rootSIFT-style L2 normalization (makeSIFTs.cpp:79-95) so the IP
    # space ranks like cosine, as in the reference app
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assert len(x) >= N + N_QUERIES, len(x)
    return x[:N], x[N:N + N_QUERIES], src


def main():
    base, queries, src = load_corpus()
    print(f"corpus: {src}  base {base.shape}  queries {queries.shape}")

    # exact IP ground truth (brute_force_search's role, space_ip.hpp)
    t0 = time.time()
    gt = np.empty((len(queries), K), np.int64)
    for lo in range(0, len(queries), 128):
        s = base @ queries[lo:lo + 128].T          # [N, b]
        part = np.argpartition(-s, K, axis=0)[:K]  # [K, b]
        ordered = part[np.argsort(-s[part, np.arange(s.shape[1])[None, :]],
                                  axis=0), np.arange(s.shape[1])[None, :]]
        gt[lo:lo + 128] = ordered.T
    print(f"ground truth: {time.time() - t0:.1f}s")

    idx = HnswIndex(D, metric="ip", capacity=N, m=M, ef_construction=EF_C)
    t0 = time.time()
    idx.add(base, num_threads=0)
    build_s = time.time() - t0
    print(f"build: {build_s:.1f}s ({N / build_s:.0f} vec/s)  "
          f"M={M} efC={EF_C}")

    rows = []
    for ef in EF_SWEEP:
        # warm + measured pass (single-thread query loop like
        # makeIdx.cpp test_approx; batch API with 1 thread)
        idx.search(queries[:32], k=K, ef=ef, num_threads=1)
        t0 = time.time()
        _, labels = idx.search(queries, k=K, ef=ef, num_threads=1)
        us = (time.time() - t0) / len(queries) * 1e6
        hit = np.mean([len(set(labels[i]) & set(gt[i])) / K
                       for i in range(len(queries))])
        rows.append((ef, hit, us))
        print(f"ef={ef:5d}  recall@{K}={hit:.4f}  {us:8.1f} us/query")

    report = {
        "operating_point": {"n": N, "d": D, "metric": "ip", "m": M,
                            "ef_construction": EF_C, "k": K},
        "corpus": src,
        "build_seconds": round(build_s, 1),
        "build_vecs_per_s": round(N / build_s),
        "sweep": [{"ef": ef, "recall": round(r, 4),
                   "us_per_query": round(us, 1)} for ef, r, us in rows],
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
