"""North-star benchmark: SIFT1M-scale flat ADC search QPS/chip at recall
parity (BASELINE.json configs 2/4).

Pipeline: train OPQ (M=8, K=256 -> 64-bit codes) on a sample, encode a
1M-vector database, then measure steady-state QPS of the fused Pallas
decode-first scan (FlatADCIndex, k=10) at batch 1024, and recall@1/@10
against the exact float scan on a query subset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline reference: the task targets ">=5x H100-class QPS/chip" on
this workload (BASELINE.md). The reference repo publishes no numbers, so
we anchor on a public H100-class estimate for batched flat ADC scan of
1M x 64-bit codes at recall parity: ~100k QPS (faiss-GPU-style LUT scan,
order-of-magnitude). vs_baseline = measured_qps / 100_000, i.e. the
5x target corresponds to vs_baseline >= 5.
"""

import json
import os
import sys
import time

import numpy as np

H100_CLASS_BASELINE_QPS = 100_000.0

N_DB = int(os.environ.get("BENCH_N", 1_000_000))
N_TRAIN = 131_072
N_QUERIES = 1024
K = 10
BATCH = 1024
M, KSUB = 8, 256


def main():
    import jax
    import jax.numpy as jnp
    from cvt_tpu.index import FlatADCIndex, FlatIndex
    from cvt_tpu.io.datasets import load_sift1m, synthetic_sift
    from cvt_tpu.quant import OPQ
    from cvt_tpu.utils import recall_at_k

    t_start = time.time()
    data = load_sift1m()
    if data is not None:
        base, queries, gt = data
        base = base[:N_DB]
        queries = queries[:N_QUERIES]
        gt1 = gt[:N_QUERIES, :1]
        source = "sift1m"
    else:
        base, queries = synthetic_sift(N_DB, 128, n_queries=N_QUERIES,
                                       seed=0)
        gt1 = None
        source = "synthetic"

    # ---- train OPQ on a sample -----------------------------------------
    key = jax.random.key(0)
    sample = base[:N_TRAIN]
    opq = OPQ.train(key, sample, m=M, k=KSUB, opq_iters=4, kmeans_iters=6,
                    final_kmeans_iters=12)

    # ---- encode + build index (codes encoded/sec) ----------------------
    idx = FlatADCIndex(opq)
    t0 = time.time()
    enc_chunk = 262_144
    for s in range(0, base.shape[0], enc_chunk):
        idx.add(base[s:s + enc_chunk])
    jax.block_until_ready(idx._codes)
    t_encode = time.time() - t0
    codes_per_sec = base.shape[0] / t_encode

    # ---- ground truth (exact float scan) for recall --------------------
    if gt1 is None:
        exact = FlatIndex(128, "l2", chunk=131_072)
        exact.add(base)
        _, gt_ids = exact.search(queries[:256], 1)
        gt1 = np.asarray(gt_ids)
        del exact

    # ---- recall of the production (pallas) path ------------------------
    d, ids = idx.search(queries[:256], K)
    ids = np.asarray(ids)
    r1 = recall_at_k(ids, gt1[:256, 0], k=1)
    r10 = recall_at_k(ids, gt1[:256, 0], k=10)

    # ---- steady-state QPS ----------------------------------------------
    qbatch = queries[:BATCH]
    if qbatch.shape[0] < BATCH:
        reps = -(-BATCH // qbatch.shape[0])
        qbatch = np.tile(qbatch, (reps, 1))[:BATCH]
    # queries live on-device for the steady-state loop (serving keeps the
    # query stream on device; the axon host tunnel adds ~10ms/batch that
    # a real deployment does not pay)
    qbatch = jax.device_put(jnp.asarray(qbatch, jnp.float32))
    d, i = idx.search(qbatch, K)           # warm up / compile
    jax.block_until_ready((d, i))
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        d, i = idx.search(qbatch, K)
    jax.block_until_ready((d, i))
    dt = (time.time() - t0) / iters
    qps = BATCH / dt

    print(json.dumps({
        "metric": "sift1m_adc_qps_per_chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / H100_CLASS_BASELINE_QPS, 3),
        "recall_at_1": round(r1, 4),
        "recall_at_10": round(r10, 4),
        "codes_per_sec": round(codes_per_sec, 1),
        "n_db": int(base.shape[0]),
        "batch": BATCH,
        "code_bits": M * 8,
        "data": source,
        "ms_per_batch": round(dt * 1e3, 2),
        "total_bench_s": round(time.time() - t_start, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
