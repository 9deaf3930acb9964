"""Dogfooded real-SIFT-statistics corpus + recall-parity harness.

The reference benches on real SIFT descriptor dumps (SURVEY §6,
5.95M-vector OPQ model); SIFT1M is not stageable in a zero-egress
environment, so the framework dogfoods its own extractor: >=1M SIFT
descriptors from `extract_sift` over procedural images (the same
procedurally-created-bitmap strategy as the reference's own feature
tests, vlindex/src/feature/sift_test.cc:60-789), scaled by the classic
512x factor to uint8 range (makeSIFTs.cpp export convention) and
persisted as .bvecs. Then the config-1/config-2 recall-parity harness
runs on them: these are descriptors with genuine SIFT statistics
(gradient-histogram sparsity, heavy tails, scale-correlated energy),
not mixture-model draws.

Stage 1 (chip): python _bench_dogfood.py extract
Stage 2 (chip): python _bench_dogfood.py parity
Artifacts: _data/dogfood_base.bvecs (1M), _data/dogfood_query.bvecs.
"""
import json
import os
import sys
import time

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_data")
BASE_PATH = os.path.join(DATA_DIR, "dogfood_base.bvecs")
QUERY_PATH = os.path.join(DATA_DIR, "dogfood_query.bvecs")

N_BASE = 1_000_000
N_QUERY = 8192
K_PER_IMAGE = 4096          # keep batches comfortably inside HBM
BATCH = 8
H, W = 480, 640


def extract_corpus():
    import jax
    import jax.numpy as jnp
    from cvt_tpu.features.covdet import extract_sift
    from cvt_tpu.io.datasets import procedural_images
    from cvt_tpu.io.vecs import write_bvecs

    os.makedirs(DATA_DIR, exist_ok=True)
    f = jax.jit(lambda im: extract_sift(
        im, max_features=K_PER_IMAGE, first_octave=-1,
        n_orientations=2, rootsift=True))

    def gen(n_target, seed0, path):
        chunks, total, seed = [], 0, seed0
        t0 = time.time()
        while total < n_target:
            imgs = procedural_images(BATCH, H, W, seed=seed)
            out = f(imgs)
            desc = np.asarray(out.descriptors)
            valid = np.asarray(out.valid)
            d = desc[valid]                       # [sum_valid, 128]
            # VLFeat/Lowe 512x export convention -> uint8 SIFT range
            d = np.clip(np.rint(512.0 * d), 0, 255).astype(np.uint8)
            chunks.append(d)
            total += len(d)
            seed += 1
            if seed % 8 == 0:
                print(f"  {total}/{n_target} descriptors "
                      f"({total / (time.time() - t0):.0f}/s)", flush=True)
        x = np.concatenate(chunks)[:n_target]
        write_bvecs(path, x)
        return x, seed

    print("extracting base corpus ...", flush=True)
    t0 = time.time()
    _, next_seed = gen(N_BASE, 0, BASE_PATH)
    print(f"base: {N_BASE} descriptors in {time.time() - t0:.0f}s")
    print("extracting held-out query corpus (fresh images) ...", flush=True)
    gen(N_QUERY, next_seed + 1000, QUERY_PATH)
    print("done:", BASE_PATH, QUERY_PATH)


def parity():
    import jax
    import jax.numpy as jnp
    from cvt_tpu.index import FlatADCIndex, FlatIndex
    from cvt_tpu.index.flat_adc import _adc_scan
    from cvt_tpu.index.flat_sq import FlatSQIndex
    from cvt_tpu.io.vecs import read_bvecs
    from cvt_tpu.ops.linalg import l2_normalize
    from cvt_tpu.quant import OPQ
    from cvt_tpu.quant.sq import ScalarQuantizer
    from cvt_tpu.utils import recall_at_k

    base = read_bvecs(BASE_PATH).astype(np.float32)
    queries = read_bvecs(QUERY_PATH).astype(np.float32)
    n_rec = 2048
    queries = queries[:n_rec]
    m, ksub, k = 8, 256, 10
    print(f"dogfood corpus: base {base.shape} queries {queries.shape}")

    # exact ground truth
    exact = FlatIndex(128, "l2", chunk=131_072)
    exact.add(base)
    gt_parts = []
    for s in range(0, n_rec, 512):
        _, g = exact.search(queries[s:s + 512], 1)
        gt_parts.append(np.asarray(g))
    gt1 = np.concatenate(gt_parts)[:, 0]
    del exact

    # ---- config 2: OPQ 64-bit ADC --------------------------------------
    opq = OPQ.train(jax.random.key(0), base[:131_072], m=m, k=ksub,
                    opq_iters=4, kmeans_iters=6, final_kmeans_iters=12)
    idx = FlatADCIndex(opq)
    for s in range(0, len(base), FlatADCIndex.ENC_CHUNK):
        idx.add(base[s:s + FlatADCIndex.ENC_CHUNK])
    idx._materialize()
    _, ids_fast = idx.search(queries, k)
    r1 = recall_at_k(np.asarray(ids_fast), gt1, k=1)
    r10 = recall_at_k(np.asarray(ids_fast), gt1, k=10)
    _, ids_ex = idx.search(queries, k, exact=True)
    r1_ex = recall_at_k(np.asarray(ids_ex), gt1, k=1)
    # independent reference f32 LUT-ADC scan at the same code budget
    n_total = idx.ntotal
    ref_chunk = 16384
    npad_ref = -(-n_total // ref_chunk) * ref_chunk
    codes_ref = idx._codes
    dsq_ref = idx._dec_sq
    if npad_ref != n_total:
        codes_ref = jnp.concatenate(
            [codes_ref, jnp.zeros((npad_ref - n_total, m), jnp.uint8)])
        dsq_ref = jnp.concatenate(
            [dsq_ref, jnp.zeros((npad_ref - n_total,), jnp.float32)])
    parts = []
    for s in range(0, n_rec, 1024):
        qr = idx._rotate(queries[s:s + 1024])
        qsq = jnp.sum(jnp.square(qr), axis=-1)
        _, ir = _adc_scan(qr, qsq, codes_ref, dsq_ref, opq.pq.codebooks,
                          k, ref_chunk, n_total)
        parts.append(np.asarray(ir))
    ids_ref = np.concatenate(parts)
    r1_ref = recall_at_k(ids_ref, gt1, k=1)
    r10_ref = recall_at_k(ids_ref, gt1, k=10)

    # ---- config 1: int8 SQ at d=128 on normalized vectors --------------
    bn = np.asarray(l2_normalize(jnp.asarray(base)))
    qn = np.asarray(l2_normalize(jnp.asarray(queries)))
    ex2 = FlatIndex(128, "l2", chunk=131_072)
    ex2.add(bn)
    gt_parts = []
    for s in range(0, n_rec, 512):
        _, g = ex2.search(qn[s:s + 512], 1)
        gt_parts.append(np.asarray(g))
    gt_sq = np.concatenate(gt_parts)[:, 0]
    del ex2
    sq = ScalarQuantizer.train(bn[:131_072], l2norm=False)
    sqi = FlatSQIndex(sq, chunk=131_072)
    for s in range(0, len(bn), 262144):
        sqi.add(bn[s:s + 262144])
    _, ids_sq = sqi.search_fast(qn, k)
    r1_sq = recall_at_k(np.asarray(ids_sq), gt_sq, k=1)
    r10_sq = recall_at_k(np.asarray(ids_sq), gt_sq, k=10)

    out = {
        "corpus": "dogfood extract_sift (1M base, held-out queries)",
        "config2_opq64": {
            "recall_at_1_fast": round(r1, 4),
            "recall_at_10_fast": round(r10, 4),
            "recall_at_1_exact": round(r1_ex, 4),
            "recall_at_1_ref_f32_adc": round(r1_ref, 4),
            "recall_at_10_ref_f32_adc": round(r10_ref, 4),
            "parity_pt": round((r1_ref - r1) * 100, 2)},
        "config1_sq_d128": {
            "recall_at_1": round(r1_sq, 4),
            "recall_at_10": round(r10_sq, 4)},
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("extract", "all"):
        extract_corpus()
    if stage in ("parity", "all"):
        parity()
