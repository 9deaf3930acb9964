"""IVF-ADC: coarse inverted lists + residual PQ codes, probed ADC search.

Reference: opq/src/IVFOPQ.cpp — coarse k-means assignment (:113-129),
residual PQ encode (:141-163), nearest-nprobe selection (:237-260),
per-probe LUT build (:279-291) and inverted-list LUT-sum scan (:300-309).
Operating point there: d=128, coarseK=8192, m=16, k=256 (IVFOPQ.cpp:56-63).

TPU-native redesign: inverted lists are PADDED DENSE BUCKETS
[Kc, L, M] u8 so a probe is a static-shape gather, not pointer chasing.

    dist(q, n) = ||q - c_a(n) - d(code_n)||^2
               = sum_m LUT_r[b, p, m, code_n[m]]       (residual LUT)

with LUT_r built for r = q - centroid_p as one batched einsum over all
(query, probe) pairs at once. Lists longer than the bucket capacity spill
into a flat TAIL scanned for every query with the exact algebraic
expansion  ||q||^2 + ||c_a + d||^2 - 2<q, c_a> - 2<q, d(code)>  — the
coarse inner products <q, c> are reused from probe selection, and
<q, d(code)> is the same decode-first MXU scan as FlatADCIndex. Results
from buckets and tail merge in one top-k.

Design note: BASELINE.json replaces IVF probing with the flat scan for
the north-star benchmark (graph/list probing wastes the MXU at high
recall); this index exists for capability parity with the reference and
for the large-N / low-latency regime where scanning 1/64 of the database
wins.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.ops.kmeans import kmeans
from cvt_tpu.ops.topk import merge_topk
from cvt_tpu.quant.pq import ProductQuantizer


@partial(jax.jit, static_argnames=("nprobe", "k"))
def _ivf_query(q, centroids, cw_sqnorm, codebooks, buckets, bucket_ids,
               bucket_dsq, tail_codes, tail_coarse, tail_dsq, tail_ids,
               nprobe, k):
    """Batched IVF-ADC query.

    q [B, D]; centroids [Kc, D]; cw_sqnorm [M, K]; codebooks [M, K, ds];
    buckets [Kc, L, M] u8; bucket_ids [Kc, L] i32 (-1 = pad);
    bucket_dsq [Kc, L] f32 (= ||c_a + d(code)||^2 per entry);
    tail_* : overflow entries ([T, M] u8, [T] i32 coarse id, [T] f32, [T] i32).
    """
    b, d = q.shape
    kc = centroids.shape[0]
    m, kk, ds = codebooks.shape
    L = buckets.shape[1]

    # ---- probe selection: full coarse IP scan (one MXU matmul) ----------
    coarse_ip = jnp.matmul(q, centroids.T,
                           preferred_element_type=jnp.float32)    # [B, Kc]
    q_sq = jnp.sum(jnp.square(q), axis=-1)                        # [B]
    c_sq = jnp.sum(jnp.square(centroids), axis=-1)                # [Kc]
    coarse_dist = q_sq[:, None] - 2.0 * coarse_ip + c_sq[None, :]
    _, probes = jax.lax.top_k(-coarse_dist, nprobe)               # [B, P]

    # ---- residual LUTs for every (query, probe) pair --------------------
    probe_cent = centroids[probes]                                # [B, P, D]
    r = q[:, None, :] - probe_cent                                # [B, P, D]
    r_sub = r.reshape(b, nprobe, m, ds)
    ip_lut = jnp.einsum("bpms,mks->bpmk", r_sub,
                        codebooks, preferred_element_type=jnp.float32)
    r_sq_sub = jnp.sum(jnp.square(r_sub), axis=-1)                # [B, P, M]
    lut = (r_sq_sub[..., None] - 2.0 * ip_lut
           + cw_sqnorm[None, None, :, :])                         # [B,P,M,K]

    # ---- gather probed buckets and LUT-score them -----------------------
    pcodes = buckets[probes].astype(jnp.int32)                    # [B,P,L,M]
    pids = bucket_ids[probes]                                     # [B, P, L]
    # scores[b,p,l] = sum_m lut[b,p,m,pcodes[b,p,l,m]]
    g = jnp.take_along_axis(
        lut, pcodes.transpose(0, 1, 3, 2), axis=3)                # [B,P,M,L]
    scores = jnp.sum(g, axis=2)                                   # [B, P, L]
    scores = jnp.where(pids >= 0, scores, jnp.inf)
    flat_scores = scores.reshape(b, nprobe * L)
    flat_ids = pids.reshape(b, nprobe * L)
    kb = min(k, nprobe * L)
    best_d, j = jax.lax.top_k(-flat_scores, kb)
    best_d = -best_d
    best_i = jnp.take_along_axis(flat_ids, j, axis=-1)

    # ---- tail: flat decode-first scan with coarse-IP correction ---------
    t = tail_codes.shape[0]
    if t > 0:
        iota = jax.lax.broadcasted_iota(jnp.int32, (m, t, kk), 2)
        onehot = (tail_codes.astype(jnp.int32).T[:, :, None]
                  == iota).astype(jnp.bfloat16)                   # [M, T, K]
        dec = jax.lax.dot_general(
            onehot, codebooks.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)                  # [M, T, ds]
        dec = dec.transpose(1, 0, 2).reshape(t, d)
        ip_d = jnp.matmul(dec, q.astype(jnp.bfloat16).T,
                          preferred_element_type=jnp.float32).T   # [B, T]
        cip = jnp.take_along_axis(
            coarse_ip, jnp.broadcast_to(tail_coarse[None, :], (b, t)),
            axis=1)                                               # [B, T]
        tdist = q_sq[:, None] + tail_dsq[None, :] - 2.0 * cip - 2.0 * ip_d
        tdist = jnp.where(tail_ids[None, :] >= 0, tdist, jnp.inf)
        kt = min(k, t)
        td, tj = jax.lax.top_k(-tdist, kt)
        ti = jnp.take_along_axis(
            jnp.broadcast_to(tail_ids[None, :], (b, t)), tj, axis=-1)
        cat_d = jnp.concatenate([best_d, -td], axis=-1)
        cat_i = jnp.concatenate([best_i, ti], axis=-1)
        best_d, best_i = merge_topk(cat_d, cat_i, min(k, kb + kt))
    return best_d, best_i


class IVFADCIndex:
    """Inverted-file index with residual PQ codes and batched ADC probes."""

    def __init__(self, coarse_k: int = 1024, m: int = 8, k: int = 256,
                 bucket_cap: int | None = None):
        self.coarse_k = coarse_k
        self.m = m
        self.k = k
        self.bucket_cap = bucket_cap
        self.centroids: jax.Array | None = None      # [Kc, D]
        self.pq: ProductQuantizer | None = None
        self._built = False

    # ---------------------------------------------------------------- train
    def train(self, key, x, *, coarse_iters: int = 20, pq_iters: int = 25,
              sample: int | None = 262144) -> None:
        """Coarse k-means + residual PQ, mirroring TrainPQ::{CoarseQuan,
        ProdQuan} (train_PQ_codebook.cpp:150-244)."""
        x = jnp.asarray(x, jnp.float32)
        if sample is not None and x.shape[0] > sample:
            idx = jax.random.permutation(key, x.shape[0])[:sample]
            x = x[idx]
        res = kmeans(key, x, self.coarse_k, iters=coarse_iters)
        self.centroids = res.centroids
        residuals = x - self.centroids[res.assignments]
        self.pq = ProductQuantizer.train(key, residuals, self.m, self.k,
                                         iters=pq_iters)

    # ---------------------------------------------------------------- build
    def build(self, x) -> None:
        """Assign, encode residuals, and lay out padded buckets (host-side
        layout; math on device)."""
        if self.centroids is None:
            raise RuntimeError("train() first")
        from cvt_tpu.ops.kmeans import kmeans_assign
        x = jnp.asarray(x, jnp.float32)
        n = x.shape[0]
        assign, _ = kmeans_assign(x, self.centroids, chunk=262144)
        residuals = x - self.centroids[assign]
        codes = self.pq.encode(residuals)                        # [N, M] u8

        # ||c_a + d(code)||^2 per point = ||reconstruction||^2
        rec = self.pq.decode(codes) + self.centroids[assign]
        dsq = jnp.sum(jnp.square(rec), axis=-1)                  # [N]

        assign_np = np.asarray(assign)
        codes_np = np.asarray(codes)
        dsq_np = np.asarray(dsq)
        counts = np.bincount(assign_np, minlength=self.coarse_k)
        cap = self.bucket_cap
        if cap is None:
            cap = int(min(counts.max(),
                          max(8, 4 * max(1, n // self.coarse_k))))
            cap = -(-cap // 8) * 8
        order = np.argsort(assign_np, kind="stable")
        sorted_assign = assign_np[order]
        # Rank of each point within its list.
        starts = np.zeros(self.coarse_k + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        rank = np.arange(n, dtype=np.int64) - starts[sorted_assign]

        in_bucket = rank < cap
        buckets = np.zeros((self.coarse_k, cap, self.m), np.uint8)
        bucket_ids = np.full((self.coarse_k, cap), -1, np.int32)
        bucket_dsq = np.zeros((self.coarse_k, cap), np.float32)
        bi = sorted_assign[in_bucket]
        br = rank[in_bucket].astype(np.int64)
        src = order[in_bucket]
        buckets[bi, br] = codes_np[src]
        bucket_ids[bi, br] = src.astype(np.int32)
        bucket_dsq[bi, br] = dsq_np[src]

        tail_src = order[~in_bucket]
        self._buckets = jnp.asarray(buckets)
        self._bucket_ids = jnp.asarray(bucket_ids)
        self._bucket_dsq = jnp.asarray(bucket_dsq)
        # Pad tail to a multiple of 128 for clean tiling.
        tlen = len(tail_src)
        tpad = (-(-max(tlen, 1) // 128) * 128) if tlen else 0
        tail_codes = np.zeros((tpad, self.m), np.uint8)
        tail_coarse = np.zeros((tpad,), np.int32)
        tail_dsq = np.zeros((tpad,), np.float32)
        tail_ids = np.full((tpad,), -1, np.int32)
        if tlen:
            tail_codes[:tlen] = codes_np[tail_src]
            tail_coarse[:tlen] = assign_np[tail_src]
            tail_dsq[:tlen] = dsq_np[tail_src]
            tail_ids[:tlen] = tail_src.astype(np.int32)
        self._tail_codes = jnp.asarray(tail_codes)
        self._tail_coarse = jnp.asarray(tail_coarse)
        self._tail_dsq = jnp.asarray(tail_dsq)
        self._tail_ids = jnp.asarray(tail_ids)
        self._ntotal = n
        self._built = True

    @property
    def ntotal(self) -> int:
        return getattr(self, "_ntotal", 0)

    # --------------------------------------------------------------- search
    def search(self, q, k: int, *, nprobe: int = 16):
        if not self._built:
            raise RuntimeError("build() first")
        q = jnp.asarray(q, jnp.float32)
        return _ivf_query(
            q, self.centroids, self.pq.codeword_sqnorms(),
            self.pq.codebooks, self._buckets, self._bucket_ids,
            self._bucket_dsq, self._tail_codes, self._tail_coarse,
            self._tail_dsq, self._tail_ids,
            min(nprobe, self.coarse_k), k)

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        np.savez(path,
                 centroids=np.asarray(self.centroids),
                 codebooks=np.asarray(self.pq.codebooks),
                 buckets=np.asarray(self._buckets),
                 bucket_ids=np.asarray(self._bucket_ids),
                 bucket_dsq=np.asarray(self._bucket_dsq),
                 tail_codes=np.asarray(self._tail_codes),
                 tail_coarse=np.asarray(self._tail_coarse),
                 tail_dsq=np.asarray(self._tail_dsq),
                 tail_ids=np.asarray(self._tail_ids),
                 ntotal=self._ntotal)

    @classmethod
    def load(cls, path: str) -> "IVFADCIndex":
        z = np.load(path, allow_pickle=False)
        cb = jnp.asarray(z["codebooks"])
        idx = cls(coarse_k=z["centroids"].shape[0], m=cb.shape[0],
                  k=cb.shape[1])
        idx.centroids = jnp.asarray(z["centroids"])
        idx.pq = ProductQuantizer(cb)
        idx._buckets = jnp.asarray(z["buckets"])
        idx._bucket_ids = jnp.asarray(z["bucket_ids"])
        idx._bucket_dsq = jnp.asarray(z["bucket_dsq"])
        idx._tail_codes = jnp.asarray(z["tail_codes"])
        idx._tail_coarse = jnp.asarray(z["tail_coarse"])
        idx._tail_dsq = jnp.asarray(z["tail_dsq"])
        idx._tail_ids = jnp.asarray(z["tail_ids"])
        idx._ntotal = int(z["ntotal"])
        idx._built = True
        return idx
