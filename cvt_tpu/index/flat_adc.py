"""Flat ADC index: asymmetric-distance scan over PQ/OPQ codes.

This is the north-star engine (BASELINE.json configs 2/4): the HNSW graph
walk (hnsw_sifts_retrieval) and the IVF probe heap (opq/src/IVFOPQ.cpp
:237-309) are deliberately replaced by a flat, batched, HBM-resident code
scan — pointer-chasing does not map to a TPU; streaming matmuls do.

Scoring (L2): for code row c with PQ decode d(c) = concat_m CB[m, c_m],

    ||q - d(c)||^2 = ||q||^2 - 2 <q, d(c)> + ||d(c)||^2

  * ||d(c)||^2 = sum_m cbnorm[m, c_m] is precomputed per point at add()
    time (one f32 per code row);
  * <q, d(c)> = sum_m <q_m, CB[m, c_m]>: rather than the reference's
    per-point LUT-gather loop (IVFOPQ.cpp:300-309), the scan DECODES each
    code tile to bf16 on the MXU (one-hot matmul) and hits it with a
    single [T, D] x [D, B] score matmul. Decode-first costs 2*K*D flops
    per row, amortized over the whole query batch — 10-100x cheaper than
    LUT-sum-per-query (2*M*K*B) whenever D << M*K, and 100% MXU.

The pure-XLA engine here is the reference implementation; the fused
Pallas kernel (cvt_tpu.ops.pallas.adc_scan) is the production path and is
cross-checked against this module in tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.ops.topk import merge_topk
from cvt_tpu.quant.opq import OPQ
from cvt_tpu.quant.pq import ProductQuantizer


def _decode_chunk_bf16(codes, codebooks):
    """codes [T, M] int32, codebooks [M, K, ds] -> [T, D] bf16 via one-hot
    batched matmul (MXU). K-dim one-hot is built as int8 compare masks."""
    m, k, ds = codebooks.shape
    t = codes.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, t, k), 2)
    onehot = (codes.T[:, :, None] == iota).astype(jnp.bfloat16)  # [M, T, K]
    dec = jax.lax.dot_general(
        onehot, codebooks.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16)                     # [M, T, ds]
    return dec.transpose(1, 0, 2).reshape(t, m * ds)


@partial(jax.jit, static_argnames=("k", "chunk", "n_valid"))
def _adc_scan(q, q_sq, codes, dec_sq, codebooks, k, chunk, n_valid):
    """q [B, D] (already rotated), codes [Npad, M] u8, dec_sq [Npad] f32."""
    b, d = q.shape
    npad = codes.shape[0]
    n_chunks = npad // chunk
    codes_c = codes.reshape(n_chunks, chunk, codes.shape[1])
    dec_sq_c = dec_sq.reshape(n_chunks, chunk)
    qT = q.astype(jnp.bfloat16).T                                # [D, B]

    def scan_chunk(carry, xs):
        c_idx, chunk_codes, chunk_dsq = xs
        dec = _decode_chunk_bf16(chunk_codes.astype(jnp.int32),
                                 codebooks)                      # [T, D] bf16
        ip = jax.lax.dot_general(
            dec, qT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [T, B]
        dist = (q_sq[None, :] - 2.0 * ip + chunk_dsq[:, None]).T  # [B, T]
        base = c_idx * chunk
        local_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        dist = jnp.where(local_ids < n_valid, dist, jnp.inf)
        neg, j = jax.lax.top_k(-dist, min(k, chunk))
        ids = jnp.take_along_axis(
            jnp.broadcast_to(local_ids, dist.shape), j, axis=-1)
        best_d, best_i = carry
        cat_d = jnp.concatenate([best_d, -neg], axis=-1)
        cat_i = jnp.concatenate([best_i, ids], axis=-1)
        return merge_topk(cat_d, cat_i, k), None

    # derive the init from both operands so it inherits every
    # device-varying axis when this engine runs inside a shard_map body
    # (jax vma typing): q_sq may vary over a query axis, dec_sq over a
    # database axis
    zero = q_sq[:, None] * 0.0 + dec_sq[0] * 0.0
    init = (jnp.broadcast_to(zero + jnp.inf, (b, k)),
            jnp.broadcast_to(zero.astype(jnp.int32) - 1, (b, k)))
    (best_d, best_i), _ = jax.lax.scan(
        scan_chunk, init,
        (jnp.arange(n_chunks, dtype=jnp.int32), codes_c, dec_sq_c))
    return best_d, best_i


@partial(jax.jit, static_argnames=("rotate",))
def _encode_many(x, rotation, codebooks, rotate: bool):
    """x [C, T, D] device-resident chunk stack -> (codes [C, T, M] u8,
    dec_sq [C, T] f32) in ONE dispatch: a lax.map over fixed-shape chunks
    keeps peak memory at one [M, T, K] distance block while amortizing
    the per-dispatch launch overhead (~25 ms on remote-dispatch backends) across
    the whole stack — this is what lifts encode to >=1M codes/s."""
    def one(xc):
        return _encode_chunk(xc, rotation, codebooks, rotate)
    return jax.lax.map(one, x)


@partial(jax.jit, static_argnames=("rotate",))
def _encode_chunk(x, rotation, codebooks, rotate: bool):
    """One fused device program: rotate -> nearest-codeword assign ->
    decode sqnorm. Returns (codes [T, M] u8, dec_sq [T] f32).

    Fusing the three stages into a single jit (instead of rotate / encode /
    gather as separate dispatches) and calling it at ONE fixed chunk shape
    is what makes add() hit >=1M codes/s: every chunk reuses the same
    executable and the argmin never round-trips to the host.
    """
    x = jnp.asarray(x, jnp.float32)
    if rotate:
        x = jnp.matmul(x, rotation, preferred_element_type=jnp.float32)
    m, k, ds = codebooks.shape
    t = x.shape[0]
    # Block-diagonal [D, M*K] codebook operand: ONE MXU matmul with a
    # full 128-deep contraction replaces the per-subspace einsum whose
    # ds(=16)-deep contraction used 1/8 of the MXU and materialized an
    # [M, T, K] f32 block. M x redundant flops, but at full MXU
    # utilization. f32 (HIGHEST) so cell assignments stay identical to
    # ProductQuantizer.encode's f32 path — bf16 here flips near-tie
    # cells and makes add() disagree with pq.encode on the same data.
    cbt = jnp.zeros((m * ds, m * k), jnp.float32)
    for mm in range(m):
        cbt = cbt.at[mm * ds:(mm + 1) * ds, mm * k:(mm + 1) * k].set(
            codebooks[mm].T)
    ip = jnp.matmul(x, cbt, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)      # [T, M*K]
    c_sq = jnp.sum(jnp.square(codebooks), axis=-1)           # [M, K]
    dist = c_sq.reshape(1, m * k) - 2.0 * ip
    codes = jnp.argmin(dist.reshape(t, m, k), axis=-1)       # [T, M]
    dsq = jnp.sum(jnp.take_along_axis(c_sq, codes.T, axis=1), axis=0)
    return codes.astype(jnp.uint8), dsq.astype(jnp.float32)


class FlatADCIndex:
    """Flat scan over PQ/OPQ codes with asymmetric (query-float) distances."""

    ENC_CHUNK = 131_072          # fixed encode sub-chunk (one compile)

    def __init__(self, quantizer, chunk: int = 16384, impl: str = "auto"):
        """quantizer: ProductQuantizer or OPQ. impl: 'xla' | 'pallas' |
        'auto' (pallas on TPU, xla elsewhere)."""
        if isinstance(quantizer, OPQ):
            self.pq = quantizer.pq
            self.rotation = quantizer.rotation
        elif isinstance(quantizer, ProductQuantizer):
            self.pq = quantizer
            self.rotation = None
        else:
            raise TypeError(type(quantizer))
        self.chunk = chunk
        self.impl = impl
        self._codes: jax.Array | None = None     # [N, M] u8 (rotated space)
        self._dec_sq: jax.Array | None = None    # [N] f32
        self._pending: list = []                 # unmaterialized add() chunks
        self._pending_n: int = 0

    @property
    def ntotal(self) -> int:
        base = 0 if self._codes is None else self._codes.shape[0]
        return base + self._pending_n

    def _materialize(self) -> None:
        """Concatenate pending chunks once (amortized O(N), vs the O(N^2)
        of concatenating inside every add)."""
        if not self._pending:
            return
        cs = [c for c, _ in self._pending]
        ds = [d for _, d in self._pending]
        if self._codes is not None:
            cs.insert(0, self._codes)
            ds.insert(0, self._dec_sq)
        self._codes = jnp.concatenate(cs, axis=0)
        self._dec_sq = jnp.concatenate(ds, axis=0)
        self._pending, self._pending_n = [], 0

    @property
    def dim(self) -> int:
        return self.pq.dim

    def _rotate(self, x):
        x = jnp.asarray(x, jnp.float32)
        if self.rotation is None:
            return x
        return jnp.matmul(x, self.rotation,
                          preferred_element_type=jnp.float32)

    def add(self, x=None, *, codes=None) -> None:
        """Add raw float vectors (rotated+encoded here) or precomputed codes
        (already in rotated space).

        Encoding runs as one fused jit per fixed-size sub-chunk (tail
        padded), and chunks are only concatenated lazily on first search —
        the reference encodes ~20k vec/s in its per-vector loop
        (opq/src/IVFOPQ.cpp:141-163); this path exceeds 1M vec/s.
        """
        rot = self.rotation if self.rotation is not None else jnp.zeros(())
        if codes is None:
            # device arrays stay on device (no host round-trip); host
            # arrays are staged chunk-by-chunk
            on_device = isinstance(x, jax.Array)
            if not on_device:
                x = np.asarray(x, np.float32)
            n = x.shape[0]
            step = self.ENC_CHUNK
            if on_device and n > step:
                # single dispatch: pad to a whole number of chunks and
                # run the jitted chunk-map on device
                c_num = -(-n // step)
                xp = jnp.pad(x, ((0, c_num * step - n), (0, 0)))
                cs, dsqs = _encode_many(
                    xp.reshape(c_num, step, x.shape[1]), rot,
                    self.pq.codebooks, self.rotation is not None)
                self._pending.append((cs.reshape(c_num * step, -1)[:n],
                                      dsqs.reshape(c_num * step)[:n]))
                self._pending_n += n
                return
            for s in range(0, n, step):
                chunk = x[s:s + step]
                t = chunk.shape[0]
                if t < step and n > step:
                    pad = ((0, step - t), (0, 0))
                    chunk = (jnp.pad(chunk, pad) if on_device
                             else np.pad(chunk, pad))
                c, d = _encode_chunk(chunk, rot, self.pq.codebooks,
                                     self.rotation is not None)
                self._pending.append((c if t == c.shape[0] else c[:t],
                                      d if t == d.shape[0] else d[:t]))
                self._pending_n += t
        else:
            codes = jnp.asarray(codes, jnp.uint8)
            cbn = self.pq.codeword_sqnorms()                     # [M, K]
            dsq = jnp.sum(jax.vmap(lambda t, c: t[c], in_axes=(0, 1))(
                cbn, codes.astype(jnp.int32)), axis=0)           # [N]
            self._pending.append((codes, dsq))
            self._pending_n += int(codes.shape[0])

    def _resolve_impl(self) -> str:
        if self.impl != "auto":
            return self.impl
        return ("pallas" if jax.default_backend() == "tpu" else "xla")

    def search(self, q, k: int, *, exact: bool = False):
        """q [B, D] raw-space float -> (dists [B, k], ids [B, k]).

        exact=True (Pallas path) re-scores the winning segments in f32,
        giving exact top-k w.r.t. full-precision ADC; the default fast
        path scores with the int8-decode kernel only (top-1 exact by the
        segment lemma up to int8 quantization of the codebooks)."""
        self._materialize()
        if self._codes is None:
            raise RuntimeError("empty index")
        qr = self._rotate(q)
        q_sq = jnp.sum(jnp.square(qr), axis=-1)
        n = self.ntotal
        chunk = min(self.chunk, n)
        npad = -(-n // chunk) * chunk
        codes, dsq = self._codes, self._dec_sq
        if npad != n:
            codes = jnp.concatenate(
                [codes, jnp.zeros((npad - n, self.pq.m), jnp.uint8)], axis=0)
            dsq = jnp.concatenate(
                [dsq, jnp.zeros((npad - n,), jnp.float32)], axis=0)
        impl = self._resolve_impl()
        if impl == "pallas" and k <= 128:
            if (not exact and getattr(self, "_dec8_n", None) == n):
                from cvt_tpu.ops.pallas.adc_scan import adc_search_cached
                interp = jax.default_backend() != "tpu"
                return adc_search_cached(qr, self._dec8_t,
                                         self._norm_col,
                                         self._srow_cache, min(k, n), n,
                                         interpret=interp)
            from cvt_tpu.ops.pallas.adc_scan import adc_search
            codes_t, cbt_q, srow, group = self._pallas_arrays()
            return adc_search(qr, q_sq, self._codes, self._dec_sq,
                              self.pq.codebooks, min(k, n), n,
                              codes_t=codes_t, cbt_q=cbt_q, srow=srow,
                              group=group, exact=exact)
        return _adc_scan(qr, q_sq, codes, dsq, self.pq.codebooks,
                         min(k, n), chunk, n)

    def build_decoded_cache(self) -> None:
        """Materialize the int8-DECODED transposed database [D, Npad]
        plus quantized-space row norms for the decode-free Pallas scan
        (adc_search_cached). A memory/speed trade: 16x the code bytes
        (int8 D per row vs M u8 codes) buys skipping the in-kernel
        one-hot build + decode matmul every query batch. The codes stay
        the index ground truth (recall is identical — the cache IS the
        kernel's decode output, precomputed); rebuild after add()s.
        """
        self._materialize()
        if self._codes is None:
            raise RuntimeError("empty index")
        cb = np.asarray(self.pq.codebooks, np.float32)
        m, kk, ds = cb.shape
        # identical int8 quantization to _group_codebooks (per-dim
        # symmetric scales over the K codewords)
        scales = np.abs(cb).max(axis=1) / 127.0
        scales = np.maximum(scales, 1e-12)
        cb_q = np.clip(np.rint(cb / scales[:, None, :]),
                       -127, 127).astype(np.int8)
        codes = np.asarray(self._codes)
        n = codes.shape[0]
        npad = -(-n // 16384) * 16384
        dec = cb_q[np.arange(m)[None, :],
                   codes.astype(np.int64)].reshape(n, m * ds)
        srow = scales.reshape(m * ds).astype(np.float32)
        norm = ((dec.astype(np.float32) * srow[None, :]) ** 2).sum(1)
        if npad != n:
            dec = np.concatenate(
                [dec, np.zeros((npad - n, m * ds), np.int8)], axis=0)
            norm = np.concatenate([norm, np.zeros(npad - n, np.float32)])
        self._dec8_t = jax.device_put(
            jnp.asarray(np.ascontiguousarray(dec.T)))
        self._norm_col = jax.device_put(jnp.asarray(norm[:, None]))
        self._srow_cache = jnp.asarray(srow)
        self._dec8_n = n

    def _pallas_arrays(self):
        """Transposed int32 codes + grouped codebooks, laid out once for
        the Pallas kernel (padded to the largest tile so any tile_n
        divides)."""
        self._materialize()
        n = self.ntotal
        if getattr(self, "_codes_t_n", None) != n:
            from cvt_tpu.ops.pallas.adc_scan import _group_codebooks
            npad = -(-n // 16384) * 16384
            codes = self._codes
            if npad != n:
                codes = jnp.concatenate(
                    [codes, jnp.zeros((npad - n, self.pq.m), jnp.uint8)],
                    axis=0)
            ct = jnp.asarray(codes).astype(jnp.int32).T          # [M, Npad]
            mpad = -(-ct.shape[0] // 8) * 8
            if mpad != ct.shape[0]:
                ct = jnp.pad(ct, ((0, mpad - ct.shape[0]), (0, 0)))
            self._codes_t = jax.device_put(ct)
            self._cbt_q, self._srow, self._group = _group_codebooks(
                self.pq.codebooks)
            self._codes_t_n = n
        return self._codes_t, self._cbt_q, self._srow, self._group

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        self._materialize()
        np.savez(path, codes=np.asarray(self._codes),
                 dec_sq=np.asarray(self._dec_sq),
                 codebooks=np.asarray(self.pq.codebooks),
                 rotation=(np.asarray(self.rotation)
                           if self.rotation is not None else np.zeros(0)))

    @classmethod
    def load(cls, path: str) -> "FlatADCIndex":
        z = np.load(path, allow_pickle=False)
        pq = ProductQuantizer(jnp.asarray(z["codebooks"]))
        rot = z["rotation"]
        quant = OPQ(jnp.asarray(rot), pq) if rot.size else pq
        idx = cls(quant)
        idx._codes = jnp.asarray(z["codes"])
        idx._dec_sq = jnp.asarray(z["dec_sq"])
        return idx
