"""Fused Pallas ADC scan: streamed PQ-code decode + score matmul + top-k.

This kernel IS the north-star metric (BASELINE.json): it replaces both the
reference's IVF probe heap (opq/src/IVFOPQ.cpp:237-309) and hnswlib's
graph walk (hnswalg.h:218-282) with a flat HBM-resident code scan.

Per grid tile of TILE_N code rows (auto-pipelined HBM->VMEM):
  1. DECODE-FIRST (the TPU-native ADC formulation): subspace codes become
     one-hot [K, T] masks contracted with transposed codebooks on the
     MXU, writing a decoded [D, T] bf16 tile into VMEM scratch. Cost
     2*K*D flops/row amortized over the WHOLE query batch — versus the
     CPU LUT-sum's per-query gather loop (2*M*K*B per row). Subspaces
     are grouped block-diagonally so every matmul has >= 16 sublanes.
  2. SCORE: one [B, D] x [D, T] MXU matmul with -2q folded in, plus the
     row norms ||decode||^2 reduced on the VPU from the same bf16 tile
     (so scoring is self-consistent in the bf16-decoded space); the
     per-query ||q||^2 is added at merge time.
  3. SELECT: per-128-row SEGMENT minima (+argmins) are the only values
     that reach HBM — never the [N, B] distance matrix. One small XLA
     top-k over segment minima finishes the query (the segment lemma in
     _adc_segmin_kernel makes this exact-by-construction for top-1 and
     near-exact for k <= seg; exact=True re-scores winning segments).

Cross-checked against the pure-XLA engine in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38  # finite +inf stand-in (inf arithmetic is slow on the VPU)


def _adc_segmin_kernel(codes_ref, cbt_ref, q2_ref, segmin_ref, segarg_ref,
                       dect_ref, *, m, k_sub, ds, group, tile_n, seg,
                       n_super, n_valid):
    """Phase-1 kernel: decode + score a tile, emit per-SEGMENT min+argmin.

    Segment lemma: a query's k-th smallest distance tau bounds the
    segments of interest — every candidate <= tau lies in a segment whose
    min <= tau, and at most k segments have min <= tau. So the k best
    segments by segment-min contain the exact top-k; their argmins give
    one candidate each (exact top-1; at higher k a segment holding two
    winners contributes only its best — vanishing probability at
    N/seg >> k, and the exact=True path re-scores whole segments).
    Phase 1 is pure matmul + min reductions: the kt-pass in-kernel
    extraction of the naive design disappears entirely.

    Everything runs in [T, B] orientation: the (T, B) -> (T/seg, seg, B)
    reshape splits SUBLANES, which is layout-free on TPU (the [B, T]
    orientation's lane-split reshape forced a full relayout per subtile
    and made large-B runs 5x slower). segmin_ref/segarg_ref: [128, B] row
    blocks of the global [Npad/seg, B] outputs (each grid step covers
    n_super subtiles so its output block spans exactly 128 sublanes).
    """
    i = pl.program_id(0)
    t = tile_n
    g = group
    gk = g * k_sub
    gds = g * ds
    spt = t // seg                     # segments per subtile
    b = q2_ref.shape[0]

    for sub in range(n_super):
        for gi in range(m // g):
            iota2 = jax.lax.broadcasted_iota(jnp.int32, (gk, t), 0)
            target = iota2 % k_sub
            sel = codes_ref[g * gi, sub * t:(sub + 1) * t].reshape(1, t)
            for j in range(1, g):
                sel = jnp.where(
                    iota2 // k_sub == j,
                    codes_ref[g * gi + j, sub * t:(sub + 1) * t]
                    .reshape(1, t), sel)
            onehot = (sel == target).astype(jnp.bfloat16)
            # precision pinned to DEFAULT: bf16 x bf16 -> f32 is the native
            # MXU mode; a global jax_default_matmul_precision=highest would
            # otherwise inject contract_precision=fp32, which Mosaic
            # rejects for bf16 operands ("Bad lhs type")
            dec_g = jax.lax.dot_general(
                cbt_ref[gi], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            dect_ref[gi * gds:(gi + 1) * gds, :] = dec_g.astype(jnp.bfloat16)

        dec = dect_ref[:, :]                                     # [D, T]
        ip = jax.lax.dot_general(
            dec, q2_ref[:, :],
            dimension_numbers=(((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)                  # [T, B]
        # ||dec||^2 as a [T, 1] column via a 1-wide MXU matmul (keeps the
        # whole pipeline in [T, B] orientation, no transposes)
        dec32 = dec.astype(jnp.float32)
        norm = jax.lax.dot_general(
            dec32 * dec32, jnp.ones((1, dec.shape[0]), jnp.float32),
            dimension_numbers=(((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                  # [T, 1]
        dist = ip + norm
        base = (i * n_super + sub) * t
        row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        dist = jnp.where(base + row < n_valid, dist, BIG)
        d3 = dist.reshape(spt, seg, b)         # sublane split: layout-free
        mins = jnp.min(d3, axis=1)                               # [spt, B]
        segmin_ref[sub * spt:(sub + 1) * spt, :] = mins
        lane = jax.lax.broadcasted_iota(jnp.int32, d3.shape, 1)
        cand = jnp.where(d3 == mins[:, None, :], lane, seg)
        arg = jnp.min(cand, axis=1)                              # [spt, B]
        segrow = jax.lax.broadcasted_iota(jnp.int32, arg.shape, 0)
        segarg_ref[sub * spt:(sub + 1) * spt, :] = (
            base + segrow * seg + arg)                           # global row


@functools.partial(
    jax.jit,
    static_argnames=("n_valid", "tile_n", "seg", "group", "interpret"))
def _adc_segmin(q2, codes_t, cbt_g, n_valid, tile_n, seg, group, interpret):
    """Phase 1: per-segment (min, arg) -> ([Npad/seg, B] f32, i32)."""
    b, d = q2.shape
    mpad, npad = codes_t.shape
    grp, gds, gk = cbt_g.shape
    ds = gds // group
    k_sub = gk // group
    m = grp * group
    # output block (tile_n/seg, B) needs only sublane alignment (mult. of
    # 8), so one subtile per grid step suffices: tile_n/seg = 8 or 16
    n_super = 1
    block_n = tile_n
    n_tiles = npad // block_n

    kernel = functools.partial(
        _adc_segmin_kernel, m=m, k_sub=k_sub, ds=ds, group=group,
        tile_n=tile_n, seg=seg, n_super=n_super, n_valid=n_valid)
    out_rows = block_n // seg          # = 128 rows per grid step
    segmin, segarg = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((mpad, block_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((out_rows, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_rows, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad // seg, b), jnp.float32),
            jax.ShapeDtypeStruct((npad // seg, b), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((d, tile_n), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * (k_sub * d * group + d * b),
            bytes_accessed=npad * mpad * 4 + 2 * b * npad // seg * 4,
            transcendentals=0,
        ),
    )(codes_t, cbt_g, q2)
    return segmin, segarg


@functools.partial(jax.jit, static_argnames=("k", "seg", "n_valid"))
def _rescore_segments(q, q_sq, seg_ids, codes, dec_sq, codebooks, k, seg,
                      n_valid):
    """Phase 2 (XLA): exact f32 ADC re-score of the k chosen segments.

    seg_ids [B, S]; codes [Npad, M] u8; dec_sq [Npad] f32. Returns the
    final (dists [B, k], ids [B, k]) with full-precision LUT scoring.
    """
    b, s = seg_ids.shape
    m, k_sub, ds = codebooks.shape
    # gather candidate rows: [B, S*seg]
    rows = (seg_ids[:, :, None] * seg
            + jnp.arange(seg, dtype=jnp.int32)[None, None, :])
    rows = rows.reshape(b, s * seg)
    cand_codes = codes[rows].astype(jnp.int32)           # [B, C, M]
    cand_dsq = dec_sq[rows]                              # [B, C]
    # per-query LUT of -2 <q_m, cb[m,k]>  (f32)
    qs = q.reshape(b, m, ds)
    lut = -2.0 * jnp.einsum("bms,mks->bmk", qs, codebooks,
                            preferred_element_type=jnp.float32)
    g = jnp.take_along_axis(
        lut, cand_codes.transpose(0, 2, 1), axis=2)      # [B, M, C]
    dist = jnp.sum(g, axis=1) + cand_dsq + q_sq[:, None]
    dist = jnp.where(rows < n_valid, dist, jnp.inf)
    neg, j = jax.lax.top_k(-dist, k)
    ids = jnp.take_along_axis(rows, j, axis=-1)
    return -neg, ids


@functools.partial(
    jax.jit, static_argnames=("k", "n_valid", "tile_n", "seg", "group",
                              "interpret"))
def _adc_search_fast(q, codes_t, cbt_g, k, n_valid, tile_n, seg, group,
                     interpret):
    """One fused jit: query prep + segmin kernel + selection (the eager
    per-op dispatch overhead of a split pipeline dwarfed the kernel)."""
    b = q.shape[0]
    q_sq = jnp.sum(jnp.square(q), axis=-1)
    bpad = -(-b // 128) * 128
    q2 = (-2.0 * q).astype(jnp.bfloat16)
    if bpad != b:
        q2 = jnp.pad(q2, ((0, bpad - b), (0, 0)))
    segmin, segarg = _adc_segmin(q2, codes_t, cbt_g, n_valid, tile_n, seg,
                                 group, interpret)       # [Npad/seg, Bpad]
    segmin, segarg = segmin.T[:b], segarg.T[:b]
    neg, j = jax.lax.top_k(-segmin, k)
    ids = jnp.take_along_axis(segarg, j, axis=-1)
    return -neg + q_sq[:, None], ids


@functools.partial(
    jax.jit, static_argnames=("k", "n_valid", "tile_n", "seg", "group",
                              "slack", "interpret"))
def _adc_search_exact(q, codes_t, cbt_g, codes, dec_sq, codebooks, k,
                      n_valid, tile_n, seg, group, slack, interpret):
    b = q.shape[0]
    q_sq = jnp.sum(jnp.square(q), axis=-1)
    bpad = -(-b // 128) * 128
    q2 = (-2.0 * q).astype(jnp.bfloat16)
    if bpad != b:
        q2 = jnp.pad(q2, ((0, bpad - b), (0, 0)))
    segmin, segarg = _adc_segmin(q2, codes_t, cbt_g, n_valid, tile_n, seg,
                                 group, interpret)
    segmin = segmin.T[:b]
    n_seg_take = min(k + slack, segmin.shape[1])
    _, seg_ids = jax.lax.top_k(-segmin, n_seg_take)      # [B, S]
    return _rescore_segments(q, q_sq, seg_ids, codes, dec_sq, codebooks,
                             k, seg, n_valid)


def adc_search(q, q_sq, codes, dec_sq, codebooks, k, n_valid, *,
               codes_t=None, cbt_g=None, group=None,
               tile_n: int | None = None, seg: int = 128,
               slack: int = 4, exact: bool = False,
               interpret: bool | None = None):
    """Two-phase fused ADC search: Pallas segment-min scan + selection.

    Fast path (default): the top-k segments' argmins ARE the results —
    exact top-1 always; for k > 1 a segment holding two true winners
    contributes only its best (probability ~ k^2/(2 N/seg), negligible at
    scale). exact=True re-scores the k+slack winning segments in f32 for
    guaranteed exact top-k (w.r.t. phase-1 bf16 scoring). Any k <= seg.
    q_sq may be None (recomputed inside the fused jit).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d = q.shape
    if codes_t is None:
        ct = jnp.asarray(codes).astype(jnp.int32).T
        m = ct.shape[0]
        mpad = -(-m // 8) * 8
        codes_t = (jnp.pad(ct, ((0, mpad - m), (0, 0))) if mpad != m else ct)
    npad = codes_t.shape[1]
    if tile_n is None:
        tile_n = 1024
    if npad % tile_n:
        raise ValueError(f"npad {npad} must be a multiple of {tile_n}")
    if k > seg:
        raise ValueError(f"two-phase path requires k <= seg ({seg})")
    if cbt_g is None:
        cbt_g, group = _group_codebooks(codebooks)
    q = jnp.asarray(q, jnp.float32)

    if not exact:
        return _adc_search_fast(q, codes_t, cbt_g, k, n_valid, tile_n,
                                seg, group, interpret)
    return _adc_search_exact(q, codes_t, cbt_g, jnp.asarray(codes),
                             dec_sq, codebooks, k, n_valid, tile_n, seg,
                             group, slack, interpret)


def _group_codebooks(codebooks) -> tuple[jax.Array, int]:
    """[M, K, ds] -> block-diagonal grouped [G, g*ds, g*K] bf16.

    Group size targets >= 64 output sublanes per decode matmul (measured
    2x faster than the minimal 16-sublane grouping on v5e despite the
    block-diagonal zero padding), rounded up to a divisor of M."""
    m, k_sub, ds = codebooks.shape
    g = min(m, max(1, -(-64 // ds)))
    while m % g:
        g += 1
    cbt = np.zeros((m // g, g * ds, g * k_sub), np.float32)
    cb = np.asarray(codebooks)
    for mm in range(m):
        gi, j = divmod(mm, g)
        cbt[gi, j * ds:(j + 1) * ds, j * k_sub:(j + 1) * k_sub] = cb[mm].T
    return jnp.asarray(cbt, jnp.bfloat16), g
