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
  3. SELECT: per-tile top-kt extracted by iterative masked lane-min (kt
     VPU passes), so only [n_tiles, B, kt] candidates ever reach HBM —
     never the [N, B] distance matrix.

A final XLA top-k merges per-tile candidates; exact for k <= kt.
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


def _adc_kernel(codes_ref, cbt_ref, q2_ref, vals_ref, ids_ref, dect_ref, *,
                m, k_sub, ds, group, tile_n, kt, n_valid):
    """codes_ref [Mpad, T] i32; cbt_ref [G, g*ds, g*K] bf16 (block-diag
    per group); q2_ref [B, D] bf16 (= -2q); outs [1, B, kt];
    scratch dect_ref [D, T] bf16."""
    i = pl.program_id(0)
    t = tile_n
    g = group
    gk = g * k_sub
    gds = g * ds

    # ---- decode: grouped one-hot matmuls on the MXU --------------------
    for gi in range(m // g):
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (gk, t), 0)
        target = iota2 % k_sub
        # select the code row of the sub-subspace each one-hot row belongs to
        sel = codes_ref[g * gi, :].reshape(1, t)
        for j in range(1, g):
            sel = jnp.where(iota2 // k_sub == j,
                            codes_ref[g * gi + j, :].reshape(1, t), sel)
        onehot = (sel == target).astype(jnp.bfloat16)            # [gK, T]
        dec_g = jax.lax.dot_general(
            cbt_ref[gi], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [gds, T]
        dect_ref[gi * gds:(gi + 1) * gds, :] = dec_g.astype(jnp.bfloat16)

    # ---- score: [B, D] x [D, T] with -2q folded in ---------------------
    dec = dect_ref[:, :]
    ip = jax.lax.dot_general(
        q2_ref[:, :], dec,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [B, T]
    norm = jnp.sum(dec.astype(jnp.float32) * dec.astype(jnp.float32),
                   axis=0, keepdims=True)                        # [1, T]
    dist = ip + norm

    # mask padding rows beyond the true database size
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    dist = jnp.where(i * t + col < n_valid, dist, BIG)

    # ---- per-tile top-kt by iterative masked lane-min ------------------
    iota_l = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)  # [B, T]
    base = i * t
    for j in range(kt):
        minv = jnp.min(dist, axis=1)                             # [B]
        cand = jnp.where(dist == minv[:, None], iota_l, t)
        argm = jnp.min(cand, axis=1)                             # [B]
        vals_ref[0, :, j] = minv
        ids_ref[0, :, j] = argm + base
        dist = jnp.where(iota_l == argm[:, None], BIG, dist)


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_valid", "tile_n", "group", "interpret"))
def _adc_pallas(q2, codes_t, cbt_g, k, n_valid, tile_n, group, interpret):
    """q2 [B, D] bf16; codes_t [Mpad, Npad] i32; cbt_g [G, g*ds, g*K]."""
    b, d = q2.shape
    mpad, npad = codes_t.shape
    grp, gds, gk = cbt_g.shape
    ds = gds // group
    k_sub = gk // group
    m = grp * group
    n_tiles = npad // tile_n
    kt = k

    kernel = functools.partial(
        _adc_kernel, m=m, k_sub=k_sub, ds=ds, group=group, tile_n=tile_n,
        kt=kt, n_valid=n_valid)
    vals, ids = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((mpad, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, kt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, kt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, b, kt), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b, kt), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((d, tile_n), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * (k_sub * d * group + d * b),
            bytes_accessed=npad * mpad * 4 + 2 * n_tiles * kt * b * 4,
            transcendentals=0,
        ),
    )(codes_t, cbt_g, q2)
    return vals, ids


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

    segmin_ref/segarg_ref: [B, n_super * T/seg] column blocks of the
    global [B, Npad/seg] outputs, written in final layout (no transpose
    after). Each grid step loops over n_super inner subtiles so the
    output block is a full 128-lane tile.
    """
    i = pl.program_id(0)
    t = tile_n
    g = group
    gk = g * k_sub
    gds = g * ds
    spt = t // seg                     # segments per subtile

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
            dec_g = jax.lax.dot_general(
                cbt_ref[gi], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dect_ref[gi * gds:(gi + 1) * gds, :] = dec_g.astype(jnp.bfloat16)

        dec = dect_ref[:, :]
        ip = jax.lax.dot_general(
            q2_ref[:, :], dec,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [B, T]
        norm = jnp.sum(dec.astype(jnp.float32) * dec.astype(jnp.float32),
                       axis=0, keepdims=True)
        dist = ip + norm
        base = (i * n_super + sub) * t
        col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        dist = jnp.where(base + col < n_valid, dist, BIG)
        b = dist.shape[0]
        d3 = dist.reshape(b, spt, seg)
        mins = jnp.min(d3, axis=-1)                              # [B, spt]
        segmin_ref[:, sub * spt:(sub + 1) * spt] = mins
        lane = jax.lax.broadcasted_iota(jnp.int32, d3.shape, 2)
        cand = jnp.where(d3 == mins[..., None], lane, seg)
        arg = jnp.min(cand, axis=-1)                             # in-segment
        segcol = jax.lax.broadcasted_iota(jnp.int32, arg.shape, 1)
        segarg_ref[:, sub * spt:(sub + 1) * spt] = (
            base + segcol * seg + arg)                           # global row


@functools.partial(
    jax.jit,
    static_argnames=("n_valid", "tile_n", "seg", "group", "interpret"))
def _adc_segmin(q2, codes_t, cbt_g, n_valid, tile_n, seg, group, interpret):
    """Phase 1: per-segment (min, arg) -> ([B, Npad/seg] f32, i32)."""
    b, d = q2.shape
    mpad, npad = codes_t.shape
    grp, gds, gk = cbt_g.shape
    ds = gds // group
    k_sub = gk // group
    m = grp * group
    # super-tile: enough subtiles that the output block spans 128 lanes
    n_super = max(1, (128 * seg) // tile_n)
    block_n = tile_n * n_super
    n_tiles = npad // block_n

    kernel = functools.partial(
        _adc_segmin_kernel, m=m, k_sub=k_sub, ds=ds, group=group,
        tile_n=tile_n, seg=seg, n_super=n_super, n_valid=n_valid)
    out_lanes = block_n // seg
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
            pl.BlockSpec((b, out_lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, out_lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, npad // seg), jnp.float32),
            jax.ShapeDtypeStruct((b, npad // seg), jnp.int32),
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


@functools.partial(jax.jit, static_argnames=("k",))
def _select_fast(segmin, segarg, q_sq, k):
    neg, j = jax.lax.top_k(-segmin, k)
    ids = jnp.take_along_axis(segarg, j, axis=-1)
    return -neg + q_sq[:, None], ids


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
    bpad = -(-b // 128) * 128
    if tile_n is None:
        tile_n = 2048 if bpad <= 512 else 1024
    block_n = max(tile_n, 128 * seg)
    if npad % block_n:
        raise ValueError(
            f"npad {npad} must be a multiple of the super-tile {block_n}")
    if k > seg:
        raise ValueError(f"two-phase path requires k <= seg ({seg})")

    q2 = (-2.0 * q).astype(jnp.bfloat16)
    if bpad != b:
        q2 = jnp.pad(q2, ((0, bpad - b), (0, 0)))
    if cbt_g is None:
        cbt_g, group = _group_codebooks(codebooks)

    segmin, segarg = _adc_segmin(q2, codes_t, cbt_g, n_valid, tile_n, seg,
                                 group, interpret)
    segmin, segarg = segmin[:b], segarg[:b]              # [B, Npad/seg]
    if not exact:
        return _select_fast(segmin, segarg, q_sq, k)
    n_seg_take = min(k + slack, segmin.shape[1])
    _, seg_ids = jax.lax.top_k(-segmin, n_seg_take)      # [B, S]
    # codes/dec_sq may be unpadded [N, M]/[N]: gathers clamp and the
    # rows >= n_valid mask drops any clamped entries.
    return _rescore_segments(q, q_sq, seg_ids, jnp.asarray(codes),
                             dec_sq, codebooks, k, seg, n_valid)


def _group_codebooks(codebooks) -> tuple[jax.Array, int]:
    """[M, K, ds] -> block-diagonal grouped [G, g*ds, g*K] bf16 with
    g = ceil(16/ds) so decode matmuls have >= 16 sublanes."""
    m, k_sub, ds = codebooks.shape
    g = max(1, -(-16 // ds))
    while m % g:
        g += 1
    cbt = np.zeros((m // g, g * ds, g * k_sub), np.float32)
    cb = np.asarray(codebooks)
    for mm in range(m):
        gi, j = divmod(mm, g)
        cbt[gi, j * ds:(j + 1) * ds, j * k_sub:(j + 1) * k_sub] = cb[mm].T
    return jnp.asarray(cbt, jnp.bfloat16), g


def adc_scan_topk(q, q_sq, codes, dec_sq, codebooks, k, n_valid, *,
                  tile_n: int | None = None, interpret: bool | None = None,
                  codes_t=None, cbt_g=None, group: int | None = None):
    """Fused flat ADC scan; drop-in for the XLA engine in
    cvt_tpu.index.flat_adc.

    q [B, D] f32 (rotated space); codes [Npad, M] u8 (ignored when
    `codes_t` [Mpad, Npad] i32 is supplied); dec_sq unused (norms are
    recomputed in-kernel from the bf16 decode for self-consistency);
    codebooks [M, K, ds] f32. Returns (dists [B, k], ids [B, k]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d = q.shape
    if codes_t is None:
        ct = jnp.asarray(codes).astype(jnp.int32).T             # [M, Npad]
        m = ct.shape[0]
        mpad = -(-m // 8) * 8
        codes_t = (jnp.pad(ct, ((0, mpad - m), (0, 0))) if mpad != m else ct)
    npad = codes_t.shape[1]
    if k > 64:
        raise ValueError("pallas path supports k <= 64; use impl='xla'")

    bpad = -(-b // 128) * 128
    if tile_n is None:
        tile_n = 2048 if bpad <= 512 else 1024
    if npad % tile_n:
        raise ValueError(f"npad {npad} must be a multiple of tile_n {tile_n}")

    q2 = (-2.0 * q).astype(jnp.bfloat16)                        # [B, D]
    if bpad != b:
        q2 = jnp.pad(q2, ((0, bpad - b), (0, 0)))
    if cbt_g is None:
        cbt_g, group = _group_codebooks(codebooks)

    vals, ids = _adc_pallas(q2, codes_t, cbt_g, k, n_valid, tile_n,
                            group, interpret)
    # ---- XLA merge of per-tile candidates ------------------------------
    n_tiles = vals.shape[0]
    vals = vals.transpose(1, 0, 2).reshape(bpad, n_tiles * k)   # [B, C]
    ids = ids.transpose(1, 0, 2).reshape(bpad, n_tiles * k)
    neg, j = jax.lax.top_k(-vals, k)
    best_i = jnp.take_along_axis(ids, j, axis=-1)
    best_d = -neg[:b] + q_sq[:, None]
    return best_d, best_i[:b]
