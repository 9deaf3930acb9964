"""Top-level SIFT extraction: images in, fixed-size features out.

The public equivalent of `vl_covdet()` (covdet/vl_covdet.hpp:33-266) and
`ExtractSiftFeaturesCPU` (retrieval/vlindex/src/feature/sift.cc:422):
grayscale images -> keypoint frames (x, y, sigma, angle) + 128-d
descriptors. Ragged per-image keypoint counts become fixed [B, maxK]
slots with a validity mask (SURVEY.md §7 "ragged features" hard part).

Per octave: detect -> refine -> orient -> describe; octave results are
concatenated and reduced to the global top-maxK by |response| — matching
the reference's max_num_features cap (sift.h:62, makeSIFTs.cpp cap 128).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cvt_tpu.features.affine import estimate_affine_shape
from cvt_tpu.features.descriptor import (
    assign_orientations, assign_orientations_multi, root_sift,
    sift_descriptors)
from cvt_tpu.features.detect import detect_octave, hessian_response
from cvt_tpu.features.scale_space import build_pyramid


@jax.tree_util.register_dataclass
@dataclass
class SiftFeatures:
    """frames [B, K, 4] = (x, y, sigma, angle) in input-image coords;
    descriptors [B, K, 128]; response [B, K]; valid [B, K] bool.

    Registered as a pytree so `extract_sift` can sit directly under a
    caller's `jax.jit` / `vmap` / `shard_map`.
    """
    frames: jax.Array
    descriptors: jax.Array
    response: jax.Array
    valid: jax.Array
    affine: jax.Array | None = None   # [B, K, 2, 2] unit-det shape

    @property
    def n_valid(self):
        return jnp.sum(self.valid, axis=-1)


def extract_sift(images, *, max_features: int = 512,
                 peak_threshold: float | None = None,
                 edge_threshold: float = 10.0,
                 first_octave: int = -1, n_scales: int = 3,
                 rootsift: bool = False,
                 n_orientations: int = 1,
                 detector: str = "dog",
                 affine_shape: bool = False,
                 dsp_num_scales: int = 1,
                 dsp_min_scale: float = 1.0 / 6.0,
                 dsp_max_scale: float = 3.0,
                 max_per_octave: int | None = None) -> SiftFeatures:
    """images [B, H, W] float in [0, 1] (grayscale) -> SiftFeatures.

    Defaults mirror vlindex (sift.h:59-84); rootsift=True applies the
    L1-sqrt transform of hnsw_sifts_retrieval.

    n_orientations > 1 duplicates keypoints at secondary orientation
    peaks >= 0.8x max, the reference's vl_covdet_extract_orientations
    behavior (vl_covdet.hpp:174-186) — each duplicate gets its own
    descriptor slot.

    dsp_num_scales > 1 enables DSP-SIFT domain-size pooling
    (sift.h:97-100): descriptors are averaged over dsp_num_scales
    domain sizes geometrically spaced in [dsp_min_scale, dsp_max_scale]
    x sigma, then re-normalized.

    detector: "dog" (difference of Gaussians) or "hessian" — the
    scale-normalized determinant-of-Hessian response, the reference
    covdet DEFAULT (vl_covdet.hpp:73-88 METHOD_HESSIAN; its
    peakThreshold default there is 5e-4, applied here when
    peak_threshold is left unset).

    affine_shape=True runs the second-moment affine adaptation
    (vl_covdet_extract_affine_shape, :159-173) and samples orientations
    + descriptors through each keypoint's elliptical shape; the
    estimated unit-det A matrices land in SiftFeatures.affine.
    """
    if peak_threshold is None:
        peak_threshold = 5e-4 if detector == "hessian" else 0.02 / 3
    images = jnp.asarray(images, jnp.float32)
    if images.ndim == 2:
        images = images[None]
    pyr = build_pyramid(images, n_scales=n_scales,
                        first_octave=first_octave, with_gradients=True)
    b = images.shape[0]
    per_oct = max_per_octave or max_features

    if not affine_shape:
        # Fast path: detect on every octave (cheap stencils), select the
        # GLOBAL top-max_features by |response| first, then run the
        # expensive per-keypoint orientation/descriptor sampling once
        # over a concatenated flat gradient stack — identical results to
        # the describe-everything-then-select order (selection is by
        # response, which per-keypoint processing never changes), at
        # 1/n_octaves of the sampling cost.
        return _extract_fast(images, pyr, b, per_oct, max_features,
                             peak_threshold, edge_threshold, n_scales,
                             rootsift, n_orientations, detector,
                             dsp_num_scales, dsp_min_scale,
                             dsp_max_scale)

    def describe(octv, x_f, y_f, sigma_oct, lev_i, ang, valid, am):
        if dsp_num_scales <= 1:
            return sift_descriptors(octv.grad_dx, octv.grad_dy, x_f, y_f,
                                    sigma_oct, lev_i, ang, valid,
                                    affine=am)
        # DSP: average the descriptor over pooled domain sizes
        ratios = np.geomspace(dsp_min_scale, dsp_max_scale,
                              dsp_num_scales).astype(np.float32)
        acc = 0.0
        for rt in ratios:
            acc = acc + sift_descriptors(
                octv.grad_dx, octv.grad_dy, x_f, y_f,
                sigma_oct * float(rt), lev_i, ang, valid, affine=am)
        d = acc / float(dsp_num_scales)
        d = d * jax.lax.rsqrt(
            jnp.sum(jnp.square(d), axis=-1, keepdims=True) + 1e-12)
        return jnp.where(valid[..., None], d, 0.0)

    parts = []
    for octv in pyr:
        if detector == "hessian":
            resp_stack = hessian_response(octv.gauss, n_scales=n_scales)
        elif detector == "dog":
            resp_stack = octv.dog
        else:
            raise ValueError(f"unknown detector {detector!r}")
        x_f, y_f, l_f, lev_i, resp, valid = detect_octave(
            resp_stack, max_k=per_oct, peak_threshold=peak_threshold,
            edge_threshold=edge_threshold)
        # sigma in octave pixels from the refined level coordinate
        sigma_oct = 1.6 * (2.0 ** (l_f / float(n_scales)))
        if affine_shape:
            am = estimate_affine_shape(octv.grad_dx, octv.grad_dy, x_f,
                                       y_f, sigma_oct, lev_i, valid)
        else:
            am = None
        if n_orientations > 1:
            # duplicate keypoints per orientation peak: [B, K, O] -> K*O
            angs, aok = assign_orientations_multi(
                octv.grad_dx, octv.grad_dy, x_f, y_f, sigma_oct, lev_i,
                valid, n_orientations=n_orientations, affine=am)
            o = n_orientations
            tile = lambda a: jnp.repeat(a, o, axis=1)
            x_f, y_f = tile(x_f), tile(y_f)
            sigma_oct, lev_i = tile(sigma_oct), tile(lev_i)
            resp = tile(resp)
            if am is not None:
                am = jnp.repeat(am, o, axis=1)
            ang = angs.reshape(b, -1)
            valid = aok.reshape(b, -1)
        else:
            ang = assign_orientations(octv.grad_dx, octv.grad_dy, x_f,
                                      y_f, sigma_oct, lev_i, valid,
                                      affine=am)
        # gradients live on the Gaussian levels; use the nearest level
        desc = describe(octv, x_f, y_f, sigma_oct, lev_i, ang, valid, am)
        step = octv.step
        eye2 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32),
                                x_f.shape + (2, 2))
        parts.append(dict(
            x=x_f * step, y=y_f * step, sigma=sigma_oct * step,
            angle=ang, resp=jnp.where(valid, resp, 0.0),
            valid=valid, desc=desc, aff=am if am is not None else eye2))

    cat = {k: jnp.concatenate([p[k] for p in parts], axis=1)
           for k in parts[0]}
    # global top-maxK by |response|
    score = jnp.where(cat["valid"], jnp.abs(cat["resp"]), -1.0)
    _, sel = jax.lax.top_k(score, min(max_features, score.shape[1]))
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    frames = jnp.stack([take(cat["x"]), take(cat["y"]),
                        take(cat["sigma"]), take(cat["angle"])], axis=-1)
    desc = jnp.take_along_axis(cat["desc"], sel[..., None], axis=1)
    valid = take(cat["valid"]) & (take(cat["resp"]) != 0.0)
    aff = jnp.take_along_axis(cat["aff"], sel[..., None, None], axis=1)
    if rootsift:
        desc = jnp.where(valid[..., None], root_sift(desc), 0.0)
    return SiftFeatures(frames=frames, descriptors=desc,
                        response=take(cat["resp"]), valid=valid,
                        affine=aff if affine_shape else None)


def _extract_fast(images, pyr, b, per_oct, max_features, peak_threshold,
                  edge_threshold, n_scales, rootsift, n_orientations,
                  detector, dsp_num_scales, dsp_min_scale, dsp_max_scale):
    """Global-top-K-first extraction (see extract_sift fast path)."""
    from cvt_tpu.features.descriptor import (
        assign_orientations_multi_flat, sift_descriptors_flat)

    # ---- pass 1: detection on every octave -----------------------------
    det = dict(x=[], y=[], lf=[], lev=[], resp=[], valid=[], oct=[])
    meta_base, meta_h, meta_w, meta_step = [], [], [], []
    offset = 0
    for oi, octv in enumerate(pyr):
        if detector == "hessian":
            resp_stack = hessian_response(octv.gauss, n_scales=n_scales)
        elif detector == "dog":
            resp_stack = octv.dog
        else:
            raise ValueError(f"unknown detector {detector!r}")
        l, h, w = octv.grad_dx.shape[1:]
        # an octave cannot yield more keypoints than candidate positions
        k_oct = min(per_oct, resp_stack.shape[1] * resp_stack.shape[2]
                    * resp_stack.shape[3])
        x_f, y_f, l_f, lev_i, resp, valid = detect_octave(
            resp_stack, max_k=k_oct, peak_threshold=peak_threshold,
            edge_threshold=edge_threshold)
        det["x"].append(x_f)
        det["y"].append(y_f)
        det["lf"].append(l_f)
        det["lev"].append(lev_i)
        det["resp"].append(resp)
        det["valid"].append(valid)
        det["oct"].append(jnp.full(x_f.shape, oi, jnp.int32))
        meta_base.append(offset)
        meta_h.append(h)
        meta_w.append(w)
        meta_step.append(octv.step)
        offset += l * h * w
    cat = {k: jnp.concatenate(v, axis=1) for k, v in det.items()}

    # ---- global selection BEFORE sampling ------------------------------
    k_det = min(max_features, cat["resp"].shape[1])
    score = jnp.where(cat["valid"], jnp.abs(cat["resp"]), -1.0)
    _, sel = jax.lax.top_k(score, k_det)
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    x_f, y_f, l_f = take(cat["x"]), take(cat["y"]), take(cat["lf"])
    lev_i, resp = take(cat["lev"]), take(cat["resp"])
    valid, oct_i = take(cat["valid"]), take(cat["oct"])
    sigma_oct = 1.6 * (2.0 ** (l_f / float(n_scales)))

    # ---- flat gradient stacks + octave metadata ------------------------
    # INTERLEAVED (dx, dy) so every bilinear row is one contiguous
    # 4-element gather (_flat_sampler_pair)
    gf = jnp.concatenate(
        [jnp.stack([o.grad_dx.reshape(b, -1), o.grad_dy.reshape(b, -1)],
                   axis=-1).reshape(b, -1) for o in pyr], axis=1)
    base_arr = jnp.asarray(meta_base, jnp.int32)
    h_arr = jnp.asarray(meta_h, jnp.int32)
    w_arr = jnp.asarray(meta_w, jnp.int32)
    step_arr = jnp.asarray(meta_step, jnp.float32)

    # ---- orientation (with duplication) --------------------------------
    angs, aok = assign_orientations_multi_flat(
        gf, base_arr, h_arr, w_arr, oct_i, x_f, y_f, sigma_oct,
        lev_i, valid, n_orientations=max(n_orientations, 1))
    if n_orientations > 1:
        o = n_orientations
        tile = lambda a: jnp.repeat(a, o, axis=1)
        x_f, y_f = tile(x_f), tile(y_f)
        sigma_oct, lev_i = tile(sigma_oct), tile(lev_i)
        resp, oct_i = tile(resp), tile(oct_i)
        ang = angs.reshape(b, -1)
        valid = aok.reshape(b, -1)
    else:
        # dominant peak only; keep the original validity semantics
        ang = angs[..., 0]

    # ---- descriptors (+ optional DSP pooling) --------------------------
    def describe(sig):
        return sift_descriptors_flat(
            gf, base_arr, h_arr, w_arr, oct_i, x_f, y_f, sig,
            lev_i, ang, valid)

    if dsp_num_scales <= 1:
        desc = describe(sigma_oct)
    else:
        ratios = np.geomspace(dsp_min_scale, dsp_max_scale,
                              dsp_num_scales).astype(np.float32)
        acc = 0.0
        for rt in ratios:
            acc = acc + describe(sigma_oct * float(rt))
        desc = acc / float(dsp_num_scales)
        desc = desc * jax.lax.rsqrt(
            jnp.sum(jnp.square(desc), axis=-1, keepdims=True) + 1e-12)
        desc = jnp.where(valid[..., None], desc, 0.0)

    # ---- final cap over duplicated slots -------------------------------
    step = step_arr[oct_i]
    if x_f.shape[1] > max_features:
        score2 = jnp.where(valid, jnp.abs(resp), -1.0)
        _, sel2 = jax.lax.top_k(score2, max_features)
        t2 = lambda a: jnp.take_along_axis(a, sel2, axis=1)
        x_f, y_f, sigma_oct = t2(x_f), t2(y_f), t2(sigma_oct)
        ang, resp, valid, step = t2(ang), t2(resp), t2(valid), t2(step)
        desc = jnp.take_along_axis(desc, sel2[..., None], axis=1)
    frames = jnp.stack([x_f * step, y_f * step, sigma_oct * step, ang],
                       axis=-1)
    valid = valid & (resp != 0.0)
    if rootsift:
        desc = jnp.where(valid[..., None], root_sift(desc), 0.0)
    return SiftFeatures(frames=frames, descriptors=desc,
                        response=jnp.where(valid, resp, 0.0),
                        valid=valid, affine=None)
