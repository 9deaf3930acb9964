"""Feature-layer benchmark at the vlindex operating point (BASELINE
config 3 — the extraction/matching pillar).

Operating point (retrieval/vlindex/src/feature/sift.h:44-113):
max_num_features=8192, first_octave=-1, octave_resolution=3,
peak_threshold=0.02/3, edge_threshold=10, max_num_orientations=2,
L1_ROOT normalization; 640x480 input (the classic SiftGPU bench size).

Measured on one real chip:
  * extraction images/s (batch sweep) with DEVICE-DEPENDENCY-CHAINED
    timing: each dispatch's input folds in a scalar from the previous
    dispatch's output, so iterations serialize on device, and one final
    host fetch bounds the whole chain (block_until_ready alone is
    unreliable on remote-dispatch backends; a giant lax.scan over the
    full extractor has crashed remote workers, so the chain is built
    across ordinary dispatches instead)
  * 2-NN ratio+cross matching pairs/s at K=8192 (sift.cc:55-150 role)
  * two-view geometric verification pairs/s (host-in-the-loop RANSAC
    F/H + config classification, two_view_geometry.cc role)

Writes BENCH_FEATURES.md-ready JSON to stdout.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.features.covdet import extract_sift
from cvt_tpu.io.datasets import procedural_images
from cvt_tpu.utils.profile import measure_launch_overhead

H, W = 480, 640
ITERS = 8


def chain_time(f, inputs, feed, iters=ITERS, overhead=0.0):
    """Serialize `iters` dispatches of f by folding a data-dependent
    scalar of each output into the next input; returns s/iter.
    f: x -> (out, scalar); feed: (inputs, scalar) -> x."""
    s = jnp.float32(0.0)
    out, s = f(feed(inputs, s))        # compile + warm
    float(s)
    t0 = time.time()
    s = s * 0.0
    for _ in range(iters):
        out, s = f(feed(inputs, s))
    float(s)                           # one fetch bounds the chain
    return max(time.time() - t0 - overhead, 1e-9) / iters


def bench_extract(imgs, max_features, n_orientations=2, overhead=0.0):
    b = imgs.shape[0]

    @jax.jit
    def f(im):
        out = extract_sift(im, max_features=max_features,
                           first_octave=-1,
                           n_orientations=n_orientations, rootsift=True)
        return out, out.descriptors[0, 0, 0] * jnp.float32(1e-20)

    imgs_d = jax.device_put(jnp.asarray(imgs))
    sec = chain_time(f, imgs_d, lambda im, s: im + s, overhead=overhead)
    out, _ = f(imgs_d)
    nv = np.asarray(out.n_valid)
    return b / sec, sec, nv


def main(stages=("extract", "match", "verify")):
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    overhead = measure_launch_overhead()
    report = {"operating_point": {
        "h": H, "w": W, "max_features": 8192, "first_octave": -1,
        "peak_threshold": 0.02 / 3, "edge_threshold": 10.0,
        "n_orientations": 2, "normalization": "L1_ROOT"},
        "launch_overhead_ms": round(overhead * 1e3, 2)}

    # ---- extraction sweep ----------------------------------------------
    ext = {}
    sweep = ((1, 8192), (4, 8192), (8, 8192), (16, 8192),
             (8, 2048), (16, 2048)) if "extract" in stages else ()
    for b, k in sweep:
        imgs = procedural_images(b, H, W, seed=b)
        ips, sec, nv = bench_extract(imgs, k, overhead=overhead)
        ext[f"b{b}_k{k}"] = {
            "images_per_s": round(ips, 2),
            "ms_per_batch": round(sec * 1e3, 1),
            "keypoints_mean": round(float(nv.mean()), 1)}
        print(json.dumps({("extract b=%d k=%d" % (b, k)): ext[f"b{b}_k{k}"]}),
              flush=True)
    report["extract"] = ext

    # ---- matching at K=8192 --------------------------------------------
    from cvt_tpu.match.nn import match_descriptors
    imgs = procedural_images(8, H, W, seed=1)
    feats = jax.jit(lambda im: extract_sift(
        im, max_features=8192, first_octave=-1, n_orientations=2,
        rootsift=True))(imgs)
    desc = jnp.asarray(feats.descriptors)          # [8, 8192, 128]
    valid = jnp.asarray(feats.valid)

    @jax.jit
    def match_one(args):
        d1, d2, v1, v2 = args
        r = match_descriptors(d1, d2, v1, v2, ratio=0.9,
                              cross_check=True)
        return r, jnp.sum(r.valid).astype(jnp.float32) * jnp.float32(1e-20)

    pair_ids = [(i, (i + 1) % 8) for i in range(8)]
    di = 0

    def feed(_, s):
        nonlocal di
        i, j = pair_ids[di % len(pair_ids)]
        di += 1
        return (desc[i] + s, desc[j], valid[i], valid[j])

    sec = chain_time(match_one, None, feed, iters=16, overhead=overhead)
    r, _ = match_one((desc[0], desc[1], valid[0], valid[1]))
    n_m = int(jnp.sum(r.valid))
    report["match_k8192"] = {
        "pairs_per_s": round(1.0 / sec, 1),
        "ms_per_pair": round(sec * 1e3, 2),
        "matches_example": n_m}
    print(json.dumps({"match": report["match_k8192"]}), flush=True)

    # ---- two-view verification (host-in-the-loop) ----------------------
    from cvt_tpu.match.two_view import estimate_two_view_geometry
    frames = np.asarray(feats.frames)
    key = jax.random.key(0)
    # warm
    mres = match_one((desc[0], desc[1], valid[0], valid[1]))[0]
    idx2 = np.asarray(mres.idx2)
    mv = np.asarray(mres.valid)
    src = frames[0][:, :2][mv]
    dst = frames[1][idx2, :2][mv]
    npair = max(len(src), 16)
    pad = lambda a: np.pad(a, ((0, npair - len(a)), (0, 0)))
    g = estimate_two_view_geometry(key, pad(src), pad(dst),
                                   np.arange(npair) < len(src))
    # production semantics (match_pairs): pad match sets to a fixed
    # bucket so the batched-hypothesis RANSAC compiles ONCE — feeding
    # raw variable-length sets would recompile per pair
    BUCKET = 1024

    def one_verify(t):
        i, j = t % 8, (t + 1) % 8
        mres = match_one((desc[i], desc[j], valid[i], valid[j]))[0]
        idx2 = np.asarray(mres.idx2)
        mv = np.asarray(mres.valid)
        src = frames[i][:, :2][mv][:BUCKET]
        dst = frames[j][idx2, :2][mv][:BUCKET]
        nsrc = len(src)
        padb = lambda a: np.pad(a, ((0, BUCKET - nsrc), (0, 0)))
        return estimate_two_view_geometry(
            jax.random.fold_in(key, t), padb(src), padb(dst),
            np.arange(BUCKET) < nsrc)

    one_verify(0)                       # warm the bucketed shapes
    t0 = time.time()
    n_ver = 8
    for t in range(n_ver):
        g = one_verify(t)
    ver_s = (time.time() - t0) / n_ver
    report["verify_two_view"] = {
        "pairs_per_s": round(1.0 / ver_s, 2),
        "ms_per_pair": round(ver_s * 1e3, 1),
        "note": "match + RANSAC F/H + config classify, host in loop"}
    print(json.dumps(report), flush=True)
    return report


if __name__ == "__main__":
    stages = tuple(sys.argv[1].split(",")) if len(sys.argv) > 1 else (
        "extract", "match", "verify")
    main(stages)
