"""Phase profile of the NEW fast extraction path."""
import time
import numpy as np, jax, jax.numpy as jnp
from cvt_tpu.features.scale_space import build_pyramid
from cvt_tpu.features.detect import detect_octave
from cvt_tpu.features.descriptor import (assign_orientations_multi_flat,
                                         sift_descriptors_flat)
from cvt_tpu.io.datasets import procedural_images

B = 8
imgs = jnp.asarray(procedural_images(B, 480, 640, seed=0))

def timed(name, fn):
    f = jax.jit(fn)
    out = f(imgs)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    s = jnp.float32(0.0)
    for _ in range(3):
        out = f(imgs + s)
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20
    float(s)
    print(f"{name}: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)

def stage(im, upto):
    pyr = build_pyramid(im, first_octave=-1, with_gradients=True)
    det = dict(x=[], y=[], lf=[], lev=[], resp=[], valid=[], oct=[])
    meta_base, meta_h, meta_w = [], [], []
    off = 0
    for oi, o in enumerate(pyr):
        l, h, w = o.grad_dx.shape[1:]
        k_oct = min(8192, o.dog.shape[1]*o.dog.shape[2]*o.dog.shape[3])
        x, y, lf, lev, resp, valid = detect_octave(o.dog, max_k=k_oct,
                                                   peak_threshold=0.02/3)
        for k_, v_ in zip("x y lf lev resp valid".split(),
                          (x, y, lf, lev, resp, valid)):
            det[k_].append(v_)
        det["oct"].append(jnp.full(x.shape, oi, jnp.int32))
        meta_base.append(off); meta_h.append(h); meta_w.append(w)
        off += l*h*w
    cat = {k: jnp.concatenate(v, 1) for k, v in det.items()}
    score = jnp.where(cat["valid"], jnp.abs(cat["resp"]), -1.0)
    _, sel = jax.lax.top_k(score, 8192)
    take = lambda a: jnp.take_along_axis(a, sel, 1)
    x, y, lf = take(cat["x"]), take(cat["y"]), take(cat["lf"])
    lev, resp, valid, oct_i = (take(cat["lev"]), take(cat["resp"]),
                               take(cat["valid"]), take(cat["oct"]))
    sig = 1.6 * 2.0 ** (lf / 3.0)
    if upto == "detect":
        return x, y, resp
    dxf = jnp.concatenate([o.grad_dx.reshape(B, -1) for o in pyr], 1)
    dyf = jnp.concatenate([o.grad_dy.reshape(B, -1) for o in pyr], 1)
    ba = jnp.asarray(meta_base, jnp.int32)
    ha = jnp.asarray(meta_h, jnp.int32)
    wa = jnp.asarray(meta_w, jnp.int32)
    angs, aok = assign_orientations_multi_flat(dxf, dyf, ba, ha, wa,
                                               oct_i, x, y, sig, lev,
                                               valid, n_orientations=2)
    if upto == "orient":
        return angs
    t = lambda a: jnp.repeat(a, 2, 1)
    d = sift_descriptors_flat(dxf, dyf, ba, ha, wa, t(oct_i), t(x), t(y),
                              t(sig), t(lev), angs.reshape(B, -1),
                              aok.reshape(B, -1))
    return d

timed("detect+select", lambda im: stage(im, "detect"))
timed("+orient(8192,O=2)", lambda im: stage(im, "orient"))
timed("+desc(16384)", lambda im: stage(im, "desc"))
