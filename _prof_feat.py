"""Phase profile of extract_sift at the operating point."""
import time, sys
import numpy as np, jax, jax.numpy as jnp
from cvt_tpu.features.scale_space import build_pyramid
from cvt_tpu.features.detect import detect_octave, hessian_response
from cvt_tpu.features.descriptor import (assign_orientations_multi,
                                         sift_descriptors)
from cvt_tpu.io.datasets import procedural_images

B = 4
imgs = jnp.asarray(procedural_images(B, 480, 640, seed=0))

def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # chained-ish: 3 dependent reps via scalar folding
    t0 = time.time()
    reps = 3
    s = jnp.float32(0.0)
    for _ in range(reps):
        out = f(*((args[0] + s,) + args[1:]))
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20
    float(s)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.0f} ms", flush=True)
    return out

# pyramid
pyr_fn = lambda im: tuple((o.gauss, o.dog, o.grad_dx, o.grad_dy)
                          for o in build_pyramid(im, first_octave=-1))
pyr = timed("pyramid(first_octave=-1)", pyr_fn, imgs)

# detect per octave (all octaves)
def det_fn(im):
    outs = []
    for o in build_pyramid(im, first_octave=-1):
        outs.append(detect_octave(o.dog, max_k=8192,
                                  peak_threshold=0.02/3))
    return outs
det = timed("pyramid+detect", det_fn, imgs)

# orientation only on octave 0
def ori_fn(im):
    o = build_pyramid(im, first_octave=-1)[0]
    x, y, l, li, r, v = detect_octave(o.dog, max_k=8192,
                                      peak_threshold=0.02/3)
    sig = 1.6 * (2.0 ** (l / 3.0))
    ang, ok = assign_orientations_multi(o.grad_dx, o.grad_dy, x, y, sig,
                                        li, v, n_orientations=2)
    return ang
timed("pyr+detect+orient(oct0,K=8192,O=2)", ori_fn, imgs)

# descriptors only on octave 0 (2 orientations => 16384 slots)
def desc_fn(im):
    o = build_pyramid(im, first_octave=-1)[0]
    x, y, l, li, r, v = detect_octave(o.dog, max_k=8192,
                                      peak_threshold=0.02/3)
    sig = 1.6 * (2.0 ** (l / 3.0))
    ang, ok = assign_orientations_multi(o.grad_dx, o.grad_dy, x, y, sig,
                                        li, v, n_orientations=2)
    t = lambda a: jnp.repeat(a, 2, axis=1)
    d = sift_descriptors(o.grad_dx, o.grad_dy, t(x), t(y), t(sig),
                         t(li), ang.reshape(B, -1), ok.reshape(B, -1))
    return d
timed("pyr+det+orient+desc(oct0)", desc_fn, imgs)
