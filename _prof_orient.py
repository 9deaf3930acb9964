"""Ablation inside the orientation pass: gathers vs post-processing."""
import time
import numpy as np, jax, jax.numpy as jnp
from cvt_tpu.features.scale_space import build_pyramid
from cvt_tpu.features.detect import detect_octave
from cvt_tpu.features import descriptor as DD
from cvt_tpu.io.datasets import procedural_images

B = 8
imgs = jnp.asarray(procedural_images(B, 480, 640, seed=0))

def prep(im):
    pyr = build_pyramid(im, first_octave=-1, with_gradients=True)
    o0 = pyr[0]
    x, y, lf, lev, resp, valid = detect_octave(o0.dog, max_k=8192,
                                               peak_threshold=0.02/3)
    sig = 1.6 * 2.0 ** (lf / 3.0)
    gf = jnp.stack([o0.grad_dx.reshape(B, -1),
                    o0.grad_dy.reshape(B, -1)], -1).reshape(B, -1)
    return gf, x, y, sig, lev, valid

def timed(name, fn):
    f = jax.jit(fn)
    out = f(imgs)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    t0 = time.time()
    s = jnp.float32(0.0)
    for _ in range(3):
        out = f(imgs + s)
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20
    float(s)
    print(f"{name}: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)

timed("prep(base)", prep)

lin = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
gx, gy = np.meshgrid(lin, lin)
grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1))
win_r = 4.5

def gathers_only(im):
    gf, x, y, sig, lev, valid = prep(im)
    h_arr = jnp.asarray([972], jnp.int32)   # oct0 dims (doubled 480+pad?)
    # derive real dims from stack length: F = L*H*W*2 / ... use metadata
    return gf, x  # placeholder

def make_sampler(h, w, l):
    ba = jnp.asarray([0], jnp.int32)
    ha = jnp.asarray([h], jnp.int32)
    wa = jnp.asarray([w], jnp.int32)
    return DD._flat_sampler_pair(ba, ha, wa)

def orient_gather_only(im):
    gf, x, y, sig, lev, valid = prep(im)
    h, w = 960, 1280
    sample = make_sampler(h, w, 6)
    oct_i = jnp.zeros_like(lev)
    def per_kp(gfs, oi, xi, yi, si, li):
        u = si * win_r * grid[:, 0]
        v = si * win_r * grid[:, 1]
        vx, vy = sample(gfs, oi, li, xi + u, yi + v)
        return jnp.sum(vx) + jnp.sum(vy)
    f = jax.vmap(jax.vmap(per_kp, in_axes=(None, 0, 0, 0, 0, 0)),
                 in_axes=(0, 0, 0, 0, 0, 0))
    return f(gf, oct_i, x, y, sig, lev)
timed("prep+gathers only", orient_gather_only)

def orient_post_only(im):
    gf, x, y, sig, lev, valid = prep(im)
    def per_kp(xi, yi, si):
        # fake gradients, same postprocessing as _orientation_peaks
        g1 = xi * grid[:, 0] + si
        g2 = yi * grid[:, 1] + si
        wgt = jnp.exp(-(grid[:, 0]**2 + grid[:, 1]**2))
        return DD._orientation_peaks(g1, g2, wgt, 2, 0.8)
    f = jax.vmap(jax.vmap(per_kp, in_axes=(0, 0, 0)),
                 in_axes=(0, 0, 0))
    return f(x, y, sig)
timed("prep+hist/peaks only", orient_post_only)

def orient_full(im):
    gf, x, y, sig, lev, valid = prep(im)
    ba = jnp.asarray([0], jnp.int32)
    ha = jnp.asarray([960], jnp.int32)
    wa = jnp.asarray([1280], jnp.int32)
    oct_i = jnp.zeros_like(lev)
    return DD.assign_orientations_multi_flat(gf, ba, ha, wa, oct_i, x, y,
                                             sig, lev, valid,
                                             n_orientations=2)
timed("prep+orient full", orient_full)
