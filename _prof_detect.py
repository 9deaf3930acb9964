"""Sub-phase profile of detection at B=8."""
import time
import numpy as np, jax, jax.numpy as jnp
from cvt_tpu.features.scale_space import build_pyramid
from cvt_tpu.features import detect as D
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

timed("pyramid dog only", lambda im: [o.dog for o in build_pyramid(
    im, first_octave=-1, with_gradients=False)])
timed("pyramid with grads", lambda im: [
    (o.dog, o.grad_dx, o.grad_dy)
    for o in build_pyramid(im, first_octave=-1, with_gradients=True)])

def stencil_only(im):
    outs = []
    for o in build_pyramid(im, first_octave=-1, with_gradients=False):
        dog = o.dog
        is_max = (dog >= D._window_max(dog)) & (dog > 0.02/3)
        is_min = (dog <= D._window_min(dog)) & (dog < -0.02/3)
        outs.append(is_max | is_min)
    return outs
timed("pyr+stencil", stencil_only)

def topk_only(im):
    outs = []
    for o in build_pyramid(im, first_octave=-1, with_gradients=False):
        dog = o.dog
        b, l, h, w = dog.shape
        score = jnp.abs(dog).reshape(b, -1)
        k = min(8192, score.shape[1])
        outs.append(jax.lax.top_k(score, k)[0])
    return outs
timed("pyr+topk(raw)", topk_only)

def full_detect(im):
    outs = []
    for o in build_pyramid(im, first_octave=-1, with_gradients=False):
        k = min(8192, o.dog.shape[1]*o.dog.shape[2]*o.dog.shape[3])
        outs.append(D.detect_octave(o.dog, max_k=k,
                                    peak_threshold=0.02/3)[0])
    return outs
timed("pyr+full detect", full_detect)
