import time
import numpy as np, jax
from cvt_tpu.features.covdet import extract_sift
from cvt_tpu.io.datasets import procedural_images
from cvt_tpu.utils.profile import chained_time

B = 8
imgs = procedural_images(B, 480, 640, seed=0)
f = jax.jit(lambda im: extract_sift(im, max_features=8192, first_octave=-1,
                                    n_orientations=2, rootsift=True))
t0 = time.time()
out = f(imgs)
jax.block_until_ready(out.descriptors)
print("compile+run1: %.1fs" % (time.time() - t0), flush=True)
print("n_valid:", np.asarray(out.n_valid), flush=True)

ITERS = 4
stack = np.stack([procedural_images(B, 480, 640, seed=i) for i in range(ITERS)])
sec = chained_time(lambda im: extract_sift(
    im, max_features=8192, first_octave=-1, n_orientations=2,
    rootsift=True).descriptors, stack)
print("chained: %.3f s/batch = %.1f img/s" % (sec, B / sec), flush=True)
