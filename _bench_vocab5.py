"""Round-5 vocabulary-tree benchmark: honest held-out eval + batched
query throughput.

Fixes the two round-4 weaknesses (VERDICT r5 item 2):
  * the recall eval saturated at 1.000 everywhere (noisy self-queries
    can't distinguish probes=4 from exact). Here queries are RE-RENDERED
    images: each query image is a random-homography warp + photometric
    jitter of a database image, re-extracted with the real SIFT
    pipeline, ranked against the full distractor corpus — descriptor
    sets genuinely differ, so assignment quality finally shows.
  * the query path ran one image per dispatch (435-572 ms/img at 1M
    words). query_batch amortizes the assignment matmuls over the whole
    [Q, Kq, D] stack.

Part A (honest recall, default): W=65,536 (the visual_index.h:99-118
default), 1024-image corpus, 128 warped queries, probes sweep
{2, 4, 8, 16, exact} plus spatial verification.
Part B (1M-word speed): reuses the dogfood descriptor corpus
(_bench_dogfood.py) to train the 1024x1024=1,048,576-word tree and
measures batched img/s at probes=8 (reference point:
exe/vocab_tree.cc:74-78, the Flickr100K 1M-word tree).

Usage: python _bench_vocab5.py [A|B|AB]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.apps.undistort import warp_image_homography
from cvt_tpu.features.covdet import extract_sift
from cvt_tpu.index.vocab_he import VocabHEIndex
from cvt_tpu.io.datasets import procedural_images

H, W = 480, 640
N_DB = 512
N_Q = 128
KQ = 512


def _extract(imgs, k=KQ):
    f = jax.jit(lambda im: extract_sift(
        im, max_features=k, first_octave=0, n_orientations=1,
        rootsift=True))
    out = f(jnp.asarray(imgs))
    d = np.asarray(out.descriptors) * 512.0        # uint8 SIFT range
    return (np.clip(np.rint(d), 0, 255).astype(np.float32),
            np.asarray(out.frames), np.asarray(out.valid))


def _random_h(rng):
    """Random query-view homography: a ZOOMED CROP (only 25-60% of the
    source image area remains visible, at 1.3-2x magnification) with
    rotation +-30deg and perspective — hard enough that assignment
    quality shows (the first honest-eval attempt with mild whole-image
    warps saturated recall at 1.0 for every probe setting)."""
    th = rng.uniform(-0.52, 0.52)
    s = rng.uniform(0.5, 0.75)          # target->source: zoom 1.3-2x
    tx, ty = rng.uniform(-60, 60, 2)
    px, py = rng.uniform(-4e-4, 4e-4, 2)
    c, si = np.cos(th), np.sin(th)
    # target -> source convention (warp_image_homography)
    a = np.array([[s * c, -s * si, tx],
                  [s * si, s * c, ty],
                  [px, py, 1.0]], np.float32)
    # recenter so the frame stays mostly in view
    cx, cy = W / 2, H / 2
    t0 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float32)
    t1 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], np.float32)
    return t1 @ a @ t0


def build_part_a():
    import os
    rng = np.random.default_rng(5)
    cache_p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_data", "vocab5_db_mosaic16.npz")
    t0 = time.time()
    # ---- corpus: MOSAICS from a SHARED patch bank --------------------
    # Every image is a 3x4 grid of patches drawn (with replacement)
    # from one SIXTEEN-patch bank: any 2-4 patches visible in a crop
    # query appear, in some arrangement, in MANY database images, so
    # pure bag-of-words scores genuinely collide and only the patch
    # ARRANGEMENT separates them — the regime where assignment quality
    # and spatial verification decide recall. (A 96-patch bank and
    # independent per-image textures both saturated recall at 1.0 for
    # every probe setting.)
    BANK = procedural_images(16, 160, 160, seed=777)

    def make_images(n0, n, seed):
        r = np.random.default_rng(seed)
        pick = r.integers(0, len(BANK), size=(n, 3, 4))
        rows = BANK[pick]                       # [n, 3, 4, 160, 160]
        imgs = rows.transpose(0, 1, 3, 2, 4).reshape(n, 480, 640)
        imgs = np.clip(imgs + r.normal(0, 0.01, imgs.shape), 0, 1)
        return imgs.astype(np.float32)

    BB = 16
    imgs_cache = {}
    for lo in range(0, N_DB, BB):
        imgs_cache[lo] = make_images(lo, BB, 20_000 + lo // BB)
    if os.path.exists(cache_p):
        z = np.load(cache_p)
        db_desc, db_geom, db_valid = z["d"], z["g"], z["v"]
        print("db features loaded from cache", flush=True)
    else:
        db_desc, db_geom, db_valid = [], [], []
        for lo in range(0, N_DB, BB):
            tb = time.time()
            imgs = imgs_cache[lo]
            t_gen = time.time() - tb
            d, fr, v = _extract(imgs)
            db_desc.append(d)
            db_geom.append(fr)
            db_valid.append(v)
            print(f"  db extract {lo}/{N_DB} gen={t_gen:.1f}s "
                  f"tot={time.time()-tb:.1f}s", flush=True)
            imgs_cache[lo] = imgs
        db_desc = np.concatenate(db_desc)
        db_geom = np.concatenate(db_geom)
        db_valid = np.concatenate(db_valid)
        os.makedirs(os.path.dirname(cache_p), exist_ok=True)
        np.savez(cache_p, d=db_desc, g=db_geom, v=db_valid)
    t_db = time.time() - t0
    print(f"db extraction: {t_db:.0f}s "
          f"({db_valid.sum() / N_DB:.0f} feats/img)", flush=True)

    # ---- warped queries ---------------------------------------------
    q_ids = rng.choice(N_DB, size=N_Q, replace=False)
    warp = jax.jit(lambda im, h: warp_image_homography(im, h, H, W))
    q_imgs = []
    BB = 16
    for qi in q_ids:
        im = imgs_cache[qi - qi % BB][qi % BB]
        hm = _random_h(rng)
        wi = np.asarray(warp(im, hm))
        wi = np.clip(wi ** rng.uniform(0.7, 1.4)      # gamma
                     * rng.uniform(0.6, 1.3)
                     + rng.uniform(-0.1, 0.1)
                     + rng.normal(0, 0.05, wi.shape), 0, 1)
        q_imgs.append(wi.astype(np.float32))
    q_desc, q_geom, q_valid = [], [], []
    for lo in range(0, N_Q, 8):
        d, fr, v = _extract(np.stack(q_imgs[lo:lo + 8]))
        q_desc.append(d)
        q_geom.append(fr)
        q_valid.append(v)
    q_desc = np.concatenate(q_desc)
    q_geom = np.concatenate(q_geom)
    q_valid = np.concatenate(q_valid)
    print(f"query extraction done ({q_valid.sum() / N_Q:.0f} feats/img)",
          flush=True)
    return (db_desc, db_geom, db_valid, q_desc, q_geom, q_valid, q_ids)


def part_a():
    (db_desc, db_geom, db_valid, q_desc, q_geom, q_valid,
     q_ids) = build_part_a()
    n_words = 65536
    report = {"corpus": {"n_db": N_DB, "n_q": N_Q, "kq": KQ,
                         "n_words": n_words,
                         "queries": "homography-warped re-renders"}}

    # train on a subsample of db descriptors
    train = db_desc[db_valid].reshape(-1, 128)
    sel = np.random.default_rng(0).choice(len(train),
                                          min(len(train), 400_000),
                                          replace=False)
    idx = VocabHEIndex(n_words=n_words, probes=8)
    t0 = time.time()
    idx.train(jax.random.key(0), train[sel], iters=10)
    t_train = time.time() - t0
    print(f"train W={n_words}: {t_train:.0f}s", flush=True)

    t0 = time.time()
    for i in range(N_DB):
        idx.add_image(db_desc[i], name=str(i), geometries=db_geom[i])
    idx.prepare()
    t_add = time.time() - t0
    print(f"add+prepare {N_DB} images: {t_add:.0f}s", flush=True)
    report["train_s"] = round(t_train, 1)
    report["add_prepare_s"] = round(t_add, 1)

    KQ_USE = 128                      # strongest query features only
    q_desc_u = q_desc[:, :KQ_USE]
    q_valid_u = q_valid[:, :KQ_USE]
    rows = {}
    for probes in (2, 4, 8, 16, 0):
        idx.probes = probes
        idx.query_batch(q_desc_u, topk=5, valid=q_valid_u)  # warm
        t0 = time.time()
        ids, _, names = idx.query_batch(q_desc_u, topk=5,
                                        valid=q_valid_u)
        dt = time.time() - t0
        # retrieved names are db indices as strings
        top1 = np.asarray([int(names[i]) for i in ids[:, 0]])
        top5 = np.asarray([[int(names[i]) for i in row] for row in ids])
        r1 = float(np.mean(top1 == q_ids))
        r5 = float(np.mean([q_ids[i] in top5[i] for i in range(N_Q)]))
        label = "exact" if probes == 0 else f"probes={probes}"
        rows[label] = {"recall_at_1": round(r1, 4),
                       "recall_at_5": round(r5, 4),
                       "img_per_s": round(N_Q / dt, 1),
                       "ms_per_img": round(dt / N_Q * 1e3, 2)}
        print(label, rows[label], flush=True)
    # spatial verification on top of probes=8
    idx.probes = 8
    t0 = time.time()
    ids, _, names = idx.query_batch(q_desc_u, topk=5, valid=q_valid_u,
                                    verify=10,
                                    geometries=q_geom[:, :KQ_USE])
    dt = time.time() - t0
    top1 = np.asarray([int(names[i]) for i in ids[:, 0]])
    rows["probes=8+verify10"] = {
        "recall_at_1": round(float(np.mean(top1 == q_ids)), 4),
        "img_per_s": round(N_Q / dt, 1),
        "ms_per_img": round(dt / N_Q * 1e3, 2)}
    print("verify:", rows["probes=8+verify10"], flush=True)
    report["sweep"] = rows
    print(json.dumps(report))
    return report


def part_b():
    """1M-word batched query speed on the dogfood corpus."""
    from cvt_tpu.io.vecs import read_bvecs
    from _bench_dogfood import BASE_PATH
    base = read_bvecs(BASE_PATH).astype(np.float32)
    n_words = 1024 * 1024
    idx = VocabHEIndex(n_words=n_words, probes=8)
    t0 = time.time()
    idx.train(jax.random.key(1), base[:1_000_000], iters=10)
    t_train = time.time() - t0
    print(f"train W=1M: {t_train:.0f}s", flush=True)
    t0 = time.time()
    for i in range(256):
        idx.add_image(base[i * 512:(i + 1) * 512], name=str(i))
    idx.prepare()
    print(f"add+prepare: {time.time() - t0:.0f}s", flush=True)
    # batched queries: 64 held-out pseudo-images from the corpus tail
    q = base[500_000:500_000 + 64 * 512].reshape(64, 512, 128)
    for probes in (8, 16):
        idx.probes = probes
        t0 = time.time()
        idx.query_batch(q, topk=10)
        dt1 = time.time() - t0
        t0 = time.time()
        idx.query_batch(q, topk=10)
        dt = time.time() - t0          # steady (first call compiles)
        print(json.dumps({
            "w": n_words, "probes": probes, "q_batch": 64,
            "img_per_s_steady": round(64 / dt, 1),
            "ms_per_img_steady": round(dt / 64 * 1e3, 1),
            "first_call_s": round(dt1, 1)}), flush=True)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "A"
    if "A" in stage:
        part_a()
    if "B" in stage:
        part_b()
