"""Visual-word index with Hamming embedding and TF-IDF scoring.

Reference: retrieval/vlindex/src/retrieval/ — `VisualIndex<uint8_t,128,64>`
(visual_index.h:59-183): FLANN hierarchical-kmeans vocabulary (Build,
:624-665), 64-bit Hamming-embedding projection + per-word thresholds
(inverted_index.h:174-183, inverted_file.h:276-292), `Query` scoring with
exp(-h^2/sigma^2) weights x idf^2 and burstiness /sqrt(votes)
(inverted_file.h:295-353, utils.h:52-83), self-similarity normalization
(inverted_index.h:238-288). Papers: Schoenberger et al. ACCV'16,
Arandjelovic-Zisserman ACCV'14 (cited at visual_index.h:51-58).

TPU-native redesign:
  * vocabulary = flat batched k-means (one MXU matmul per Lloyd step)
    instead of FLANN's hierarchical tree — word assignment of a
    descriptor batch is a single [Kq, D] x [D, W] matmul + argmin;
  * the 64-bit signature lives as 2 x uint32 words; Hamming matching is
    XOR + popcount on the VPU;
  * inverted files are PADDED DENSE BUCKETS [W, L] (image id + signature
    + burstiness weight), so a query feature's word lookup is a static
    gather and the whole query batch scores in one vectorized pass with
    a scatter-add into the image-score vector;
  * per-word HE thresholds use the per-word MEAN of projected training
    descriptors (the reference uses the median, inverted_file.h:276-292;
    mean is a deliberate batched approximation — noted for parity).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.ops.kmeans import kmeans, kmeans_assign

HE_BITS = 64
HE_MAX_DIST = 24       # visual_index.h max Hamming distance
HE_SIGMA = 16.0        # utils.h HammingDistWeightFunctor sigma


def _pack_bits(bits: jax.Array) -> jax.Array:
    """bits [..., 64] bool -> [..., 2] uint32."""
    w = jnp.asarray((1 << np.arange(32, dtype=np.uint32)).astype(np.uint32))
    lo = jnp.sum(jnp.where(bits[..., :32], w, jnp.uint32(0)), axis=-1,
                 dtype=jnp.uint32)
    hi = jnp.sum(jnp.where(bits[..., 32:], w, jnp.uint32(0)), axis=-1,
                 dtype=jnp.uint32)
    return jnp.stack([lo, hi], axis=-1)


def _hamming(a: jax.Array, b: jax.Array) -> jax.Array:
    """a [..., 2] u32 vs b [..., 2] u32 (broadcastable) -> popcount."""
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


@partial(jax.jit, static_argnames=("n_images",))
def _score_query(q_words, q_sigs, q_valid, buckets_img, buckets_sig,
                 buckets_burst, idf, n_images):
    """q_words [Kq]; q_sigs [Kq, 2]; buckets_* [W, L, ...].

    Returns unnormalized image scores [n_images]."""
    b_img = buckets_img[q_words]                  # [Kq, L]
    b_sig = buckets_sig[q_words]                  # [Kq, L, 2]
    b_burst = buckets_burst[q_words]              # [Kq, L]
    h = _hamming(q_sigs[:, None, :], b_sig)       # [Kq, L]
    w = jnp.exp(-(h.astype(jnp.float32) ** 2) / (HE_SIGMA ** 2))
    w = jnp.where(h <= HE_MAX_DIST, w, 0.0)
    w = w * (idf[q_words] ** 2)[:, None] * b_burst
    w = jnp.where((b_img >= 0) & q_valid[:, None], w, 0.0)
    flat_img = jnp.where(b_img >= 0, b_img, 0).reshape(-1)
    return jnp.zeros((n_images,), jnp.float32).at[flat_img].add(
        w.reshape(-1))


class VocabHEIndex:
    """Visual-word + Hamming-embedding image retrieval index."""

    def __init__(self, n_words: int = 4096, dim: int = 128,
                 bucket_cap: int | None = None):
        self.n_words = n_words
        self.dim = dim
        self.bucket_cap = bucket_cap
        self.words: jax.Array | None = None       # [W, D]
        self.he_proj: jax.Array | None = None     # [D, 64]
        self.he_thresh: jax.Array | None = None   # [W, 64]
        self._entries: list = []                  # staged (img, word, sig)
        self._names: list = []
        self._prepared = False

    @property
    def n_images(self) -> int:
        return len(self._names)

    # ---------------------------------------------------------------- train
    def train(self, key, descriptors, *, iters: int = 20) -> None:
        """Build the vocabulary + HE projection/thresholds from a training
        descriptor sample [N, D]."""
        x = jnp.asarray(descriptors, jnp.float32)
        res = kmeans(key, x, self.n_words, iters=iters, chunk=65536)
        self.words = res.centroids
        # random orthogonal projection to 64 dims (QR of a Gaussian,
        # inverted_index.h:174-183)
        g = jax.random.normal(jax.random.fold_in(key, 1),
                              (self.dim, self.dim))
        qmat, _ = jnp.linalg.qr(g)
        self.he_proj = qmat[:, :HE_BITS]
        proj = jnp.matmul(x, self.he_proj,
                          preferred_element_type=jnp.float32)   # [N, 64]
        # per-word mean threshold (median in the reference)
        onehot_sums = jnp.zeros((self.n_words, HE_BITS)).at[
            res.assignments].add(proj)
        counts = jnp.zeros((self.n_words,)).at[res.assignments].add(1.0)
        self.he_thresh = onehot_sums / jnp.maximum(counts, 1.0)[:, None]

    # ------------------------------------------------------------------ add
    def _encode(self, descriptors):
        x = jnp.asarray(descriptors, jnp.float32)
        words, _ = kmeans_assign(x, self.words)
        proj = jnp.matmul(x, self.he_proj,
                          preferred_element_type=jnp.float32)
        sigs = _pack_bits(proj > self.he_thresh[words])
        return words, sigs

    def add_image(self, descriptors, name: str | None = None) -> int:
        """Stage one image's descriptors [K, D] (call prepare() after)."""
        img_id = self.n_images
        words, sigs = self._encode(descriptors)
        self._entries.append((img_id, np.asarray(words), np.asarray(sigs)))
        self._names.append(name or f"img_{img_id}")
        self._prepared = False
        return img_id

    # -------------------------------------------------------------- prepare
    def prepare(self) -> None:
        """Lay out padded per-word buckets, idf, burstiness weights, and
        per-image self-similarity norms (visual_index.h:505-508)."""
        w_all = np.concatenate([w for _, w, _ in self._entries])
        s_all = np.concatenate([s for _, _, s in self._entries])
        i_all = np.concatenate([np.full(len(w), i, np.int32)
                                for i, w, _ in self._entries])
        counts = np.bincount(w_all, minlength=self.n_words)
        cap = self.bucket_cap or int(
            min(max(counts.max(), 1),
                max(8, 8 * max(1, len(w_all) // self.n_words))))
        cap = -(-cap // 8) * 8

        # idf over images containing each word
        pairs = np.unique(np.stack([w_all, i_all], 1), axis=0)
        n_img_with_word = np.bincount(pairs[:, 0], minlength=self.n_words)
        idf = np.log(max(self.n_images, 1)
                     / np.maximum(n_img_with_word, 1e-9))
        idf = np.maximum(idf, 0.0).astype(np.float32)

        # burstiness: weight 1/sqrt(#entries of this image in this word)
        order = np.lexsort((i_all, w_all))
        ws, is_ = w_all[order], i_all[order]
        grp = np.concatenate([[True], (ws[1:] != ws[:-1])
                              | (is_[1:] != is_[:-1])])
        gid = np.cumsum(grp) - 1
        gsize = np.bincount(gid)
        burst = (1.0 / np.sqrt(gsize[gid])).astype(np.float32)

        rank = np.zeros_like(ws)
        starts = np.zeros(self.n_words + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        rank = np.arange(len(ws)) - starts[ws]
        keep = rank < cap
        dropped = int((~keep).sum())

        b_img = np.full((self.n_words, cap), -1, np.int32)
        b_sig = np.zeros((self.n_words, cap, 2), np.uint32)
        b_burst = np.zeros((self.n_words, cap), np.float32)
        b_img[ws[keep], rank[keep]] = is_[keep]
        b_sig[ws[keep], rank[keep]] = s_all[order][keep]
        b_burst[ws[keep], rank[keep]] = burst[keep]

        self._b_img = jnp.asarray(b_img)
        self._b_sig = jnp.asarray(b_sig)
        self._b_burst = jnp.asarray(b_burst)
        self._idf = jnp.asarray(idf)
        self._dropped = dropped

        # self-similarity: score of each image against itself, for
        # cosine-style normalization (inverted_index.h:238-288)
        selfs = np.zeros(self.n_images, np.float32)
        for img_id, w, s in self._entries:
            sc = _score_query(jnp.asarray(w), jnp.asarray(s),
                              jnp.ones(len(w), bool), self._b_img,
                              self._b_sig, self._b_burst, self._idf,
                              self.n_images)
            selfs[img_id] = float(sc[img_id])
        self._self_norm = jnp.asarray(np.sqrt(np.maximum(selfs, 1e-12)))
        self._prepared = True

    # --------------------------------------------------------------- query
    def query(self, descriptors, *, topk: int = 10, valid=None):
        """descriptors [Kq, D] -> (names, normalized scores)."""
        if not self._prepared:
            self.prepare()
        words, sigs = self._encode(descriptors)
        kq = words.shape[0]
        if valid is None:
            valid = jnp.ones((kq,), bool)
        scores = _score_query(words, sigs, jnp.asarray(valid), self._b_img,
                              self._b_sig, self._b_burst, self._idf,
                              self.n_images)
        q_self = jnp.sqrt(jnp.maximum(jnp.sum(
            (self._idf[words] ** 2) * valid, dtype=jnp.float32), 1e-12))
        norm = scores / (self._self_norm * q_self)
        k = min(topk, self.n_images)
        v, i = jax.lax.top_k(norm, k)
        i = np.asarray(i)
        return [self._names[j] for j in i], np.asarray(v)

    # -- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        if not self._prepared:
            self.prepare()
        np.savez(path, words=np.asarray(self.words),
                 he_proj=np.asarray(self.he_proj),
                 he_thresh=np.asarray(self.he_thresh),
                 b_img=np.asarray(self._b_img),
                 b_sig=np.asarray(self._b_sig),
                 b_burst=np.asarray(self._b_burst),
                 idf=np.asarray(self._idf),
                 self_norm=np.asarray(self._self_norm),
                 names=np.array(self._names))

    @classmethod
    def load(cls, path: str) -> "VocabHEIndex":
        z = np.load(path, allow_pickle=False)
        idx = cls(n_words=z["words"].shape[0], dim=z["words"].shape[1])
        idx.words = jnp.asarray(z["words"])
        idx.he_proj = jnp.asarray(z["he_proj"])
        idx.he_thresh = jnp.asarray(z["he_thresh"])
        idx._b_img = jnp.asarray(z["b_img"])
        idx._b_sig = jnp.asarray(z["b_sig"])
        idx._b_burst = jnp.asarray(z["b_burst"])
        idx._idf = jnp.asarray(z["idf"])
        idx._self_norm = jnp.asarray(z["self_norm"])
        idx._names = [str(s) for s in z["names"]]
        idx._prepared = True
        return idx
