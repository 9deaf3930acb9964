"""Batched Lloyd's k-means, the TPU-native replacement for yael kmeans.

The reference trains its coarse (K=8192) and product (K=256 x M subspaces)
codebooks with yael's multithreaded CPU kmeans
(opq/train_codebook/train_PQ_codebook.cpp:150-244, 64 OpenMP threads) and
FLANN hierarchical k-means (retrieval/vlindex/src/retrieval/visual_index.h:624-665).
Here every Lloyd iteration is two MXU matmuls:
  assign:  argmin_k ||x - c_k||^2 via the  x.c  expansion      [N,D]x[D,K]
  update:  new_c = onehot(assign)^T @ x / counts               [K,N]x[N,D]
Empty-cluster repair mirrors the reference's check at
train_PQ_codebook.cpp:173-179: an empty centroid is re-seeded from the
point currently farthest from its assigned centroid.

PQ trains M independent codebooks by `jax.vmap`ing this whole routine over
the subspace axis — the reference's `#pragma omp parallel for` over m
(train_PQ_codebook.cpp:208) becomes one vectorized program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centroids: jax.Array   # [K, D]
    assignments: jax.Array  # [N] int32
    objective: jax.Array   # scalar: mean squared distance


def kmeans_assign(x: jax.Array, centroids: jax.Array,
                  chunk: int | None = None):
    """Nearest-centroid assignment. x: [N, D], centroids: [K, D].

    Returns (assign [N] int32, dist [N] f32 squared L2 to the winner).
    `chunk` bounds the [chunk, K] intermediate for large N*K.
    """
    c_sq = jnp.sum(jnp.square(centroids), axis=-1)               # [K]

    def _one(xc):
        d = (jnp.sum(jnp.square(xc), axis=-1, keepdims=True)
             - 2.0 * jnp.matmul(xc, centroids.T,
                                preferred_element_type=jnp.float32)
             + c_sq[None, :])
        a = jnp.argmin(d, axis=-1).astype(jnp.int32)
        best = jnp.take_along_axis(d, a[:, None], axis=-1)[:, 0]
        return a, jnp.maximum(best, 0.0)

    n = x.shape[0]
    if chunk is None or n <= chunk:
        return _one(x)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    a, d = jax.lax.map(_one, xp.reshape(n_chunks, chunk, x.shape[1]))
    return a.reshape(-1)[:n], d.reshape(-1)[:n]


def _update(x, assign, k):
    """Centroid update via one-hot matmul (MXU). Returns (sums, counts)."""
    onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)            # [N, K]
    sums = jnp.matmul(onehot.T, x, preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0, dtype=jnp.float32)          # [K]
    return sums, counts


def _repair_empty(centroids, counts, x, far_dist):
    """Re-seed empty centroids from the points farthest from their centroid."""
    k = centroids.shape[0]
    empty = counts < 0.5                                         # [K] bool
    # Rank points by distance-to-own-centroid; the j-th empty cluster takes
    # the j-th farthest point. rank[j] in [0, K): each empty centroid gets a
    # distinct donor.
    order = jnp.cumsum(empty.astype(jnp.int32)) - 1              # [K]
    _, far_idx = jax.lax.top_k(far_dist, k)                      # [K] point ids
    donors = x[far_idx[jnp.clip(order, 0, k - 1)]]               # [K, D]
    return jnp.where(empty[:, None], donors, centroids)


@partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def _lloyd(x, init_centroids, k, iters, chunk):
    def body(c, _):
        assign, dist = kmeans_assign(x, c, chunk=chunk)
        sums, counts = _update(x, assign, k)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        new_c = _repair_empty(new_c, counts, x, dist)
        return new_c, jnp.mean(dist)

    c, objs = jax.lax.scan(body, init_centroids, None, length=iters)
    assign, dist = kmeans_assign(x, c, chunk=chunk)
    return c, assign, jnp.mean(dist)


def _init_random(key, x, k):
    n = x.shape[0]
    idx = jax.random.permutation(key, n)[:k]
    return x[idx]


def _init_kmeanspp(key, x, k):
    """k-means++ seeding (sequential over k; use for small k)."""
    n = x.shape[0]
    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, n)]

    def body(carry, key_i):
        cents, d2 = carry
        i, key_i = key_i
        p = d2 / jnp.maximum(jnp.sum(d2), 1e-30)
        nxt = x[jax.random.choice(key_i, n, p=p)]
        cents = jax.lax.dynamic_update_index_in_dim(cents, nxt, i, 0)
        d2 = jnp.minimum(d2, jnp.sum(jnp.square(x - nxt[None, :]), axis=-1))
        return (cents, d2), None

    cents = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    d2 = jnp.sum(jnp.square(x - first[None, :]), axis=-1)
    keys = jax.random.split(key, k - 1)
    (cents, _), _ = jax.lax.scan(
        body, (cents, d2), (jnp.arange(1, k), keys))
    return cents


def kmeans(key: jax.Array, x: jax.Array, k: int, *, iters: int = 25,
           init: str = "random", chunk: int | None = 262144) -> KMeansResult:
    """Full k-means: seed + `iters` Lloyd steps + final assignment.

    x: [N, D] float. Deterministic given `key` (the reference seeds its
    RNG for reproducible tests, vlindex/src/util/random.h SetPRNGSeed).
    """
    x = jnp.asarray(x, jnp.float32)
    if init == "random":
        c0 = _init_random(key, x, k)
    elif init == "kmeans++":
        c0 = _init_kmeanspp(key, x, k)
    else:
        raise ValueError(f"unknown init: {init!r}")
    c, assign, obj = _lloyd(x, c0, k, iters, chunk)
    return KMeansResult(c, assign, obj)
