"""Exact flat index — the `brute_force_search` equivalent.

The reference allocates a flat arena, memcpys every vector in, and scans
it per query with an AVX inner-product kernel plus a std::priority_queue
(brute_force_search/src/brutoforce.hpp:18-93). Here the database is a
single device array; `search` is one jitted chunked matmul + top-k scan
(cvt_tpu.ops.topk.chunked_topk_scan). Doubles as the ground-truth
generator for all recall harnesses, like the reference's gt.txt writer
(src/brute_force.cpp:86-108).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cvt_tpu.ops.topk import chunked_topk_scan


class FlatIndex:
    """Exact top-k search over an uncompressed float database.

    metric: 'l2' (squared L2) or 'ip' (inner product; returned distances
    are negated IPs so smaller = closer, matching hnswlib's convention).
    """

    def __init__(self, dim: int, metric: str = "l2", chunk: int = 65536):
        if metric not in ("l2", "ip"):
            raise ValueError(f"unknown metric {metric!r}")
        self.dim = dim
        self.metric = metric
        self.chunk = chunk
        self._db: jax.Array | None = None

    @property
    def ntotal(self) -> int:
        return 0 if self._db is None else self._db.shape[0]

    def add(self, x) -> None:
        """Append vectors [n, dim] to the database."""
        x = jnp.asarray(x, jnp.float32)
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"expected [n, {self.dim}], got {x.shape}")
        self._db = x if self._db is None else jnp.concatenate(
            [self._db, x], axis=0)

    def search(self, q, k: int):
        """q: [B, dim] -> (dists [B, k] f32, ids [B, k] i32)."""
        if self._db is None:
            raise RuntimeError("empty index")
        q = jnp.asarray(q, jnp.float32)
        k = min(k, self.ntotal)
        return chunked_topk_scan(q, self._db, k, self.metric,
                                 min(self.chunk, self._db.shape[0]))

    # -- persistence (numpy .npz stands in for cvt's ad-hoc binary dumps,
    #    brutoforce.hpp:95-134) --------------------------------------------
    def save(self, path: str) -> None:
        np.savez(path, db=np.asarray(self._db), metric=self.metric,
                 dim=self.dim)

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        z = np.load(path, allow_pickle=False)
        idx = cls(int(z["dim"]), str(z["metric"]))
        idx.add(z["db"])
        return idx
