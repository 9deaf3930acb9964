"""Wall-clock timing spans, replacing the reference's StopW / gettimeofday
prints (hnsw_sifts_retrieval/makeIdx.cpp:82-98, train_PQ_codebook.cpp:161-169)
with a context manager that blocks on device results (block_until_ready) so
async dispatch does not fake the numbers."""

from __future__ import annotations

import time

import jax


class Timer:
    def __init__(self, name: str = "", sync: bool = True, verbose: bool = False):
        self.name = name
        self.sync = sync
        self.verbose = verbose
        self.elapsed = 0.0
        self._result = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def observe(self, result):
        """Register device values to block on before stopping the clock."""
        self._result = result
        return result

    def __exit__(self, *exc):
        if self.sync and self._result is not None:
            jax.block_until_ready(self._result)
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[timer] {self.name}: {self.elapsed * 1e3:.2f} ms")
        return False
