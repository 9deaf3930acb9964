"""Profiling observability (SURVEY §5.1 TPU-native replacement).

The reference instruments with ad-hoc wall-clock prints
(opq/train_codebook/train_PQ_codebook.cpp:161-169, util/timer.h). Here:

  * `trace(logdir)` — context manager over jax.profiler.trace, producing
    a TensorBoard-loadable device trace of every XLA/Pallas kernel.
  * `chained_time(fn, stack)` — device-true steady-state timing on
    backends whose `block_until_ready` is unreliable (remote-dispatch device links):
    runs `fn` over a stacked batch axis inside ONE jitted lax.scan (so
    iterations execute back-to-back on device) and does a single host
    fetch; returns seconds per iteration.
  * `roofline(flops, bytes_accessed, seconds)` — achieved TFLOP/s and
    HBM GB/s for a measured kernel invocation.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace context (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_time(fn, stack, *, consts=(), reduce_out=None,
                 warmup: bool = True,
                 launch_overhead_s: float = 0.0) -> float:
    """Seconds per iteration of `fn(batch, *consts)` with device-chained
    execution.

    fn: batch -> pytree of arrays. stack: [ITERS, ...] array scanned over
    its leading axis. Each scan step folds a scalar of fn's output into a
    carry, and only the carry is fetched — one host round-trip total.

    Pass LARGE arrays via `consts`, not via fn's closure: closed-over
    arrays embed as HLO constants, and a remote-dispatch backend's remote-compile
    endpoint rejects oversized request bodies (HTTP 413) once those
    constants reach a few hundred MB.
    """
    import jax
    import jax.numpy as jnp

    iters = stack.shape[0]

    @jax.jit
    def run(xs, *cs):
        def body(c, x):
            out = fn(x, *cs)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    if warmup:
        np.asarray(run(stack, *consts)) + 0
    t0 = time.time()
    np.asarray(run(stack, *consts)) + 0
    return max(time.time() - t0 - launch_overhead_s, 1e-9) / iters


@dataclass
class Roofline:
    tflops: float
    hbm_gbps: float

    def __str__(self) -> str:
        return f"{self.tflops:.1f} TFLOP/s, {self.hbm_gbps:.0f} GB/s"


def roofline(flops: float, bytes_accessed: float, seconds: float) -> Roofline:
    return Roofline(tflops=flops / seconds / 1e12,
                    hbm_gbps=bytes_accessed / seconds / 1e9)


def measure_launch_overhead() -> float:
    """Per-dispatch host->device round-trip overhead in seconds, measured
    with a trivial jitted op (on remote-dispatch backends this is ~30 ms; on local
    hardware it is microseconds). Subtract from one-shot timings."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(f(x)) + 0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        x = f(x)
        np.asarray(x) + 0
    return (time.time() - t0) / reps
