"""Benchmark harness utilities.

Timing on the remote-tunnel TPU backend is subtle:
- ``block_until_ready`` does not reliably block (dispatch is acked early), so a
  **scalar readback** is the only sync point;
- per-dispatch round-trip latency is large and variable (0.1–30 ms), so the
  measured function must loop ``iters`` times **inside one jit dispatch** with a
  data dependency chaining iterations (or XLA hoists the loop body);
- constant overhead is eliminated by timing at two iteration counts and using
  ``(t_hi - t_lo) / (iters_hi - iters_lo)``.

This replaces the role of the reference's CUDA-event timing loops
(``gemv_w4a16.cu:353-359``) under a very different execution model.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _chained_scalar(step: Callable):
    """jit fn (compiled once): run ``step`` ``n`` times chained on the carry
    (dynamic trip count — no recompile per iteration count), reduce to scalar."""

    @jax.jit
    def run(x, n):
        y = lax.fori_loop(0, n, lambda i, v: step(v), x)
        # pytree carries welcome; the reduce runs once per CALL, so its cost
        # differences out of the two-count slope
        return sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(y)
        )

    return run


def measure_step(
    step: Callable,
    x0: jax.Array,
    repeats: int = 5,
    target_seconds: float = 0.3,
    max_iters: int = 4_000_000,
) -> float:
    """Seconds per invocation of ``step`` (a carry -> carry function), measured on
    device with constant dispatch overhead differenced out.

    Dispatch round-trips jitter by 10s of ms, so the iteration count grows
    geometrically until the loop body dominates (>= ``target_seconds``), then the
    per-iteration slope is taken between n and 2n; min over ``repeats`` rejects
    contention outliers."""
    run = _chained_scalar(step)

    def best(n, reps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    float(run(x0, 4))  # compile + warm
    n = 64
    t_a = best(n, 2)
    while t_a < target_seconds and n < max_iters:
        n *= 4
        t_a = best(n, 2)
    t_a = min(t_a, best(n, max(1, repeats - 2)))
    t_b = best(2 * n, repeats)
    return max((t_b - t_a) / n, 1e-12)


def roofline_gbps(bytes_moved: int, seconds: float) -> float:
    return bytes_moved / seconds / 1e9
