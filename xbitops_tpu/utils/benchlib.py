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


def _chained_scalar(step: Callable, iters: int):
    """jit fn: run ``step`` ``iters`` times chained on the carry, reduce to scalar."""

    @jax.jit
    def run(x):
        y = lax.fori_loop(0, iters, lambda i, v: step(v), x)
        return jnp.sum(y.astype(jnp.float32))

    return run


def measure_step(
    step: Callable,
    x0: jax.Array,
    repeats: int = 7,
    target_seconds: float = 0.15,
    max_iters: int = 20000,
) -> float:
    """Seconds per invocation of ``step`` (a carry -> carry function), measured on
    device with constant dispatch overhead differenced out.

    Dispatch round-trips jitter by 10s of ms, so the iteration counts are sized
    adaptively until the high-count run spends >= ``target_seconds`` on the loop
    itself; the min over ``repeats`` rejects contention outliers."""

    def best(run, reps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # pilot: estimate per-iteration cost (overhead-inflated upper bound is fine)
    pilot_iters = 16
    pilot = _chained_scalar(step, pilot_iters)
    float(pilot(x0))  # compile + warm
    est = best(pilot, 3) / pilot_iters
    iters_hi = int(min(max(32, target_seconds / max(est, 1e-9)), max_iters))
    iters_lo = max(1, iters_hi // 5)

    run_lo = _chained_scalar(step, iters_lo)
    run_hi = _chained_scalar(step, iters_hi)
    float(run_lo(x0))
    float(run_hi(x0))
    t_lo, t_hi = best(run_lo, repeats), best(run_hi, repeats)
    return max((t_hi - t_lo) / (iters_hi - iters_lo), 1e-9)


def roofline_gbps(bytes_moved: int, seconds: float) -> float:
    return bytes_moved / seconds / 1e9
