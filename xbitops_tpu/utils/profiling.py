"""Observability: profiler traces and decode roofline reports.

The reference's perf tooling is CUDA-event prints + manual Nsight runs
(SURVEY §5 "Tracing/profiling").  Here:

- :func:`trace` wraps ``jax.profiler`` for on-demand traces;
- :func:`decode_roofline` decomposes a decode step's HBM traffic (packed
  weights, dense weights, KV cache read+write, embeddings) and reports the
  measured step time against the bandwidth bound — the check that the fused
  path stays memory-bound, per BASELINE.json.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

import jax

from xbitops_tpu.formats import QTensor


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"):`` — view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class DecodeRoofline:
    weight_bytes: int  # packed + dense weight stream per step
    cache_bytes: int  # KV read + write per step at current lengths
    total_bytes: int
    hbm_gbps_peak: float
    bound_ms: float  # total_bytes / peak
    measured_ms: Optional[float] = None

    @property
    def efficiency(self) -> Optional[float]:
        if self.measured_ms is None:
            return None
        return self.bound_ms / self.measured_ms

    def __str__(self) -> str:
        s = (
            f"weights {self.weight_bytes/1e9:.2f} GB + cache "
            f"{self.cache_bytes/1e9:.3f} GB per step -> bound "
            f"{self.bound_ms:.2f} ms @ {self.hbm_gbps_peak:.0f} GB/s"
        )
        if self.measured_ms is not None:
            s += f"; measured {self.measured_ms:.2f} ms ({self.efficiency:.0%} of roofline)"
        return s


def model_weight_bytes(params) -> int:
    """Per-step HBM weight traffic: packed QTensor bytes + dense weight bytes
    (embedding gathers excluded — decode reads only B rows)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        params, is_leaf=lambda x: isinstance(x, QTensor)
    ):
        if isinstance(leaf, QTensor):
            total += leaf.bytes_packed()
        elif any(getattr(k, "key", None) == "embed" for k in path):
            continue  # gather, not a full read
        elif hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total


def kv_step_bytes(cfg, batch: int, mean_len: int, dtype_bytes: int = 2) -> int:
    """KV bytes touched per decode step: read all cached positions + write one."""
    per_pos = cfg.num_kv_heads * cfg.head_dim * dtype_bytes * 2  # k and v
    return cfg.num_layers * batch * (mean_len + 1) * per_pos


def decode_roofline(
    params,
    cfg,
    batch: int,
    mean_len: int = 0,
    hbm_gbps_peak: float = 819.0,  # TPU v5e
    measured_ms: Optional[float] = None,
) -> DecodeRoofline:
    wb = model_weight_bytes(params)
    cb = kv_step_bytes(cfg, batch, mean_len)
    total = wb + cb
    return DecodeRoofline(
        weight_bytes=wb,
        cache_bytes=cb,
        total_bytes=total,
        hbm_gbps_peak=hbm_gbps_peak,
        bound_ms=total / hbm_gbps_peak / 1e6,
        measured_ms=measured_ms,
    )
