"""Multi-host (pod-slice) execution support.

The reference is strictly single-GPU (SURVEY §2: no collectives, no process
groups).  On TPU pods the recipe is: one JAX process per host, a global mesh
whose **model (TP) axis stays inside each host's ICI domain** and whose data
axis spans hosts over DCN — per-token TP collectives (psum / reduce-scatter
from ``parallel/tp.py``) then ride ICI only, and nothing latency-critical
crosses DCN.

Collective/compute overlap: XLA's latency-hiding scheduler overlaps the
row-parallel psum of layer *i* with layer *i+1*'s dequant automatically when
enabled — set the flags below (or call :func:`overlap_flags`) before process
start; verify with a profiler trace (utils/profiling.trace), not assumptions.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

# Flags that enable async collectives + latency-hiding scheduling on TPU.
OVERLAP_XLA_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
    "--xla_tpu_overlap_compute_collective_tc=true "
    "--xla_enable_async_all_gather=true "
)


def overlap_flags() -> str:
    """XLA_FLAGS value enabling collective/compute overlap (prepend to env)."""
    return OVERLAP_XLA_FLAGS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Start the JAX distributed runtime (one call per host, before first use
    of jax.devices()).  On Cloud TPU the arguments auto-detect from metadata;
    pass them explicitly elsewhere."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(
    tp: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Global (data, model) mesh over every device in the slice.

    ``tp`` defaults to the per-host device count — the largest TP degree whose
    collectives never leave a host's ICI domain.  Data parallelism takes the
    remaining factor (across hosts over DCN).
    """
    n_total = jax.device_count()
    n_local = jax.local_device_count()
    tp = tp or n_local
    if n_total % tp:
        raise ValueError(f"tp={tp} must divide device count {n_total}")
    dp = n_total // tp
    if jax.process_count() > 1:
        # hybrid mesh: inner axis over ICI, outer over DCN
        dmesh = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // jax.process_count() if dp >= jax.process_count() else 1, tp),
            dcn_mesh_shape=(min(dp, jax.process_count()), 1),
        )
    else:
        dmesh = mesh_utils.create_device_mesh((dp, tp))
    return Mesh(np.asarray(dmesh).reshape(dp, tp), tuple(axis_names))
