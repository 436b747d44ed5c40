"""Device-mesh construction helpers.

The reference has no multi-device support at all (SURVEY §2: no collectives, no
process groups — per-tensor ``cudaSetDevice`` only, ``dq_torch_ops.cc:32,58``).
Here the mesh is a first-class object: packed weights shard over it and XLA
collectives over ICI/DCN replace what NCCL would do in a CUDA port.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default shape puts every device on the ``model`` (tensor-parallel) axis —
    the right default for single-host decode, where weights are TP-sharded and
    batch fits on every chip.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    devices = devices[:need]  # a sub-mesh over the first `need` devices is fine
    try:
        dmesh = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):
        dmesh = np.asarray(devices).reshape(shape)
    return Mesh(dmesh, tuple(axis_names))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))


def local_size(mesh: Mesh, axis: Optional[str]) -> int:
    return mesh.shape[axis] if axis is not None else 1
