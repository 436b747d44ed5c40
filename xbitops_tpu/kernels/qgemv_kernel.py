"""Pallas TPU kernel: fused dequantize + matmul (A16Wx GEMV/GEMM).

TPU-native re-design of the reference's fused ``gemv`` CUDA kernel
(``gemv_w4a16_pt.cu:36-147``).  The reference decodes nibbles per-thread and
accumulates with ``__hfma2`` + a shared-memory block transpose; here each grid step
unpacks a ``(tile_k, tile_n)`` weight tile from bit-planes in VMEM (vectorized
shift/mask), applies group scales as one broadcast FMA, and feeds the MXU with a
``(tile_m, tile_k) @ (tile_k, tile_n)`` dot, accumulating in an f32 VMEM scratch
across the K grid dimension.  Unlike the reference — which supports only
bits=4 / group_size=128 (``gemv_w4a16_pt.cu:152-155``) — every bit-width 1..8 and
any group size ≥ 16 runs through this same kernel.

Decode (M=1..64) is HBM-bandwidth-bound on the packed weight stream; Pallas's
automatic grid pipelining double-buffers the plane blocks so the MXU/VPU work
overlaps the HBM reads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xbitops_tpu.formats import PLANE_DECOMP, QTensor
from xbitops_tpu.kernels import common


def _kernel(plane_bits, tile_k, gt, compute_dtype, *refs):
    n_planes = len(plane_bits)
    a_ref = refs[0]
    plane_refs = refs[1 : 1 + n_planes]
    s_ref, sz_ref, out_ref, acc_ref = refs[1 + n_planes :]

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = common.dequant_tile(
        [r[...] for r in plane_refs], plane_bits, s_ref[0], sz_ref[0], tile_k, gt
    ).astype(compute_dtype)
    a = a_ref[...].astype(compute_dtype)
    acc_ref[...] += jnp.dot(a, w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "tile_m", "tile_n", "precise", "interpret"),
)
def qmatmul_kernel(
    a: jax.Array,
    qt: QTensor,
    out_dtype=jnp.bfloat16,
    tile_m: Optional[int] = None,
    tile_n: Optional[int] = None,
    precise: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``a (M, K) @ dequant(qt) (K, N) -> (M, N)``, fused.

    ``a`` must already be padded to ``qt.K`` columns and to a sublane-friendly M
    (the public op in ``ops/qmatmul.py`` does both).  ``precise=True`` keeps the
    dequantized tile in f32 for the MXU (mirrors the reference's f32-accumulation
    variant, ``gemv_w4a16_c32.cu``); the default bf16 path is faster and still
    accumulates the dot in f32.
    """
    if interpret is None:
        interpret = common.interpret_default()
    M, K = a.shape
    N = qt.planes[0].shape[-1]
    assert K == qt.K, f"activation K={K} != packed K={qt.K}"
    tk, g = qt.tile_k, qt.group_size
    plane_bits = PLANE_DECOMP[qt.bits]
    tm = tile_m or min(M, 256)
    tn = tile_n or common.pick_tile_n(N)
    assert M % tm == 0 and N % tn == 0, (M, tm, N, tn)
    compute_dtype = jnp.float32 if precise else jnp.bfloat16

    grid = (M // tm, N // tn, K // tk)
    in_specs = [pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)]
    in_specs += [
        pl.BlockSpec(
            (tk // (32 // pb), tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
        )
        for pb in plane_bits
    ]
    gt = qt.groups_per_tile
    gt_pad = qt.scales.shape[1]
    s_spec = pl.BlockSpec(
        (1, gt_pad, tn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM
    )
    in_specs += [s_spec, s_spec]

    packed_bytes = sum(p.size * 4 for p in qt.planes)
    out = pl.pallas_call(
        functools.partial(_kernel, plane_bits, tk, gt, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=packed_bytes
            + qt.scales.size * qt.scales.dtype.itemsize * 2
            + M * K * a.dtype.itemsize
            + M * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, *qt.planes, qt.scales, qt.scale_zeros)
    return out
