"""Pallas TPU kernel: dequantize packed planes to a dense fp16/bf16/f32 matrix.

TPU-native re-design of the reference's ``DequantizeAndUnpackWeight248`` /
``DequantizeAndUnpackWeight3567_v2`` CUDA kernels
(``unpack_weight_2_to_7.cu:45-120,220-330``): instead of per-thread word reads
and shared-memory staging for word-crossing bit-widths, the weight arrives as
power-of-two bit-planes (see ``formats.PLANE_DECOMP``) in a slot-structured
layout, and each grid step walks the K-tile in group-sized row chunks — one
static slice + shift + mask per plane per chunk, one FMA against that chunk's
scale row (``w = wq*s - sz``, ``unpack_weight_2_to_7.cu:75``), one contiguous
static-slice store.  No concatenates, no gathers.

The kernel is HBM-bandwidth-bound by design: per (tile_k, tile_n) output tile
it reads exactly ``tile_k * tile_n * bits / 8`` packed bytes (+ a sliver of
scales) and writes ``tile_k * tile_n * itemsize`` bytes.
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


def _kernel(plane_bits, tile_k, gt, cs, paired, *refs):
    n_planes = len(plane_bits)
    plane_refs = refs[:n_planes]
    s_ref, sz_ref, out_ref = refs[n_planes:]
    g_tile = tile_k // gt
    blocks = [r[...] for r in plane_refs]
    # whole-block scale decode (full sublane occupancy; see qgemv_kernel)
    s_all = common.to_f32_scale(s_ref[0])
    sz_all = common.to_f32_scale(sz_ref[0])
    for c in range(tile_k // cs):
        wq = common.extract_chunk(blocks, plane_bits, c, cs, tile_k,
                                  paired=paired)
        gi = (c * cs) // g_tile
        s = s_all[gi][None, :]
        sz = sz_all[gi][None, :]
        w = wq.astype(jnp.float32) * s - sz
        out_ref[c * cs : (c + 1) * cs, :] = w.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tile_n", "interpret")
)
def dequant_kernel(
    qt: QTensor,
    out_dtype=jnp.bfloat16,
    tile_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Dequantize a QTensor to ``(K, N)`` in ``out_dtype`` (padded/stored row order;
    the public op handles act-order un-permutation and K-padding removal)."""
    if interpret is None:
        interpret = common.interpret_default()
    K, N = qt.K, qt.planes[0].shape[-1]
    tk = qt.tile_k
    plane_bits = PLANE_DECOMP[qt.bits]
    # output block (tk, tn) dominates VMEM; keep it ~<=2 MB with double buffering
    itemsize = jnp.dtype(out_dtype).itemsize
    budget = max(128, (2 * 1024 * 1024) // (tk * itemsize) // 128 * 128)
    tn = tile_n or common.pick_tile_n(N, prefer=budget)
    gt = qt.groups_per_tile
    gt_pad = qt.scales.shape[1]
    paired = qt.paired
    cs = common.chunk_plan(plane_bits, tk, tk // gt, paired=paired)

    grid = (K // tk, common.cdiv(N, tn))
    in_specs = [
        pl.BlockSpec((tk // (32 // pb), tn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        for pb in plane_bits
    ]
    s_spec = pl.BlockSpec(
        (1, gt_pad, tn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    in_specs += [s_spec, s_spec]

    packed_bytes = sum(p.size * 4 for p in qt.planes)
    out = pl.pallas_call(
        functools.partial(_kernel, plane_bits, tk, gt, cs, paired),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tk, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N,
            bytes_accessed=packed_bytes
            + qt.scales.size * qt.scales.dtype.itemsize * 2
            + K * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*qt.planes, qt.scales, qt.scale_zeros)
    return out
