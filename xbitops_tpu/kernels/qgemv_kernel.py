"""Pallas TPU kernel: fused dequantize + matmul (A16Wx GEMV/GEMM).

TPU-native re-design of the reference's fused ``gemv`` CUDA kernel
(``gemv_w4a16_pt.cu:36-147``).  The reference decodes nibbles per-thread and
accumulates with ``__hfma2`` + a shared-memory block transpose; here each grid
step processes one ``(tile_k, tile_n)`` packed block in group-sized row chunks:

- chunk extraction is one static slice + shift + mask per bit-plane (the plane
  pack layout guarantees a chunk never crosses a word or a slot — no
  concatenate, no shuffle, ~3 VPU ops per weight);
- the raw integer chunk goes straight to the MXU in the compute dtype
  (integers <= 255 are exact in bf16) and the **group scale is applied to the
  accumulated dot output**, not per-element:
      out = sum_g s_g * (a_g @ wq_g) - (sum_k in g a_k) * sz_g
  which is algebraically the reference's ``sum a*(wq*s - sz)``
  (``unpack_weight_2_to_7.cu:75``) with strictly fewer roundings (f32 all the
  way after the dot).

Unlike the reference — which supports only bits=4 / group_size=128
(``gemv_w4a16_pt.cu:152-155``) — every bit-width 1..8 and any group size >= 16
runs through this same kernel.

**Stacked (per-layer) mode**: with ``layer_idx`` given, the packed arrays
carry a leading layer axis and the kernel indexes it through a scalar-prefetch
argument feeding the BlockSpec index maps — the weight slice is DMA'd straight
from the stacked HBM buffer.  This is what makes ``lax.scan`` over transformer
layers free: XLA cannot fuse a scan's dynamic-slice into a custom call, so
without this every layer's weights would be copied once per step (measured
+55% step time at 7B).

Decode (M=1..64) is HBM-bandwidth-bound on the packed weight stream; Pallas's
automatic grid pipelining double-buffers the plane blocks so the MXU/VPU work
overlaps the HBM reads.  Measured on v5e: ~604 GB/s packed-stream bandwidth at
4-bit (VPU-bound), ~711 GB/s at 8-bit (HBM-bound).
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


def _kernel(plane_bits, tile_k, gt, cs, compute_dtype, stacked, paired, *refs):
    if stacked:
        refs = refs[1:]  # drop the scalar-prefetch layer-index ref
    n_planes = len(plane_bits)
    a_ref = refs[0]
    plane_refs = refs[1 : 1 + n_planes]
    s_ref, sz_ref, out_ref, acc_ref = refs[1 + n_planes :]

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g_tile = tile_k // gt  # rows per scale row within this tile
    blocks = [(r[0] if stacked else r[...]) for r in plane_refs]
    a = a_ref[...]
    # Weight chunks convert int32 -> compute dtype (bf16 fast path: exact for
    # our <= 8-significant-bit values).  Measured dead end: converting to f32
    # and letting the MXU truncate ("one VPU op instead of two") makes the
    # whole kernel ~2-4x SLOWER on v5e — f32 MXU operands don't run at bf16
    # rate even at default precision.
    w_dtype = compute_dtype

    # decode the tile's WHOLE scale blocks once — fp16-bit decode on a
    # (gt_pad, tn) block keeps full sublane occupancy; per-(1, tn)-row
    # decodes waste 7/8 of the VPU (measured: -4% whole-kernel)
    s_all = common.to_f32_scale(s_ref[0, 0] if stacked else s_ref[0])
    sz_all = common.to_f32_scale(sz_ref[0, 0] if stacked else sz_ref[0])

    def s_row(blk, gi):
        return blk[gi][None, :]

    # TPU MXU evaluates f32 dots at bf16 precision unless told otherwise — the
    # precise path must demand true f32 (reference f32-accum variant,
    # gemv_w4a16_c32.cu); bf16 inputs are native-rate either way.
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None

    total = jnp.zeros_like(acc_ref)
    for c in range(tile_k // cs):
        a_c = a[:, c * cs : (c + 1) * cs]
        a_cd = a_c.astype(w_dtype)
        # Per-plane dots combined linearly on the OUTPUT (wq = sum_p
        # vals_p << off_p, so a@wq = sum_p 2^off a@v_p) — skips the per-value
        # shift-and-or recombination on the VPU.  The 4-bit plane (alone at
        # bits=4; first plane of 5/6/7) uses the PAIRED magic-bitcast decode:
        # 2 VPU ops per weight PAIR, zero int->bf16 converts; its +128 bias
        # folds into the zero term below.  Slot-layout planes extract
        # mask-only at their packed bit offset with the 2^-(pb*j) slot factor
        # (exact) folded into the same output combination.
        biased = False
        d = None
        shift = 0
        for pi, (blk, pb) in enumerate(zip(blocks, plane_bits)):
            if paired and pi == 0:
                if compute_dtype == jnp.bfloat16:
                    wv = common.extract_paired_chunk_bf16(blk, c, cs, tile_k)
                    biased = True
                else:
                    # precise path keeps exact bias-free values (3e-4 gate)
                    wv = common.extract_paired_chunk_int(
                        blk, c, cs, tile_k).astype(w_dtype)
                dp = jnp.dot(
                    a_cd, wv,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                f = 1.0
            else:
                vals, inv = common.extract_plane_chunk_scaled(
                    blk, pb, c, cs, tile_k)
                dp = jnp.dot(
                    a_cd, vals.astype(w_dtype),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                f = float(1 << shift) * inv
            dp = dp if f == 1.0 else f * dp
            d = dp if d is None else d + dp
            shift += pb
        gi = (c * cs) // g_tile
        # out += s_g * (a_g @ wq_g) - sum(a_g) * sz_g, the zero term in true
        # f32 on the VPU (chunk sums grow ~sqrt(g); bf16 rounding here would
        # be the dominant error)
        asum_c = jnp.sum(a_c.astype(jnp.float32), axis=1, keepdims=True)
        sr = s_row(s_all, gi)
        szr = s_row(sz_all, gi)
        if biased:
            szr = szr + common.PAIRED_BIAS * sr
        total = total + d * sr - asum_c * szr
    acc_ref[...] += total

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _kernel_a8(plane_bits, tile_k, gt, cs, stacked, paired, *refs):
    """Integer-activation variant (W4A8-style): int8 activations x int weight
    chunks on the MXU's s8xs8->s32 path (2x the bf16 MAC rate on v5e), group
    scales applied to the integer dot outputs in f32.

    The caller quantizes activations per row (``a ~= a_scale * aq``) and
    applies ``a_scale`` to this kernel's f32 output, so everything in here is
    exact integer arithmetic until the per-group rescale:
        out = sum_g s_g * (aq_g @ wq_g) - (sum aq_g) * sz_g
    The per-group VPU work is what decides whether the int8 MXU rate pays
    (measured round 2: ~1.0x with a 4-lane-op rescale per output per group),
    so both per-group terms are restructured off the VPU hot path (round 3):

    - the zero term is ONE small MXU dot per K-tile: group sums
      ``asum (tm, gt) = a @ group_onehot`` (s8 MXU dot, exact) hit the
      ``sz`` rows as ``asum @ szb`` — per-group VPU cost ZERO;
    - the scale term keeps the integer partials in s32 through the plane
      combination (shifts, not f32 muls) AND across every chunk of a group
      (exact: |Σ a·w| ≤ 127·255·g < 2^31 for g ≤ 66k), folding with a single
      convert+multiply+add per GROUP (not per chunk) into the f32 accumulator
      — the per-(M,N)-element VPU work is 3 ops per group, the minimum this
      decomposition admits (measured: per-chunk folding cost 0.64x vs bf16;
      per-group recovers it, and one-group-per-tile layouts approach the
      per-channel fast path).

    An 8-bit plane's values (0..255) don't fit s8: they are offset by -128
    before the dot and the exact ``128 * asum`` correction folds into the
    zero-term dot (``szb - 128 s``), still costing nothing per group.

    No reference counterpart (the reference is fp16-activation only); this is
    the BASELINE.md north-star prefill path, where matmuls are MXU-bound and
    the int8 rate pays.
    """
    if stacked:
        refs = refs[1:]
    n_planes = len(plane_bits)
    a_ref = refs[0]
    plane_refs = refs[1 : 1 + n_planes]
    s_ref, sz_ref, out_ref, acc_ref = refs[1 + n_planes :]

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g_tile = tile_k // gt
    blocks = [(r[0] if stacked else r[...]) for r in plane_refs]
    a = a_ref[...]  # int8 (tm, tile_k)

    def s_blk(ref):
        # all (padded) scale rows of this K-tile: (gt_pad, tn) f32; padded
        # rows are harmless — their asum columns are zero by construction
        return common.to_f32_scale(ref[0, 0] if stacked else ref[0])

    s_all = s_blk(s_ref)  # whole-block decode: full sublane occupancy

    def s_row(blk, gi):
        return blk[gi][None, :]

    gt_pad = s_ref.shape[-2]
    # per-group activation sums via one MXU dot (exact s32): group-onehot
    # columns beyond gt stay all-zero so padded scale rows contribute nothing
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_k, gt_pad), 0) // g_tile
        == jax.lax.broadcasted_iota(jnp.int32, (tile_k, gt_pad), 1)
    ).astype(jnp.int8)
    asum_g = jax.lax.dot_general(
        a, gmask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)  # (tm, gt_pad); |asum| <= 127*g_tile: f32-exact

    total = jnp.zeros_like(acc_ref)
    cpg = g_tile // cs  # chunks per group (chunk_plan: cs divides g_tile)
    for c0 in range(0, tile_k // cs, cpg):
        d_grp = None  # exact s32 across the group's chunks
        for c in range(c0, c0 + cpg):
            a_c = a[:, c * cs : (c + 1) * cs]
            d = None
            shift = 0
            for pi, (blk, pb) in enumerate(zip(blocks, plane_bits)):
                if paired and pi == 0:  # 4-bit plane: int16-bitcast decode
                    v8 = common.extract_paired_chunk_int(
                        blk, c, cs, tile_k
                    ).astype(jnp.int8)
                else:
                    vals = common.extract_plane_chunk(blk, pb, c, cs, tile_k)
                    v8 = (vals - (128 if pb == 8 else 0)).astype(jnp.int8)
                dp = jax.lax.dot_general(
                    a_c, v8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                dp = dp if shift == 0 else (dp << shift)
                d = dp if d is None else d + dp
                shift += pb
            d_grp = d if d_grp is None else d_grp + d
        gi = (c0 * cs) // g_tile
        total = total + d_grp.astype(jnp.float32) * s_row(s_all, gi)
    szb = s_blk(sz_ref)
    if plane_bits == (8,):  # fold the 8-bit plane's -128 offset correction
        szb = szb - 128.0 * s_all
    # zero term: one (tm, gt_pad) x (gt_pad, tn) dot; HIGHEST because asum
    # needs more than bf16's 8 mantissa bits (values up to 127*g_tile)
    total = total - jax.lax.dot_general(
        asum_g, szb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc_ref[...] += total

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _kernel_a8_perchannel(plane_bits, tile_k, cs, stacked, paired, *refs):
    """W4A8 fast path for PER-CHANNEL scales (one group spanning all of K,
    i.e. ``groups_per_tile == 1`` and a single scale row shared by every
    K-tile): the dot outputs accumulate in pure int32 across chunks AND
    K-tiles, and the f32 rescale happens ONCE at the output write.

    This is what makes the int8 MXU rate actually pay: with g=128 groups the
    per-chunk f32 rescale of the (M, N) accumulator costs ~3 VPU lane-ops
    per output per group — as much as the MXU saves (measured ~1.0x).  Here
    the VPU does only the extraction, so prefill approaches the 2x int8 MAC
    rate.  Overflow-safe: |acc| <= 127 * 255 * K < 2^31 for K up to ~66k.
    """
    if stacked:
        refs = refs[1:]
    n_planes = len(plane_bits)
    a_ref = refs[0]
    plane_refs = refs[1 : 1 + n_planes]
    s_ref, sz_ref, out_ref, acc_ref, asum_ref = refs[1 + n_planes :]

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        asum_ref[...] = jnp.zeros_like(asum_ref)

    blocks = [(r[0] if stacked else r[...]) for r in plane_refs]
    a = a_ref[...]  # int8 (tm, tile_k)

    total = jnp.zeros_like(acc_ref)  # int32
    asum_t = jnp.zeros_like(asum_ref)  # int32 (tm, 128), col-broadcast
    for c in range(tile_k // cs):
        a_c = a[:, c * cs : (c + 1) * cs]
        asum_t = asum_t + jnp.sum(a_c.astype(jnp.int32), axis=1, keepdims=True)
        d = None
        shift = 0
        for pi, (blk, pb) in enumerate(zip(blocks, plane_bits)):
            if paired and pi == 0:  # 4-bit plane: int16-bitcast pair decode
                v8 = common.extract_paired_chunk_int(
                    blk, c, cs, tile_k
                ).astype(jnp.int8)
            else:
                vals = common.extract_plane_chunk(blk, pb, c, cs, tile_k)
                v8 = (vals - (128 if pb == 8 else 0)).astype(jnp.int8)
            dp = jax.lax.dot_general(
                a_c, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            dp = dp if shift == 0 else (dp << shift)
            d = dp if d is None else d + dp
            shift += pb
        total = total + d
    acc_ref[...] += total
    asum_ref[...] += asum_t

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        # single rescale: out = s*(d + 128*asum if 8-bit plane) - sz*asum
        sr = common.to_f32_scale(
            (s_ref[0, 0, 0, :] if stacked else s_ref[0, 0, :])[None, :]
        )
        szr = common.to_f32_scale(
            (sz_ref[0, 0, 0, :] if stacked else sz_ref[0, 0, :])[None, :]
        )
        asum = asum_ref[:, :1].astype(jnp.float32)
        d = acc_ref[...].astype(jnp.float32)
        if plane_bits == (8,):  # only width 8 has an offset (-128) plane
            d = d + 128.0 * asum
        out_ref[...] = (d * sr - asum * szr).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "tile_m", "tile_n", "precise", "interpret", "a8"),
)
def qmatmul_kernel(
    a: jax.Array,
    qt: QTensor,
    out_dtype=jnp.bfloat16,
    tile_m: Optional[int] = None,
    tile_n: Optional[int] = None,
    precise: bool = False,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jax.Array] = None,
    a8: bool = False,
) -> jax.Array:
    """``a (M, K) @ dequant(qt) (K, N) -> (M, N)``, fused.

    ``a8=True``: ``a`` is int8 (per-row-quantized by the public op) and the
    dots run on the MXU's s8xs8->s32 path; the f32 output still needs the
    caller's per-row activation scale applied.

    ``a`` must already be padded to ``qt.K`` columns and to a sublane-friendly M
    (the public op in ``ops/qmatmul.py`` does both).  ``precise=True`` runs the
    dots in f32 (mirrors the reference's f32-accumulation variant,
    ``gemv_w4a16_c32.cu``); the default feeds the MXU in bf16 — integer weight
    chunks are exact in bf16, so only activations round.

    ``layer_idx`` (traced int32 scalar): the QTensor leaves carry a leading
    layer axis and the kernel reads layer ``layer_idx`` in place (see module
    docstring).
    """
    if interpret is None:
        interpret = common.interpret_default()
    stacked = layer_idx is not None
    M, K = a.shape
    N = qt.planes[0].shape[-1]
    assert K == qt.K, f"activation K={K} != packed K={qt.K}"
    assert qt.planes[0].ndim == (3 if stacked else 2), "layer_idx vs rank mismatch"
    tk = qt.tile_k
    plane_bits = PLANE_DECOMP[qt.bits]
    tm = tile_m or min(M, 256)
    tn = tile_n or common.pick_tile_n(N)
    assert M % tm == 0, (M, tm)
    if a8:
        assert a.dtype == jnp.int8, a.dtype
        assert not precise, "a8 is integer-exact; `precise` does not apply"
    compute_dtype = jnp.float32 if precise else jnp.bfloat16
    gt = qt.groups_per_tile
    gt_pad = qt.scales.shape[-2]
    paired = qt.paired
    cs = common.chunk_plan(plane_bits, tk, tk // gt, paired=paired)

    grid = (M // tm, common.cdiv(N, tn), K // tk)
    if stacked:
        # with num_scalar_prefetch, index maps get grid indices first and the
        # scalar-prefetch refs appended last
        in_specs = [
            pl.BlockSpec((tm, tk), lambda i, j, k, li: (i, k), memory_space=pltpu.VMEM)
        ]
        in_specs += [
            pl.BlockSpec(
                (1, tk // (32 // pb), tn),
                lambda i, j, k, li: (li[0], k, j),
                memory_space=pltpu.VMEM,
            )
            for pb in plane_bits
        ]
        s_spec = pl.BlockSpec(
            (1, 1, gt_pad, tn),
            lambda i, j, k, li: (li[0], k, 0, j),
            memory_space=pltpu.VMEM,
        )
        in_specs += [s_spec, s_spec]
        out_spec = pl.BlockSpec(
            (tm, tn), lambda i, j, k, li: (i, j), memory_space=pltpu.VMEM
        )
    else:
        in_specs = [
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
        ]
        in_specs += [
            pl.BlockSpec(
                (tk // (32 // pb), tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            )
            for pb in plane_bits
        ]
        s_spec = pl.BlockSpec(
            (1, gt_pad, tn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM
        )
        in_specs += [s_spec, s_spec]
        out_spec = pl.BlockSpec(
            (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        )

    # per-layer packed bytes (what one call streams)
    layers = qt.planes[0].shape[0] if stacked else 1
    packed_bytes = sum(p.size * 4 for p in qt.planes) // layers
    scratch = [pltpu.VMEM((tm, tn), jnp.float32)]
    if a8:
        if qt.group_size >= qt.K:  # per-channel scales: int32-exact fast path
            kernel = functools.partial(
                _kernel_a8_perchannel, plane_bits, tk, cs, stacked, paired
            )
            scratch = [
                pltpu.VMEM((tm, tn), jnp.int32),
                pltpu.VMEM((tm, 128), jnp.int32),
            ]
        else:
            kernel = functools.partial(
                _kernel_a8, plane_bits, tk, gt, cs, stacked, paired
            )
    else:
        kernel = functools.partial(
            _kernel, plane_bits, tk, gt, cs, compute_dtype, stacked, paired
        )
    cost = pl.CostEstimate(
        flops=2 * M * N * K,
        bytes_accessed=packed_bytes
        + qt.scales.size * qt.scales.dtype.itemsize * 2 // layers
        + M * K * a.dtype.itemsize
        + M * N * jnp.dtype(out_dtype).itemsize,
        transcendentals=0,
    )
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            compiler_params=cparams,
            cost_estimate=cost,
            interpret=interpret,
        )(
            jnp.asarray(layer_idx, jnp.int32).reshape(1),
            a, *qt.planes, qt.scales, qt.scale_zeros,
        )
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=scratch,
            compiler_params=cparams,
            cost_estimate=cost,
            interpret=interpret,
        )(a, *qt.planes, qt.scales, qt.scale_zeros)
    return out
