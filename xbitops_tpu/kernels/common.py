"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from xbitops_tpu.formats import PLANE_DECOMP


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.cache
def interpret_default() -> bool:
    """Pallas TPU kernels only compile on TPU backends; anywhere else (the CPU
    test harness, the 8-virtual-device sharding tests) we run the interpreter."""
    return jax.default_backend() not in ("tpu", "axon")


def plane_ratios(bits: int):
    return tuple(32 // pb for pb in PLANE_DECOMP[bits])


def pick_tile_n(N: int, prefer: int = 2048) -> int:
    """Lane-tile choice (multiple of 128).  Bigger tiles amortize per-grid-step
    overhead and raise achieved HBM bandwidth (measured: tn=2048 is ~2x the
    GB/s of tn=512 on v5e); partial last blocks are fine (Pallas masks them),
    but avoid tiles that waste >15% of N to padding."""
    if N % 128:
        raise ValueError(f"N={N} must be a multiple of 128 (pad first)")
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= prefer and (cand <= N and (cdiv(N, cand) * cand - N) * 20 <= N):
            return cand
    return 128


def chunk_plan(plane_bits, tile_k: int, g_tile: int,
               paired: bool = False) -> int:
    """Row-chunk size for slot-structured kernels.

    The plane pack layout stores bit-slot ``j`` of a K-tile in bit position
    ``pb*j`` of every word-row; slot ``j`` of plane ``p`` covers local rows
    ``[j*wt_p, (j+1)*wt_p)`` with ``wt_p = tile_k * pb / 32``.  Kernels process
    the tile in chunks of ``cs`` rows such that every chunk lies inside a
    single slot of every plane AND a single scale group — then each chunk is a
    static slice + shift + mask per plane, no concatenate, no gather.

    PAIRED layout (4-bit plane): pair slot ``j`` covers ``tile_k/4``
    contiguous local rows spread over ``tile_k/8`` word rows (two rows per
    word), so a chunk must lie inside one pair slot and its word-row slice
    (``cs/2``) must keep Mosaic's 8-sublane alignment — hence ``cs >= 16``
    i.e. group sizes >= 16 (the documented floor).  Multi-plane widths with
    a paired 4-bit plane (5/6/7) additionally keep every chunk inside one
    slot of their 1/2-bit slot-layout planes.
    """
    if paired:
        ph = tile_k // 4  # K rows per pair slot
        cs = min(ph, g_tile)
        for pb in plane_bits[1:]:  # mixed: remaining slot-layout planes
            cs = min(cs, tile_k // (32 // pb))
        if ph % cs or g_tile % cs:
            raise ValueError(
                f"chunk {cs} must divide pair-slot height {ph} and group "
                f"rows {g_tile} (tile_k={tile_k})"
            )
        for pb in plane_bits[1:]:
            if (tile_k // (32 // pb)) % cs:
                raise ValueError(
                    f"chunk {cs} must divide plane slot height "
                    f"{tile_k // (32 // pb)} (tile_k={tile_k}, plane {pb}b)"
                )
        if cs % 2 or (cs // 2) % 8:
            raise ValueError(
                f"paired 4-bit chunks need cs multiple of 16 (got {cs}; "
                f"group_size >= 16 required)"
            )
        return cs
    wt_min = tile_k // max(32 // pb for pb in plane_bits)
    cs = min(wt_min, g_tile)
    for pb in plane_bits:
        wt = tile_k // (32 // pb)
        if wt % cs:
            raise ValueError(
                f"chunk {cs} must divide plane slot height {wt} "
                f"(tile_k={tile_k}, g={g_tile}, plane {pb}b)"
            )
    if g_tile % cs:
        raise ValueError(f"chunk {cs} must divide group rows {g_tile}")
    return cs


def extract_plane_chunk(blk, pb: int, c: int, cs: int, tile_k: int):
    """One plane's integer values ``(cs, tn)`` for local rows
    [c*cs, (c+1)*cs) — a static slice + shift + mask."""
    wt = tile_k // (32 // pb)
    j, r0 = divmod(c * cs, wt)
    return (blk[r0 : r0 + cs, :] >> (pb * j)) & ((1 << pb) - 1)


def extract_plane_chunk_scaled(blk, pb: int, c: int, cs: int, tile_k: int):
    """One plane's integer values for local rows [c*cs, (c+1)*cs), **left in
    place at their packed bit offset**: returns ``(vals << (pb*j), 2.0**-(pb*j))``
    so callers fold the inverse power of two into the (per-chunk-constant)
    output scale instead of shifting every lane.

    One VPU op per extracted value (mask for inner slots, logical shift for the
    top slot — which needs no mask) versus two for
    :func:`extract_plane_chunk`; exact powers of two make the folded scaling
    bit-identical to shifting first.  This is the TPU answer to the
    reference's per-byte nibble decode (``gemv_w4a16_pt.cu:84-95``): the
    decode cost is what bounds the 4-bit stream below HBM speed, so every
    lane-op counts.

    Values stay exact in bf16: ``q << s`` needs only ``pb <= 8`` mantissa
    bits.  Top slot of a word is extracted with ``shift_right_logical`` (the
    sign bit would otherwise leak through an arithmetic shift or a convert).
    """
    wt = tile_k // (32 // pb)
    j, r0 = divmod(c * cs, wt)
    rows = blk[r0 : r0 + cs, :]
    n_slots = 32 // pb
    sh = pb * j
    if j == n_slots - 1:
        # top slot: logical right shift both isolates and normalizes
        return jax.lax.shift_right_logical(rows, sh), 1.0
    if j == 0:
        return rows & ((1 << pb) - 1), 1.0
    return rows & (((1 << pb) - 1) << sh), float(2.0 ** (-sh))


def decode_f16_bits(b16):
    """EXACT binary16 -> f32 from int16 bit patterns, VPU-only ops (Mosaic
    can't load fp16 — scale rows store fp16 BITS and decode here; ~8 lane
    ops on a (rows, tn) scale block, ~1% of the weight-chunk work).

    normals:     bits' = sign | ((mag << 13) + ((127-15) << 23))
    subnormals:  mant * 2^-24 (exact in f32), sign applied
    inf/nan:     exponent forced to 255, mantissa preserved
    """
    b = b16.astype(jnp.int32) & 0xFFFF
    sign = (b & 0x8000) << 16
    mag = b & 0x7FFF
    exp = mag >> 10
    mant = mag & 0x3FF
    norm = (mag << 13) + 0x38000000  # exponent rebias 15 -> 127
    out_bits = jnp.where(
        exp == 31, sign | 0x7F800000 | (mant << 13), sign | norm
    )
    out = jax.lax.bitcast_convert_type(out_bits, jnp.float32)
    sub = mant.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    sub = jnp.where(sign != 0, -sub, sub)
    return jnp.where(exp == 0, sub, out)


def to_f32_scale(x):
    """Scale row/block -> f32: fp16-bit int16 storage decodes, floats cast."""
    if x.dtype == jnp.int16:
        return decode_f16_bits(x)
    return x.astype(jnp.float32)


# bf16 1.0 = 0x3F80; adding a 4-bit value v to the mantissa field of 2^7
# (0x4300 = 128.0) yields exactly 128 + v — so OR-ing the magic into masked
# nibble pairs IS the int->bf16 convert, two lanes at a time.
PAIRED_MAGIC = 0x43004300
PAIRED_MASK = 0x000F000F
PAIRED_BIAS = 128.0  # subtract via the zero term: sz' = sz + 128*s


def _paired_chunk_words(blk, c: int, cs: int, tile_k: int):
    """Word rows + pair-slot index for local rows [c*cs, (c+1)*cs) of a
    paired-layout 4-bit K-tile (chunk_plan guarantees one pair slot)."""
    ph = tile_k // 4  # K rows per pair slot
    j, r0 = divmod(c * cs, ph)
    return blk[r0 // 2 : (r0 + cs) // 2, :], j


def extract_paired_chunk_bf16(blk, c: int, cs: int, tile_k: int):
    """BIASED bf16 values ``(cs, tn) = 128 + q`` for local rows
    [c*cs, (c+1)*cs): shift + mask-or-magic + bitcast — 2 VPU ops per weight
    pair, no int->float convert.  Callers fold the +128 bias into the zero
    term (``- asum * (sz + 128 s)``); the extra f32 cancellation is ~1e-3
    relative, far under the bf16 fast path's own activation rounding."""
    rows, j = _paired_chunk_words(blk, c, cs, tile_k)
    t = rows if j == 0 else (rows >> (4 * j))
    t = (t & PAIRED_MASK) | PAIRED_MAGIC
    return pltpu.bitcast(t, jnp.bfloat16)


def extract_paired_chunk_int(blk, c: int, cs: int, tile_k: int):
    """EXACT int16 values ``(cs, tn)`` (0..15) for local rows
    [c*cs, (c+1)*cs) — the bias-free variant for the f32-precise and int8
    paths (int16 bitcast interleaves identically to bf16)."""
    rows, j = _paired_chunk_words(blk, c, cs, tile_k)
    t = rows if j == 0 else (rows >> (4 * j))
    return pltpu.bitcast(t & PAIRED_MASK, jnp.int16)


def extract_chunk(plane_blocks, plane_bits, c: int, cs: int, tile_k: int,
                  paired: bool = False):
    """Integer values ``(cs, tn) int32`` for local rows [c*cs, (c+1)*cs) of a
    K-tile, combined across planes.  All slices/shifts are static.  With
    ``paired``, the first (4-bit) plane decodes via the int16 bitcast; any
    remaining planes (5/6/7-bit widths) are slot-layout shift/mask."""
    wq = None
    shift = 0
    for pi, (blk, pb) in enumerate(zip(plane_blocks, plane_bits)):
        if paired and pi == 0:
            vals = extract_paired_chunk_int(blk, c, cs, tile_k).astype(
                jnp.int32)
        else:
            vals = extract_plane_chunk(blk, pb, c, cs, tile_k)
        part = vals if shift == 0 else (vals << shift)
        wq = part if wq is None else (wq | part)
        shift += pb
    return wq
