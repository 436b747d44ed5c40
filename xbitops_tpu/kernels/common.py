"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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


def unpack_plane_tile(words: jax.Array, pb: int) -> jax.Array:
    """Unpack one K-tile of sublane-strided plane words ``(wt, n) int32`` into
    integer values ``(wt * 32//pb, n) int32``.

    Pure lane-parallel shift/mask; the concatenate writes each bit-slot as a
    contiguous block of sublanes (that is what the strided pack layout buys us —
    contrast with the reference's per-thread byte extraction,
    ``gemv_w4a16_pt.cu:84-95``, which has no efficient TPU analog).
    """
    ratio = 32 // pb
    mask = (1 << pb) - 1
    parts = [(words >> (pb * j)) & mask for j in range(ratio)]
    return jnp.concatenate(parts, axis=0)


def dequant_tile(plane_blocks, plane_bits, s_block, sz_block, tile_k: int, gt: int):
    """Dequantize one (tile_k, tn) tile from packed plane blocks, in f32.

    ``s_block``/``sz_block`` are the tile's scale rows ``(gt_pad, tn)`` (first
    ``gt`` rows real, rest sublane padding); the per-row expansion is done by
    broadcasting over a folded (gt, rows_per_group, tn) view, never a gather.
    Dequant rule ``w = wq*s - sz`` per the reference
    (``unpack_weight_2_to_7.cu:75``).
    """
    wq = None
    shift = 0
    for blk, pb in zip(plane_blocks, plane_bits):
        vals = unpack_plane_tile(blk, pb)
        wq = vals if wq is None else (wq | (vals << shift))
        shift += pb
    tn = wq.shape[-1]
    rows_per_g = tile_k // gt
    wqf = wq.astype(jnp.float32).reshape(gt, rows_per_g, tn)
    s = s_block[:gt].astype(jnp.float32)[:, None, :]
    sz = sz_block[:gt].astype(jnp.float32)[:, None, :]
    return (wqf * s - sz).reshape(tile_k, tn)


def plane_ratios(bits: int):
    return tuple(32 // pb for pb in PLANE_DECOMP[bits])


def pick_tile_n(N: int, prefer: int = 512) -> int:
    """Largest lane-tile (multiple of 128) that divides N, capped at ``prefer``."""
    for cand in (1024, 768, 512, 384, 256, 128):
        if cand <= prefer and N % cand == 0:
            return cand
    raise ValueError(f"N={N} must be a multiple of 128 (pad first)")
