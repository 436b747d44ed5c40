"""Pallas TPU kernels: in-place single-position append to the head-major KV
cache (packed int8 and dense bf16 variants).

The decode write path for the packed cache is a read-modify-write of one byte
per (head, dim) word plus two scale-row updates; as XLA ops that is 2 gathers
+ 4 scatters PER LAYER, measured ~300 us/layer of dispatch-and-scatter
overhead at 7B.  This kernel does all of it in ONE aliased custom call per
layer: grid ``(B,)``, each program loads the target word-row block across all
heads, merges the new (biased) byte, and the aliased output writes it back —
touched blocks only, explicit in-place semantics (``input_output_aliases``),
no scatter lowering.

``kv_append_dense`` is the same structure for the unquantized head-major
cache ``[L, B, Hkv, S, D]``: the strided (Hkv, 1, D) row writes of a decode
step force XLA's scatter lowering into per-layer transpose copies (measured
~730 us/step per array at 7B S=2048 — the whole round-3 bench regression),
while the aliased kernel touches only the target slab.

Layouts (see ``models.llama.KVCache``): words ``[L, B, Hkv, S/4, D]`` int32
(biased bytes, u = v + 128); scales ``[L, B, 4, Hkv, S/4]`` — the kernel
reads the 128-lane scale chunk containing the target word and merges the new
per-head scale at lane ``w % 128`` of byte row ``pos % 4``.

Positions >= S (padding / inactive slots) land on a clamped block index and
write back what was read — a no-op by value.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xbitops_tpu.kernels import common

SC_LANES = 128  # scale-chunk width along S/4


def _kernel(Hkv, D, S_words, sc_lanes, wslab, *refs):
    (pos_ref, li_ref, k_ref, v_ref, ks_ref, vs_ref, kq_ref, vq_ref,
     ksn_ref, vsn_ref, ko_ref, vo_ref, kso_ref, vso_ref) = refs
    b = pl.program_id(0)
    pos = pos_ref[b]
    valid = pos < S_words * 4
    byte = jnp.where(valid, pos % 4, 0)
    sh = byte * 8

    # word blocks span a `wslab`-row sublane-aligned slab (a single-word
    # block would put 1 in the sublane dim — Mosaic rejects it); the target
    # word row is selected with an iota mask.
    oldk = k_ref[0, 0]  # (Hkv, wslab, D) int32
    oldv = v_ref[0, 0]
    kq = kq_ref[0][:, None, :]  # (Hkv, 1, D) int32 biased bytes (1..255)
    vq = vq_ref[0][:, None, :]
    keep = ~(255 << sh)
    w_row = jnp.where(valid, (pos // 4) % wslab, 0)
    hit_w = jax.lax.broadcasted_iota(jnp.int32, (Hkv, wslab, D), 1) == w_row
    hit_w = jnp.logical_and(hit_w, valid)
    newk = (oldk & keep) | ((kq & 255) << sh)
    newv = (oldv & keep) | ((vq & 255) << sh)
    ko_ref[0, 0] = jnp.where(hit_w, newk, oldk)
    vo_ref[0, 0] = jnp.where(hit_w, newv, oldv)

    olds_k = ks_ref[0, 0]  # (4, Hkv, sc_lanes)
    olds_v = vs_ref[0, 0]
    lane = jnp.where(valid, pos // 4, 0) % sc_lanes  # word index in the chunk
    hit = jnp.logical_and(
        jax.lax.broadcasted_iota(jnp.int32, (4, Hkv, sc_lanes), 0) == byte,
        jax.lax.broadcasted_iota(jnp.int32, (4, Hkv, sc_lanes), 2) == lane,
    )
    hit = jnp.logical_and(hit, valid)
    # row b of the (B, Hkv) new-scale arrays via one-hot reduce (dynamic
    # sublane indices must be provably 8-aligned in Mosaic; program ids aren't)
    B = ksn_ref.shape[0]
    onehot_b = (
        jax.lax.broadcasted_iota(jnp.int32, (B, Hkv), 0) == b
    ).astype(jnp.float32)
    ksn = jnp.sum(ksn_ref[...].astype(jnp.float32) * onehot_b, axis=0)  # (Hkv,)
    vsn = jnp.sum(vsn_ref[...].astype(jnp.float32) * onehot_b, axis=0)
    kso_ref[0, 0] = jnp.where(
        hit, ksn[None, :, None].astype(olds_k.dtype), olds_k
    )
    vso_ref[0, 0] = jnp.where(
        hit, vsn[None, :, None].astype(olds_v.dtype), olds_v
    )


def _kernel_dense(Hkv, D, S, slab, *refs):
    (pos_ref, li_ref, k_ref, v_ref, kn_ref, vn_ref, ko_ref, vo_ref) = refs
    b = pl.program_id(0)
    pos = pos_ref[b]
    valid = pos < S
    row = jnp.where(valid, pos % slab, 0)
    hit = jax.lax.broadcasted_iota(jnp.int32, (Hkv, slab, D), 1) == row
    hit = jnp.logical_and(hit, valid)
    oldk = k_ref[0, 0]  # (Hkv, slab, D)
    oldv = v_ref[0, 0]
    kn = kn_ref[0][:, None, :].astype(oldk.dtype)  # (Hkv, 1, D)
    vn = vn_ref[0][:, None, :].astype(oldv.dtype)
    ko_ref[0, 0] = jnp.where(hit, kn, oldk)
    vo_ref[0, 0] = jnp.where(hit, vn, oldv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_dense(
    k_all: jax.Array,  # [L, B, Hkv, S, D] (bf16 or f32)
    v_all: jax.Array,
    k_new: jax.Array,  # [B, Hkv, D]
    v_new: jax.Array,
    positions: jax.Array,  # int32 [B]; >= S writes nothing
    layer: jax.Array,  # int32 scalar
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Write row ``positions[b]`` of layer ``layer`` in place (dense cache);
    returns the (aliased) updated k/v arrays.  Positions >= S land on a
    clamped slab whose values are rewritten unchanged (no-op by value)."""
    if interpret is None:
        interpret = common.interpret_default()
    L, B, Hkv, S, D = k_all.shape
    # sublane-tile-aligned slab along S (16 rows for bf16, 8 for f32)
    slab = min(S, 32 // k_all.dtype.itemsize)
    assert S % slab == 0, f"S={S} must be a multiple of {slab}"

    def sidx(b, pos, li):
        p = pos[b]
        return jnp.where(p < S, p // slab, 0)

    kv_spec = pl.BlockSpec(
        (1, 1, Hkv, slab, D),
        lambda b, pos, li: (li[0], b, 0, sidx(b, pos, li), 0),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec(
        (1, Hkv, D), lambda b, pos, li: (b, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[kv_spec, kv_spec, new_spec, new_spec],
        out_specs=[kv_spec, kv_spec],
    )
    return pl.pallas_call(
        functools.partial(_kernel_dense, Hkv, D, S, slab),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        positions.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        k_all, v_all, k_new, v_new,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_packed(
    k_all: jax.Array,  # [L, B, Hkv, S/4, D] int32 (biased bytes)
    v_all: jax.Array,
    ks_all: jax.Array,  # [L, B, 4, Hkv, S/4]
    vs_all: jax.Array,
    kq: jax.Array,  # [B, Hkv, D] int32 biased byte values (1..255)
    vq: jax.Array,
    ks: jax.Array,  # [B, Hkv] new scales
    vs: jax.Array,
    positions: jax.Array,  # int32 [B]; >= S writes nothing
    layer: jax.Array,  # int32 scalar
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Write position ``positions[b]`` of layer ``layer`` in place; returns
    the (aliased) updated cache arrays."""
    if interpret is None:
        interpret = common.interpret_default()
    L, B, Hkv, Sw, D = k_all.shape
    assert Sw % SC_LANES == 0 or Sw < SC_LANES, (
        f"S/4={Sw} must be a multiple of {SC_LANES} (or smaller)"
    )
    sc_lanes = min(SC_LANES, Sw)
    wslab = min(8, Sw)  # sublane-aligned word-row slab per block
    assert Sw % wslab == 0, f"S/4={Sw} must be a multiple of {wslab}"

    def widx(b, pos, li):
        # clamp invalid positions to slab 0 (the kernel rewrites old values)
        p = pos[b]
        return jnp.where(p < Sw * 4, p // 4 // wslab, 0)

    kv_spec = pl.BlockSpec(
        (1, 1, Hkv, wslab, D),
        lambda b, pos, li: (li[0], b, 0, widx(b, pos, li), 0),
        memory_space=pltpu.VMEM,
    )
    def scidx(b, pos, li):
        p = pos[b]
        return jnp.where(p < Sw * 4, p // 4 // sc_lanes, 0)

    sc_spec = pl.BlockSpec(
        (1, 1, 4, Hkv, sc_lanes),
        lambda b, pos, li: (li[0], b, 0, 0, scidx(b, pos, li)),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec(
        (1, Hkv, D), lambda b, pos, li: (b, 0, 0), memory_space=pltpu.VMEM
    )
    # (1, Hkv) blocks violate Mosaic's sublane rule (dim -2 must divide 8 or
    # equal the array dim) — the new scales ride as the whole (B, Hkv) array
    news_spec = pl.BlockSpec(
        (B, Hkv), lambda b, pos, li: (0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[kv_spec, kv_spec, sc_spec, sc_spec,
                  new_spec, new_spec, news_spec, news_spec],
        out_specs=[kv_spec, kv_spec, sc_spec, sc_spec],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Hkv, D, Sw, sc_lanes, wslab),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
            jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
            jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        positions.astype(jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        k_all, v_all, ks_all, vs_all,
        kq, vq, ks.astype(ks_all.dtype), vs.astype(vs_all.dtype),
    )
