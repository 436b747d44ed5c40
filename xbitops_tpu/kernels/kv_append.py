"""Pallas TPU kernel: in-place single-position append to the packed int8 KV
cache.

The decode write path for the lane-major packed cache is a read-modify-write
of one byte per (head, dim) word plus two scale-row updates; as XLA ops that
is 2 gathers + 4 scatters PER LAYER, measured ~300 us/layer of dispatch-and-
scatter overhead at 7B (the int8 cache's whole model-level deficit).  This
kernel does all of it in ONE aliased custom call per layer: grid ``(B,)``,
each program loads the target word-row block, merges the new byte, and the
aliased output writes it back — touched blocks only, explicit in-place
semantics (``input_output_aliases``), no scatter lowering.

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


def _kernel(Hkv, D, S_words, *refs):
    (pos_ref, li_ref, k_ref, v_ref, ks_ref, vs_ref, kq_ref, vq_ref,
     ksn_ref, vsn_ref, ko_ref, vo_ref, kso_ref, vso_ref) = refs
    b = pl.program_id(0)
    pos = pos_ref[b]
    valid = pos < S_words * 4
    byte = jnp.where(valid, pos % 4, 0)
    sh = byte * 8

    oldk = k_ref[0, 0, 0]  # (Hkv, D) int32
    oldv = v_ref[0, 0, 0]
    kq = kq_ref[0]  # (Hkv, D) int32 byte values
    vq = vq_ref[0]
    keep = ~(255 << sh)
    newk = (oldk & keep) | ((kq & 255) << sh)
    newv = (oldv & keep) | ((vq & 255) << sh)
    ko_ref[0, 0, 0] = jnp.where(valid, newk, oldk)
    vo_ref[0, 0, 0] = jnp.where(valid, newv, oldv)

    olds_k = ks_ref[0, 0, 0]  # (4, Hkv)
    olds_v = vs_ref[0, 0, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (4, Hkv), 0) == byte
    row = jnp.logical_and(row, valid)
    # row b of the (B, Hkv) new-scale arrays via one-hot reduce (dynamic
    # sublane indices must be provably 8-aligned in Mosaic; program ids aren't)
    B = ksn_ref.shape[0]
    onehot_b = (
        jax.lax.broadcasted_iota(jnp.int32, (B, Hkv), 0) == b
    ).astype(jnp.float32)
    ksn = jnp.sum(ksn_ref[...].astype(jnp.float32) * onehot_b, axis=0)
    vsn = jnp.sum(vsn_ref[...].astype(jnp.float32) * onehot_b, axis=0)
    kso_ref[0, 0, 0] = jnp.where(row, ksn[None, :].astype(olds_k.dtype), olds_k)
    vso_ref[0, 0, 0] = jnp.where(row, vsn[None, :].astype(olds_v.dtype), olds_v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_append_packed(
    k_all: jax.Array,  # [L, B, S/4, Hkv, D] int32
    v_all: jax.Array,
    ks_all: jax.Array,  # [L, B, S/4, 4, Hkv]
    vs_all: jax.Array,
    kq: jax.Array,  # [B, Hkv, D] int32 byte values (-127..127 & 0xFF ready)
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
    L, B, Sw, Hkv, D = k_all.shape

    def widx(b, pos, li):
        # clamp invalid positions to block 0 (the kernel rewrites old values)
        p = pos[b]
        return jnp.where(p < Sw * 4, p // 4, 0)

    kv_spec = pl.BlockSpec(
        (1, 1, 1, Hkv, D), lambda b, pos, li: (li[0], b, widx(b, pos, li), 0, 0),
        memory_space=pltpu.VMEM,
    )
    sc_spec = pl.BlockSpec(
        (1, 1, 1, 4, Hkv), lambda b, pos, li: (li[0], b, widx(b, pos, li), 0, 0),
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
        functools.partial(_kernel, Hkv, D, Sw),
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
