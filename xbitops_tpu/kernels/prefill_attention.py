"""Pallas TPU kernel: length-aware chunked-PREFILL attention.

The chunked-prefill path (``models.llama.prefill_slots_chunk`` — long-prompt
admission) attends a [N, T] chunk of queries against the slots' caches.  The
XLA fallback reads each slot's FULL cache allocation, materializes the
[N, H, T, S] probability tensor, and — on the packed int8 cache — first
dequantizes the whole allocation to f32 ([N, Hkv, S, D] ×2 per layer written
AND read back).  At 7B S=2048 that is several hundred MB of avoidable HBM
traffic per layer; admission was 59% of long-context serving time (round-5
serving sweep, docs/PERF_NOTES.md).

This kernel streams only the blocks the chunk can see — per q-tile,
positions ``[window_lo, max_pos]`` — with flash online-softmax accumulation,
per-kv-head MXU dots (a T-sized query tile fills the MXU on its own; no
cross-head group trick needed, unlike decode), in-register int8 dequant
(same biased byte-field algebra as ``decode_attention``), and causal +
sliding-window masks from per-row global positions.

Layout contract (matches the decode kernels / ``models.llama.KVCache``):
dense cache head-major ``[(L,) B, Hkv, S, D]``; packed int8 words
``[(L,) B, Hkv, S/4, D]`` (byte j of word w = position 4w+j, biased +128)
with scales ``[(L,) B, 4, Hkv, S/4]``.

Two variants, like decode_attention:
- **v1** (grid ``(N*QT, S_blocks)``): interpreter-friendly oracle (CPU CI)
  and fallback; scalar-prefetch clamping bounds reads on TPU.
- **v2** (grid ``(N*QT,)``): one program per (row, q-tile), inner
  ``pltpu.emit_pipeline`` with a DYNAMIC grid over exactly the tile's live
  blocks.  Real TPU only (emit_pipeline has no interpreter support).

The reference has no attention at all (SURVEY §5 — `gemv` folds leading dims
into M, `dq_torch_ops.cc:61-64`); this kernel exists because XLA's one-shot
prefill attention pays for dead allocation the way the reference's dense
GEMV never had to.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xbitops_tpu.kernels import common

NEG_INF = -1e30


def _body_shared(h_range, rep, tq, bs, D, scale, has_scales, window,
                 q_ref, pos_ref, base, k_blk, v_blk, ks_blk, vs_blk,
                 m_ref, l_ref, acc_ref):
    """One (q-tile, kv-block) flash step, shared by v1 and v2.

    ``q_ref`` block (.., Hkv, rep, tq, D); ``pos_ref`` block (.., rep*tq, 1)
    int32 global positions (pads hold >= S_cap); ``base`` scalar: the
    block's first cache position.  State refs are (Hkv, rep*tq, 1/D).
    """
    pos_col = pos_ref[...].reshape(rep * tq, 1)  # (rep*tq, 1) int32
    if has_scales:
        bw = bs // 4
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (rep * tq, 4 * bw), 1)
        s_pos = base + 4 * (l_iota % bw) + l_iota // bw
    else:
        s_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, (rep * tq, bs), 1)
    live = s_pos <= pos_col
    if window:
        live = jnp.logical_and(live, s_pos > pos_col - window)

    if has_scales:
        ksb = ks_blk[...].astype(jnp.float32)  # (4, Hkv, bw)
        vsb = vs_blk[...].astype(jnp.float32)

    def field(wg, j):
        if j == 3:
            return jax.lax.shift_right_logical(wg, 24).astype(jnp.float32)
        return (wg & (255 << (8 * j))).astype(jnp.float32)

    def inv_j(j):
        return 1.0 if j == 3 else float(2.0 ** (-8 * j))

    for h in h_range:
        q_h = q_ref[h].reshape(rep * tq, D)  # (rep, tq, D) -> rows, bf16
        m_prev = m_ref[h]  # (rep*tq, 1)
        if has_scales:
            bw = bs // 4
            qf = q_h.astype(jnp.float32)
            qs = 128.0 * jnp.sum(qf, axis=1, keepdims=True)  # (rep*tq, 1)
            kg = k_blk[h]  # (bw, D) int32 words
            vg = v_blk[h]
            parts = []
            for j in range(4):
                k2 = field(kg, j)  # (bw, D)
                su = jax.lax.dot_general(
                    qf, k2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (rep*tq, bw)
                ksj = ksb[j, h, :][None, :]  # (1, bw)
                parts.append(ksj * (su * inv_j(j) - qs) * scale)
            scores = jnp.concatenate(parts, axis=1)  # (rep*tq, 4*bw)
        else:
            k2 = k_blk[h]  # (bs, D)
            scores = jax.lax.dot_general(
                q_h, k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        scores = jnp.where(live, scores, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        m_ref[h] = m_new
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if has_scales:
            bw = bs // 4
            pv = None
            for j in range(4):
                v2 = field(vg, j)  # (bw, D)
                vsj = vsb[j, h, :][None, :]
                pe = p[:, j * bw : (j + 1) * bw] * vsj  # (rep*tq, bw)
                dv = jax.lax.dot_general(
                    pe * inv_j(j), v2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dvj = dv - 128.0 * jnp.sum(pe, axis=1, keepdims=True)
                pv = dvj if pv is None else pv + dvj
        else:
            v2 = v_blk[h]
            pv = jax.lax.dot_general(
                p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[h] = acc_ref[h] * alpha + pv


def _start(m_ref, l_ref, acc_ref):
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)


def _finalize(Hkv, rep, tq, D, any_live, o_ref, m_ref, l_ref, acc_ref):
    for h in range(Hkv):
        denom = jnp.maximum(l_ref[h], 1e-30)
        out = (acc_ref[h] / denom).astype(o_ref.dtype)
        out = jnp.where(any_live, out, jnp.zeros_like(out))
        o_ref[h] = out.reshape(rep, tq, D)


def _kernel_v1(bs, rep, Hkv, tq, D, scale, stacked, has_scales, window,
               n_blocks, *refs):
    refs = list(refs)
    hi_ref = refs.pop(0)   # (N*QT,) highest live position per tile, -1 none
    lo_ref = refs.pop(0)   # (N*QT,) window start block per tile
    refs.pop(0)            # slot ids (consumed by the index maps)
    if stacked:
        refs.pop(0)        # layer index (consumed by the index maps)
    q_ref, pos_ref, k_ref, v_ref = refs[:4]
    rest = refs[4:]
    ks_ref = vs_ref = None
    if has_scales:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, m_ref, l_ref, acc_ref = rest
    g = pl.program_id(0)
    s = pl.program_id(1)
    hi = hi_ref[g]
    lo_blk = lo_ref[g]

    @pl.when(s == 0)
    def _():
        _start(m_ref, l_ref, acc_ref)

    # only blocks in [lo_blk, hi//bs] carry visible positions
    @pl.when(jnp.logical_and(s >= lo_blk, s * bs <= hi))
    def _():
        _body_shared(range(Hkv), rep, tq, bs, D, scale, has_scales, window,
                     q_ref, pos_ref, s * bs, k_ref, v_ref, ks_ref, vs_ref,
                     m_ref, l_ref, acc_ref)

    @pl.when(s == n_blocks - 1)
    def _():
        _finalize(Hkv, rep, tq, D, hi >= 0, o_ref, m_ref, l_ref, acc_ref)


def _kernel_v2(bs, rep, Hkv, tq, D, scale, stacked, has_scales, window,
               *refs):
    refs = list(refs)
    hi_ref = refs.pop(0)
    lo_ref = refs.pop(0)
    slot_ref = refs.pop(0)
    li_ref = refs.pop(0) if stacked else None
    if has_scales:
        q_ref, pos_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref, \
            m_ref, l_ref, acc_ref = refs
    else:
        q_ref, pos_ref, k_hbm, v_hbm, o_ref, m_ref, l_ref, acc_ref = refs
    g = pl.program_id(0)
    hi = hi_ref[g]
    lo_blk = lo_ref[g]
    rows = (bs // 4) if has_scales else bs
    # dynamic inner grid: exactly the tile's live blocks (>= 1; an all-pad
    # tile runs one clamped block whose compute is masked off)
    n_blk = jnp.maximum(hi // bs - lo_blk + 1, 1)

    _start(m_ref, l_ref, acc_ref)

    def blk_of(i):
        last = jnp.maximum(hi, 0) // bs
        return jnp.minimum(lo_blk + i, last)

    def body(*blks):
        i = pl.program_id(0)  # inner pipeline index (scheduler grid_env)
        if has_scales:
            k_blk, v_blk, ks_blk, vs_blk = blks
        else:
            k_blk, v_blk = blks
            ks_blk = vs_blk = None
        _body_shared(range(Hkv), rep, tq, bs, D, scale, has_scales, window,
                     q_ref, pos_ref, blk_of(i) * bs, k_blk, v_blk,
                     ks_blk, vs_blk, m_ref, l_ref, acc_ref)

    lead = (None, None) if stacked else (None,)

    def kv_index(i):
        idx = (slot_ref[g], 0, blk_of(i), 0)
        return ((li_ref[0],) + idx) if stacked else idx

    def sc_index(i):
        idx = (slot_ref[g], 0, 0, blk_of(i))
        return ((li_ref[0],) + idx) if stacked else idx

    kv_spec = pl.BlockSpec(lead + (Hkv, rows, D), kv_index)
    specs = [kv_spec, kv_spec]
    ops = [k_hbm, v_hbm]
    if has_scales:
        sc_spec = pl.BlockSpec(lead + (4, Hkv, rows), sc_index)
        specs += [sc_spec, sc_spec]
        ops += [ks_hbm, vs_hbm]
    pltpu.emit_pipeline(body, grid=(n_blk,), in_specs=specs)(*ops)

    _finalize(Hkv, rep, tq, D, hi >= 0, o_ref, m_ref, l_ref, acc_ref)


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "block_q", "interpret", "window"),
)
def prefill_attention(
    q: jax.Array,          # [N, T, H, D] chunk queries
    k: jax.Array,          # [(L,) B, Hkv, S, D] or int8 words [.., S/4, D]
    v: jax.Array,
    positions: jax.Array,  # int32 [N, T] global positions (>= S_cap = pad)
    slot_ids: jax.Array,   # int32 [N] cache rows (out of range = inert row)
    block_s: Optional[int] = None,
    block_q: Optional[int] = None,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Chunked-prefill attention: ``out[n, t]`` attends cache positions
    ``s <= positions[n, t]`` (within ``window`` when set) of row
    ``slot_ids[n]``.  The chunk's own rows must already be written to the
    cache (the model writes k/v before attending — chunk queries then see
    themselves and each other causally through the cache, exactly like the
    XLA path).  Pad queries (positions >= S_cap) return zeros.

    HBM reads scale with each q-tile's visible span, not the allocation;
    the packed int8 cache dequantizes per-block in-register (the XLA path
    dequantized the WHOLE allocation to f32 first).
    """
    if interpret is None:
        interpret = common.interpret_default()
    stacked = layer_idx is not None
    has_scales = k_scale is not None
    N, T, H, D = q.shape
    pack = 4 if has_scales else 1
    Hkv = k.shape[-3]
    S = k.shape[-2] * pack
    B = k.shape[-4]
    assert H % Hkv == 0
    rep = H // Hkv
    if window is not None:
        assert window >= 1
        if window >= S:
            window = None
    # VMEM budget (v5e scoped limit 16 MB): the m/l scratches pad their
    # minor-1 lane dim to 128 (2 MB each at rep*tq=128, Hkv=32), the kv
    # pipeline double-buffers 2 blocks each — the 7B MHA int8 case
    # (Hkv=32, 2 MB word blocks) only fits with a 64-row q-tile, dense
    # only with 128-position kv blocks (measured: bs=256 + tq=128 MHA
    # dense = 16.7 MB, rejected by Mosaic).
    tq = min(block_q or (64 if has_scales else 128), T)
    assert T % tq == 0, "prefill_attention: T must be a multiple of block_q"
    QT = T // tq
    bs = min(block_s or (512 if has_scales else 128), S)
    assert S % bs == 0, "prefill_attention: S must be a multiple of block_s"
    n_blocks = S // bs

    # q -> (N, QT, Hkv, rep, tq, D); positions -> (N*QT, rep*tq, 1) columns
    q6 = q.reshape(N, QT, tq, Hkv, rep, D).transpose(0, 1, 3, 4, 2, 5)
    pos_t = positions.astype(jnp.int32).reshape(N, QT, 1, tq)
    pos_col = jnp.broadcast_to(pos_t, (N, QT, rep, tq)).reshape(
        N * QT, rep * tq, 1)

    # per-tile visible range: hi = max live position (-1 if none),
    # lo_blk = first block the window admits
    pos_live = jnp.where(positions < S, positions, -1).reshape(N, QT, tq)
    hi = jnp.max(pos_live, axis=2).reshape(N * QT)
    if window is not None:
        lo_live = jnp.where(positions < S, positions, jnp.int32(2**30))
        lo = jnp.maximum(jnp.min(lo_live.reshape(N, QT, tq), axis=2)
                         - (window - 1), 0)
        lo_blk = jnp.minimum(lo // bs, (S - 1) // bs).reshape(N * QT)
    else:
        lo_blk = jnp.zeros((N * QT,), jnp.int32)
    safe_slot = jnp.clip(slot_ids.astype(jnp.int32), 0, B - 1)
    slot_g = jnp.repeat(safe_slot, QT)

    args = [hi.astype(jnp.int32), lo_blk.astype(jnp.int32), slot_g]
    n_prefetch = 3
    if stacked:
        args.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))
        n_prefetch += 1

    q_spec = pl.BlockSpec(
        (None, None, Hkv, rep, tq, D),
        lambda g, *_: (g // QT, g % QT, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pos_spec = pl.BlockSpec(
        (None, rep * tq, 1), lambda g, *_: (g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    o_spec = pl.BlockSpec(
        (None, None, Hkv, rep, tq, D),
        lambda g, *_: (g // QT, g % QT, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((N, QT, Hkv, rep, tq, D), q.dtype)
    scratch = [
        pltpu.VMEM((Hkv, rep * tq, 1), jnp.float32),
        pltpu.VMEM((Hkv, rep * tq, 1), jnp.float32),
        pltpu.VMEM((Hkv, rep * tq, D), jnp.float32),
    ]
    operands = [q6.reshape(N, QT, Hkv, rep, tq, D), pos_col, k, v]
    if has_scales:
        operands += [k_scale, v_scale]

    bw = bs // pack
    use_v2 = not interpret and (not has_scales or bw % 128 == 0)
    if use_v2:
        in_specs = (
            [q_spec, pos_spec]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (len(operands) - 2)
        )
        out = pl.pallas_call(
            functools.partial(
                _kernel_v2, bs, rep, Hkv, tq, D, D ** -0.5, stacked,
                has_scales, window,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_prefetch,
                grid=(N * QT,),
                in_specs=in_specs,
                out_specs=o_spec,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(*args, *operands)
    else:
        lead = (None, None) if stacked else (None,)

        def clamp(s_idx, g, hi_a, lo_a):
            last = jnp.maximum(hi_a[g], 0) // bs
            return jnp.minimum(jnp.maximum(s_idx, lo_a[g]), last)

        def kv_index(g, s_idx, hi_a, lo_a, slot_a, *rest):
            idx = (slot_a[g], 0, clamp(s_idx, g, hi_a, lo_a), 0)
            return ((rest[-1][0],) + idx) if stacked else idx

        def sc_index(g, s_idx, hi_a, lo_a, slot_a, *rest):
            idx = (slot_a[g], 0, 0, clamp(s_idx, g, hi_a, lo_a))
            return ((rest[-1][0],) + idx) if stacked else idx

        kv_spec = pl.BlockSpec(lead + (Hkv, bw, D), kv_index,
                               memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((None, None, Hkv, rep, tq, D),
                         lambda g, s_idx, *_: (g // QT, g % QT, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rep * tq, 1), lambda g, s_idx, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
        ]
        if has_scales:
            sc_spec = pl.BlockSpec(lead + (4, Hkv, bw), sc_index,
                                   memory_space=pltpu.VMEM)
            in_specs += [sc_spec, sc_spec]
        out = pl.pallas_call(
            functools.partial(
                _kernel_v1, bs, rep, Hkv, tq, D, D ** -0.5, stacked,
                has_scales, window, n_blocks,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_prefetch,
                grid=(N * QT, n_blocks),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (None, None, Hkv, rep, tq, D),
                    lambda g, s_idx, *_: (g // QT, g % QT, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(*args, *operands)

    # (N, QT, Hkv, rep, tq, D) -> [N, T, H, D]
    return out.transpose(0, 1, 4, 2, 3, 5).reshape(N, T, H, D)
