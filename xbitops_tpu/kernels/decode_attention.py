"""Pallas TPU kernel: length-aware single-token (decode) attention.

The reference has no attention at all (SURVEY §5 "no sequence axis"); this
kernel exists because the XLA fallback attends over the FULL static KV-cache
allocation every decode step — masking hides the values but not the HBM
reads, so long-context decode pays for dead cache positions.

Design (flash-decoding style, shaped for the TPU VPU):

- k/v blocks stream in the cache's NATIVE ``(bs, Hkv, D)`` shape — no
  host-side reshape (reshaping a multi-GB array right before a custom call
  makes XLA materialize a full copy per call) and no in-kernel lane merges
  (relayouts);
- grid ``(B, S_blocks)`` only: one program per sequence block moves
  ``bs * Hkv * D`` contiguous bytes — large, pipeline-friendly DMAs (a
  per-head grid would move 32 KB blocks and run latency-bound);
- per block, scores for all kv heads at once: elementwise ``k * q_r`` and a
  lane reduction over D — M=1 attention has no use for the MXU, the VPU does
  everything at a fraction of the DMA time; online softmax (running max /
  denominator / accumulator in VMEM scratch) across sequence blocks;
- per-slot lengths arrive as a **scalar-prefetch** argument feeding the k/v
  index maps, which clamp past-length block indices to the last live block:
  Mosaic skips the DMA when consecutive steps map to the same block, so HBM
  traffic scales with actual lengths, not the allocation (compute also skips
  via ``pl.when``);
- with ``layer_idx`` the k/v operands are the WHOLE stacked cache
  ``[L, B, S, Hkv, D]`` and a second scalar-prefetch argument selects the
  layer — inside a ``lax.scan`` over layers nothing is sliced or copied.

GQA: the ``rep = H/Hkv`` query heads sharing a kv head loop inside the kernel
(k/v blocks are reused across them).
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


def _kernel(bs, rep, Hkv, D, scale, stacked, has_scales, paged, *refs):
    refs = list(refs)
    lens_ref = refs.pop(0)
    if paged:
        refs.pop(0)  # page-table scalar ref (consumed by the index maps)
    if stacked:
        refs.pop(0)  # layer-index scalar ref (consumed by the index maps)
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    rest = refs[3:]
    if has_scales:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    s = pl.program_id(1)
    length = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(s * bs < length)
    def _():
        q = q_ref[0].astype(jnp.float32)  # (Hkv, rep, D)

        def online_update(r, scores, v, p_scale=None):
            """One online-softmax accumulation of `scores` (rows, Hkv) with
            values `v` (rows, Hkv, D); `p_scale` optionally rescales the
            probabilities per (row, head) — how per-position v-scales fold in
            without ever broadcasting over D."""
            m_prev = m_ref[r : r + 1, :]  # (1, Hkv)
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
            m_ref[r : r + 1, :] = m_new
            alpha = jnp.exp(m_prev - m_new)  # (1, Hkv)
            p = jnp.exp(scores - m_new)  # (rows, Hkv)
            l_ref[r : r + 1, :] = l_ref[r : r + 1, :] * alpha + jnp.sum(
                p, axis=0, keepdims=True
            )
            if p_scale is not None:
                p = p * p_scale
            pv = jnp.sum(p[:, :, None] * v, axis=0)  # (Hkv, D)
            acc_ref[r] = acc_ref[r] * alpha[0][:, None] + pv

        if has_scales:
            # int8 cache, lane-major packed: byte j of word row w = position
            # 4w+j.  Each byte stream unpacks in-register (shift-left +
            # arithmetic-shift-right sign extension) and runs its own online
            # softmax update; k-scales fold into the scores and v-scales into
            # the probabilities, both (rows, Hkv) — scales never broadcast
            # over D, so no <128-lane reshapes/transposes reach Mosaic.
            bw = bs // 4
            kw = k_ref[0, 0] if stacked else k_ref[0]  # (bw, Hkv, D) int32
            vw = v_ref[0, 0] if stacked else v_ref[0]
            ks = (ks_ref[0, 0] if stacked else ks_ref[0]).astype(jnp.float32)
            vs = (vs_ref[0, 0] if stacked else vs_ref[0]).astype(jnp.float32)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (bw, 4, Hkv), 1)
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (bw, Hkv), 0)
            for j in range(4):
                kj = ((kw << (24 - 8 * j)) >> 24).astype(jnp.float32)
                vj = ((vw << (24 - 8 * j)) >> 24).astype(jnp.float32)
                # (bw, Hkv) scale rows for byte j via one-hot reduce (static
                # middle-axis slicing lowers as an unsupported gather)
                one_j = (j_iota == j).astype(jnp.float32)
                ksj = jnp.sum(ks * one_j, axis=1)
                vsj = jnp.sum(vs * one_j, axis=1)
                live = s * bs + 4 * w_iota + j < length
                for r in range(rep):
                    qr = q[:, r, :]
                    scores = jnp.sum(kj * qr[None, :, :], axis=2) * scale * ksj
                    scores = jnp.where(live, scores, NEG_INF)
                    online_update(r, scores, vj, p_scale=vsj)
        else:
            k = (k_ref[0, 0] if stacked else k_ref[0]).astype(jnp.float32)
            v = (v_ref[0, 0] if stacked else v_ref[0]).astype(jnp.float32)
            # row i of this block is cache position s*bs + i
            live = (
                s * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, Hkv), 0) < length
            )
            for r in range(rep):
                qr = q[:, r, :]  # (Hkv, D)
                scores = jnp.sum(k * qr[None, :, :], axis=2) * scale  # (bs, Hkv)
                scores = jnp.where(live, scores, NEG_INF)
                online_update(r, scores, v)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        for r in range(rep):
            denom = jnp.maximum(l_ref[r], 1e-30)[:, None]  # (Hkv, 1)
            o_ref[0, :, r, :] = (acc_ref[r] / denom).astype(o_ref.dtype)


def _kernel_v2(bs, rep, Hkv, D, scale, stacked, paged, P, has_scales, *refs):
    """Pipelined variant: ONE program per slot; the slot's live blocks stream
    through an inner ``pltpu.emit_pipeline`` with a DYNAMIC grid
    (ceil(length/bs) steps), so the per-program fixed cost is paid B times
    per call instead of B * S/bs times.  Measured (v5e, B=8, S=2048,
    len=1000, MHA): 675 -> 464 us per layer-call vs the grid-per-block
    kernel, whose ~5-8 us/program setup dominated.  HBM traffic additionally
    drops to exactly the live blocks (no clamped re-reads).

    Requires real TPU (emit_pipeline has no interpreter support); the
    wrapper falls back to the v1 grid kernel under interpret mode."""
    refs = list(refs)
    lens_ref = refs.pop(0)
    tbl_ref = refs.pop(0) if paged else None
    li_ref = refs.pop(0) if stacked else None
    if has_scales:
        q_ref, k_hbm, v_hbm, ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_hbm, v_hbm, o_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    length = lens_ref[b]
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    q = q_ref[0].astype(jnp.float32)  # (Hkv, rep, D)

    def online_update(r, scores, v, p_scale=None):
        m_prev = m_ref[r : r + 1, :]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
        m_ref[r : r + 1, :] = m_new
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[r : r + 1, :] = l_ref[r : r + 1, :] * alpha + jnp.sum(
            p, axis=0, keepdims=True
        )
        if p_scale is not None:
            p = p * p_scale
        pv = jnp.sum(p[:, :, None] * v, axis=0)
        acc_ref[r] = acc_ref[r] * alpha[0][:, None] + pv

    def body(k_blk, v_blk):
        i = pl.program_id(0)  # inner pipeline index (scheduler grid_env)
        if has_scales:
            # packed int8 blocks: unpack byte streams, scales fold into
            # scores/probabilities (see the v1 kernel for the layout notes).
            # Scales are NOT pipelined — their 32-lane minor can't slice
            # through emit_pipeline; the whole slot's scale rows sit in VMEM
            # (S/4 x 4 x Hkv, ~hundreds of KB) and each block dynamic-slices
            # its rows.
            bw = bs // 4
            kw = k_blk[...]
            vw = v_blk[...]
            if stacked:
                ks = ks_ref[0, 0, pl.ds(i * bw, bw)].astype(jnp.float32)
                vs = vs_ref[0, 0, pl.ds(i * bw, bw)].astype(jnp.float32)
            else:
                ks = ks_ref[0, pl.ds(i * bw, bw)].astype(jnp.float32)
                vs = vs_ref[0, pl.ds(i * bw, bw)].astype(jnp.float32)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (bw, 4, Hkv), 1)
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (bw, Hkv), 0)
            for j in range(4):
                kj = ((kw << (24 - 8 * j)) >> 24).astype(jnp.float32)
                vj = ((vw << (24 - 8 * j)) >> 24).astype(jnp.float32)
                one_j = (j_iota == j).astype(jnp.float32)
                ksj = jnp.sum(ks * one_j, axis=1)
                vsj = jnp.sum(vs * one_j, axis=1)
                live = i * bs + 4 * w_iota + j < length
                for r in range(rep):
                    qr = q[:, r, :]
                    scores = jnp.sum(kj * qr[None, :, :], axis=2) * scale * ksj
                    scores = jnp.where(live, scores, NEG_INF)
                    online_update(r, scores, vj, p_scale=vsj)
            return
        k = k_blk[...].astype(jnp.float32)  # (bs, Hkv, D)
        v = v_blk[...].astype(jnp.float32)
        live = i * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, Hkv), 0) < length
        for r in range(rep):
            qr = q[:, r, :]
            scores = jnp.sum(k * qr[None, :, :], axis=2) * scale
            scores = jnp.where(live, scores, NEG_INF)
            online_update(r, scores, v)

    n_live = jnp.maximum((length + bs - 1) // bs, 1)
    bw = bs // 4  # word rows per block in the packed-int8 layout
    if paged and stacked:
        # stacked pool [L, n_pages, psz, Hkv, D]: layer via li_ref, page via
        # table (mirrors the v1 paged kernel; a rank-4 spec here would read
        # layer 0 only / fail block-shape checks)
        kv_spec = pl.BlockSpec(
            (None, None, bs, Hkv, D),
            lambda i: (li_ref[0], jnp.maximum(tbl_ref[b * P + i], 0), 0, 0, 0),
        )
    elif paged:
        kv_spec = pl.BlockSpec(
            (None, bs, Hkv, D),
            lambda i: (jnp.maximum(tbl_ref[b * P + i], 0), 0, 0, 0),
        )
    elif stacked:
        kv_blk = (None, None, bw, Hkv, D) if has_scales else (None, None, bs, Hkv, D)
        kv_spec = pl.BlockSpec(kv_blk, lambda i: (li_ref[0], b, i, 0, 0))
    else:
        kv_blk = (None, bw, Hkv, D) if has_scales else (None, bs, Hkv, D)
        kv_spec = pl.BlockSpec(kv_blk, lambda i: (b, i, 0, 0))
    pltpu.emit_pipeline(body, grid=(n_live,), in_specs=[kv_spec, kv_spec])(
        k_hbm, v_hbm
    )

    for r in range(rep):
        denom = jnp.maximum(l_ref[r], 1e-30)[:, None]
        out = (acc_ref[r] / denom).astype(o_ref.dtype)
        # n_live clamps to 1 even for length == 0, which would average one
        # block of garbage rows (all scores NEG_INF -> p = 1); match the v1
        # kernel's zeros-for-empty-slot semantics instead
        o_ref[0, :, r, :] = jnp.where(length > 0, out, jnp.zeros_like(out))


def _decode_attention_v2(q4, k, v, lengths, bs, rep, Hkv, D,
                         layer_idx, page_table, k_scale=None, v_scale=None):
    """pallas_call wrapper for :func:`_kernel_v2` (real TPU only)."""
    B = q4.shape[0]
    stacked = layer_idx is not None
    paged = page_table is not None
    has_scales = k_scale is not None
    P = page_table.shape[1] if paged else 0
    args = [lengths.astype(jnp.int32)]
    n_prefetch = 1
    if paged:
        args.append(page_table.astype(jnp.int32).reshape(-1))
        n_prefetch += 1
    if stacked:
        args.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))
        n_prefetch += 1
    q_index = (lambda b, *_: (b, 0, 0, 0))
    operands = [q4, k, v] + ([k_scale, v_scale] if has_scales else [])
    # scale arrays ride as whole-slot VMEM blocks (their 32-lane minor can't
    # slice through emit_pipeline); the kernel dynamic-slices rows per block
    if has_scales:
        Sw = k.shape[-3]
        if stacked:
            sc_spec = pl.BlockSpec(
                (1, 1, Sw, 4, Hkv), lambda b, *p: (p[-1][0], b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            sc_spec = pl.BlockSpec(
                (1, Sw, 4, Hkv), lambda b, *p: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, bs, rep, Hkv, D, D ** -0.5, stacked, paged, P,
            has_scales,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, Hkv, rep, D), q_index,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + ([sc_spec, sc_spec] if has_scales else []),
            out_specs=pl.BlockSpec((1, Hkv, rep, D), q_index,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rep, Hkv), jnp.float32),
                pltpu.VMEM((rep, Hkv), jnp.float32),
                pltpu.VMEM((rep, Hkv, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*args, *operands)
    return out


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def decode_attention(
    q: jax.Array,  # [B, H, D]
    k: jax.Array,  # [B, S, Hkv, D]  (or [L, B, S, Hkv, D] with layer_idx)
    v: jax.Array,  # like k
    lengths: jax.Array,  # int32 [B] — live positions per slot (attend s < len)
    block_s: int = 256,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,  # [(L,) B, S/4, 4, Hkv]: int8 cache
    v_scale: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,  # int32 [B, P]: paged pool cache
) -> jax.Array:
    """Softmax(q k^T / sqrt(D)) v over each slot's first ``lengths[b]`` cache
    positions; returns [B, H, D].  HBM reads scale with ``lengths``, not S.

    With ``k_scale``/``v_scale`` the cache is the lane-major packed int8
    layout (``models.llama.KVCache`` quantized: int32 words of 4 consecutive
    positions along S) and blocks dequantize in-register — half the DMA bytes
    of the bf16 cache.

    With ``page_table`` the k/v operands are page POOLS
    ``[(L,) n_pages, page_size, Hkv, D]`` and grid step ``s`` of slot ``b``
    streams pool page ``page_table[b, s]`` — the indirection lives entirely
    in the scalar-prefetch-driven index maps, so the kernel body is the
    dense-cache body unchanged and HBM traffic stays ~ live lengths."""
    if interpret is None:
        interpret = common.interpret_default()
    stacked = layer_idx is not None
    has_scales = k_scale is not None
    paged = page_table is not None
    B, H, D = q.shape
    pack = 4 if has_scales else 1
    Hkv = k.shape[-2]
    if paged:
        assert not has_scales, "paged + int8 cache not combined yet"
        psz = k.shape[-3]
        P = page_table.shape[1]
        S = P * psz
        bs, n_blocks, bw = psz, P, psz
    else:
        S = k.shape[-3] * pack
        bs = min(block_s, S)  # positions per block (a multiple of `pack`)
        n_blocks = common.cdiv(S, bs)
        bw = bs // pack  # word rows per block
    assert H % Hkv == 0
    rep = H // Hkv
    # query head h*rep+r shares kv head h (jnp.repeat convention)
    q4 = q.reshape(B, Hkv, rep, D)

    # real-TPU fast path: one program per slot, inner dynamic-grid pipeline
    # over its live blocks (emit_pipeline has no interpreter support; paged +
    # int8 stays un-combined as in v1)
    if not interpret and S % bs == 0 and not (paged and has_scales):
        out = _decode_attention_v2(
            q4, k, v, lengths, bs, rep, Hkv, D, layer_idx, page_table,
            k_scale=k_scale, v_scale=v_scale,
        )
        return out.reshape(B, H, D)

    def clamp(s, lens, b):
        # clamp past-length blocks to the last live block: same index ->
        # Mosaic reuses the already-resident block, no HBM traffic
        last = jnp.maximum(lens[b] - 1, 0) // bs
        return jnp.minimum(s, last)

    if paged:
        def page_of(s, lens, tbl, b):
            # pool page for this grid step (clamped like `clamp`; unallocated
            # entries only reach here for length-0 slots, whose programs skip
            # all compute — max() keeps the DMA address valid)
            return jnp.maximum(tbl[b * P + clamp(s, lens, b)], 0)

        if stacked:
            q_spec = pl.BlockSpec(
                (1, Hkv, rep, D), lambda b, s, lens, tbl, li: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            kv_spec = pl.BlockSpec(
                (1, 1, bs, Hkv, D),
                lambda b, s, lens, tbl, li: (li[0], page_of(s, lens, tbl, b), 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            o_spec = pl.BlockSpec(
                (1, Hkv, rep, D), lambda b, s, lens, tbl, li: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            n_prefetch = 3
            args = [lengths.astype(jnp.int32),
                    page_table.astype(jnp.int32).reshape(-1),
                    jnp.asarray(layer_idx, jnp.int32).reshape(1), q4, k, v]
        else:
            q_spec = pl.BlockSpec(
                (1, Hkv, rep, D), lambda b, s, lens, tbl: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            kv_spec = pl.BlockSpec(
                (1, bs, Hkv, D),
                lambda b, s, lens, tbl: (page_of(s, lens, tbl, b), 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            o_spec = pl.BlockSpec(
                (1, Hkv, rep, D), lambda b, s, lens, tbl: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            n_prefetch = 2
            args = [lengths.astype(jnp.int32),
                    page_table.astype(jnp.int32).reshape(-1), q4, k, v]
        out = pl.pallas_call(
            functools.partial(
                _kernel, bs, rep, Hkv, D, D ** -0.5, stacked, False, True
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_prefetch,
                grid=(B, n_blocks),
                in_specs=[q_spec, kv_spec, kv_spec],
                out_specs=o_spec,
                scratch_shapes=[
                    pltpu.VMEM((rep, Hkv), jnp.float32),
                    pltpu.VMEM((rep, Hkv), jnp.float32),
                    pltpu.VMEM((rep, Hkv, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*args)
        return out.reshape(B, H, D)

    if stacked:
        q_spec = pl.BlockSpec(
            (1, Hkv, rep, D), lambda b, s, lens, li: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kv_spec = pl.BlockSpec(
            (1, 1, bw, Hkv, D),
            lambda b, s, lens, li: (li[0], b, clamp(s, lens, b), 0, 0),
            memory_space=pltpu.VMEM,
        )
        sc_spec = pl.BlockSpec(
            (1, 1, bw, 4, Hkv),
            lambda b, s, lens, li: (li[0], b, clamp(s, lens, b), 0, 0),
            memory_space=pltpu.VMEM,
        )
        o_spec = pl.BlockSpec(
            (1, Hkv, rep, D), lambda b, s, lens, li: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        n_prefetch = 2
        args = [lengths.astype(jnp.int32),
                jnp.asarray(layer_idx, jnp.int32).reshape(1), q4, k, v]
    else:
        q_spec = pl.BlockSpec(
            (1, Hkv, rep, D), lambda b, s, lens: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kv_spec = pl.BlockSpec(
            (1, bw, Hkv, D), lambda b, s, lens: (b, clamp(s, lens, b), 0, 0),
            memory_space=pltpu.VMEM,
        )
        sc_spec = pl.BlockSpec(
            (1, bw, 4, Hkv), lambda b, s, lens: (b, clamp(s, lens, b), 0, 0),
            memory_space=pltpu.VMEM,
        )
        o_spec = pl.BlockSpec(
            (1, Hkv, rep, D), lambda b, s, lens: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        n_prefetch = 1
        args = [lengths.astype(jnp.int32), q4, k, v]

    in_specs = [q_spec, kv_spec, kv_spec]
    if has_scales:
        in_specs += [sc_spec, sc_spec]
        args += [k_scale, v_scale]

    out = pl.pallas_call(
        functools.partial(
            _kernel, bs, rep, Hkv, D, D ** -0.5, stacked, has_scales, False
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(B, n_blocks),
            in_specs=in_specs,
            out_specs=o_spec,
            scratch_shapes=[
                pltpu.VMEM((rep, Hkv), jnp.float32),  # running max
                pltpu.VMEM((rep, Hkv), jnp.float32),  # running denom
                pltpu.VMEM((rep, Hkv, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, D)
