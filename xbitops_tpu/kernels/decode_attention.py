"""Pallas TPU kernel: length-aware single-token (decode) attention.

The reference has no attention at all (SURVEY §5 "no sequence axis"); this
kernel exists because the XLA fallback attends over the FULL static KV-cache
allocation every decode step — masking hides the values but not the HBM
reads, so long-context decode pays for dead cache positions.

Layout (round-3 redesign): the cache is HEAD-MAJOR, ``[B, Hkv, S, D]``
(stacked: ``[L, B, Hkv, S, D]``).  Head-major is what makes the MXU usable
for decode attention: a head-group's keys flatten to a ``(G*bs, D)`` matrix
with a contiguous leading merge (no relayout), so scores and the p·v
reduction each become ONE MXU dot per group instead of ~8K VPU lane-ops per
block.  The cross-head products the group dot also computes are masked by
own-head lane segments and folded with static tile-aligned slices — measured
(v5e, B=8, S=2048, live=1000, MHA): 259 → 199 µs/layer vs the row-major VPU
kernel, 1.2× the DMA bound.

Packed int8 cache: words ``[B, Hkv, S/4, D]`` int32 (byte j of word w =
position 4w+j along S), bytes stored BIASED (u = v+128 ∈ [1, 255]) so byte
isolation is ONE op (mask, or logical shift for the top byte) + one convert;
the bias folds into per-head corrections (128·Σq for scores, 128·Σp·vs for
p·v).  Scales ``[B, 4, Hkv, S/4]`` bf16: the S/4 minor dim makes the layout
HBM-exact (the old ``[.., S/4, 4, Hkv]`` layout padded 4× under T(4,128)
tiling and forced whole-slot VMEM residency + per-step XLA layout copies,
~1.2 ms/step at 7B), and scale blocks now stream through the pipeline like
the data.  The 2^(8j) field factors fold into the scale rows (exact powers
of two).

Two kernels:

- **v1** (grid ``(B, S_blocks)``): per-block programs with scalar-prefetch
  length clamping — the interpreter-friendly oracle (CPU CI) and the
  fallback for shapes the pipelined kernel can't take (S not a multiple of
  the block).
- **v2** (grid ``(B/SPB,)``): one program per GROUP of up to 8 slots, inner
  ``pltpu.emit_pipeline`` with a DYNAMIC flattened (slot, block) grid over
  each slot's live blocks (clamped index maps make past-live steps free:
  they re-address the resident block and skip compute).  The ~5-8 us Mosaic
  per-program fixed cost is paid B/SPB times — at B=32 the per-slot version
  paid it 32x/layer, matching XLA's full-allocation attention cost.  HBM
  traffic is exactly the live blocks; scores/p·v are head-group MXU dots.
  Requires a real TPU (emit_pipeline has no interpreter support).

Paged mode composes with both dense and int8 caches: k/v are page POOLS
(``[(L,) n_pages, Hkv, psz, D]``; int8: ``psz/4`` words + a scale pool) and
grid step ``s`` of slot ``b`` streams pool page ``page_table[b, s]`` through
the scalar-prefetch-driven index maps.

GQA: the ``rep = H/Hkv`` query heads sharing a kv head loop inside the
kernels (k/v blocks are reused across them).
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


def _pick_group(Hkv: int) -> int:
    for g in (8, 4, 2, 1):
        if Hkv % g == 0:
            return g
    return 1


# --------------------------------------------------------------------------
# v1: grid-per-block kernel (interpret-mode oracle + non-block-multiple S)
# --------------------------------------------------------------------------


def _kernel(bs, rep, Hkv, D, scale, stacked, has_scales, paged, window,
            *refs):
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
    # sliding window (Mistral): attend positions [lo, length) only.  The
    # index maps raise past blocks to the window's first block, so the DMAs
    # a window excludes never fetch; the mask handles the partial first block
    lo = jnp.maximum(length - window, 0) if window else jnp.int32(0)

    @pl.when(s == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(s * bs < length, (s + 1) * bs > lo))
    def _():
        q = q_ref[0].astype(jnp.float32)  # (Hkv, rep, D)

        def online_update(r, scores, v, p_scale=None):
            """One online-softmax accumulation: scores (Hkv, rows), values
            v (Hkv, rows, D); ``p_scale`` (Hkv, rows) folds per-position
            v-scales into the probabilities (never broadcast over D)."""
            m_prev = m_ref[r]  # (Hkv, 1)
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            m_ref[r] = m_new
            alpha = jnp.exp(m_prev - m_new)  # (Hkv, 1)
            p = jnp.exp(scores - m_new)  # (Hkv, rows)
            l_ref[r] = l_ref[r] * alpha + jnp.sum(p, axis=1, keepdims=True)
            if p_scale is not None:
                p = p * p_scale
            pv = jnp.sum(p[:, :, None] * v, axis=1)  # (Hkv, D)
            acc_ref[r] = acc_ref[r] * alpha + pv

        if has_scales:
            bw = bs // 4
            # leading block dims are None -> already dropped from the refs
            kw = k_ref[...]  # (Hkv, bw, D) int32 biased words
            vw = v_ref[...]
            ksb = ks_ref[...].astype(jnp.float32)  # (4, Hkv, bw)
            vsb = vs_ref[...].astype(jnp.float32)
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (Hkv, bw), 1)
            for j in range(4):
                uj_k = (jax.lax.shift_right_logical(kw, 8 * j) & 255)
                uj_v = (jax.lax.shift_right_logical(vw, 8 * j) & 255)
                kj = uj_k.astype(jnp.float32) - 128.0  # (Hkv, bw, D)
                vj = uj_v.astype(jnp.float32) - 128.0
                ksj = ksb[j]  # (Hkv, bw)
                vsj = vsb[j]
                pos = s * bs + 4 * w_iota + j
                live = pos < length
                if window:
                    live = jnp.logical_and(live, pos >= lo)
                for r in range(rep):
                    qr = q[:, r, :]
                    scores = jnp.sum(kj * qr[:, None, :], axis=2) * scale * ksj
                    scores = jnp.where(live, scores, NEG_INF)
                    online_update(r, scores, vj, p_scale=vsj)
        else:
            k = k_ref[...].astype(jnp.float32)  # (Hkv, bs, D)
            v = v_ref[...].astype(jnp.float32)
            pos = s * bs + jax.lax.broadcasted_iota(jnp.int32, (Hkv, bs), 1)
            live = pos < length
            if window:
                live = jnp.logical_and(live, pos >= lo)
            for r in range(rep):
                qr = q[:, r, :]  # (Hkv, D)
                scores = jnp.sum(k * qr[:, None, :], axis=2) * scale  # (Hkv, bs)
                scores = jnp.where(live, scores, NEG_INF)
                online_update(r, scores, v)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        for r in range(rep):
            denom = jnp.maximum(l_ref[r], 1e-30)  # (Hkv, 1)
            o_ref[0, :, r, :] = (acc_ref[r] / denom).astype(o_ref.dtype)


# --------------------------------------------------------------------------
# v2: one program per slot, dynamic inner pipeline, head-group MXU dots
# --------------------------------------------------------------------------


def _kernel_v2(bs, rep, Hkv, D, scale, stacked, paged, P, has_scales, SPB,
               fused, S_cap, scales_res, window, *refs):
    refs = list(refs)
    lens_ref = refs.pop(0)
    tbl_ref = refs.pop(0) if paged else None
    li_ref = refs.pop(0) if stacked else None
    pos_ref = refs.pop(0) if fused else None
    if has_scales and fused:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, kn_ref, vn_ref, ksn_ref,
         vsn_ref, o_ref, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
         m_ref, l_ref, acc_ref, kslab, vslab, ksslab, vsslab, sem) = refs
    elif has_scales:
        q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref, m_ref, l_ref, acc_ref = refs
    elif fused:
        (q_ref, k_hbm, v_hbm, kn_ref, vn_ref, o_ref, ko_hbm, vo_hbm,
         m_ref, l_ref, acc_ref, kslab, vslab, sem) = refs
    else:
        q_ref, k_hbm, v_hbm, o_ref, m_ref, l_ref, acc_ref = refs
    # SPB slots share one program: the ~5-8 us Mosaic per-program fixed cost
    # (CLAUDE.md rule 12) is paid B/SPB times instead of B — at B=32 that
    # cost alone matched XLA's full-allocation attention.  The inner pipeline
    # covers (slot-in-group, block); per-slot block counts stay dynamic via
    # index-map clamping (a past-live step re-addresses the slot's last live
    # block, which the scheduler already holds — no HBM traffic — and skips
    # compute).
    b0 = pl.program_id(0) * SPB

    if fused:
        def valid(s):
            return jnp.logical_and(pos_ref[b0 + s] >= 0,
                                   pos_ref[b0 + s] < S_cap)

        def boundary(s):
            # the append position opens a fresh block: its slab lies OUTSIDE
            # every block the attention pipeline reads, so only these (1 in
            # bs/SLAB steps) pay an HBM slab read — all other appends copy
            # the slab out of the slot's last RESIDENT pipeline block, the
            # rows of which are the same HBM values (round-4: the constant
            # slab read was ~1/3 of the kernel's DMA at B=8, 1/2 at B=32)
            pos = pos_ref[b0 + s]
            return jnp.logical_and(
                valid(s), jnp.logical_and(pos % bs == 0, pos > 0)
            )

    # FUSED KV APPEND (round-4 overlap design): the append row lives at
    # position lengths-1 (the decode contract), so the attention pipeline
    # streams only lengths-1 cached rows and the new row is FOLDED
    # IN-REGISTER from its VMEM operand (one extra online-softmax update at
    # each slot's last pipeline step).  Nothing in the kernel reads the slab
    # RMW's result, so the whole write path overlaps the attention reads:
    # slab READS start here (phase 1), the merge + writeback run AFTER the
    # pipeline (phase 3) — the serial pre-pipeline read-wait/modify/
    # write-wait chain of the round-3 kernel (~12 us/layer at B=8, ~40 at
    # B=32) is off the critical path.
    if fused and has_scales:
        WSLAB = kslab.shape[-2]
        SC = ksslab.shape[-1]

        def word_of(s):
            pos = pos_ref[b0 + s]
            return jnp.where(pos < S_cap, jnp.maximum(pos, 0), 0) // 4

        def wslab_slice(s):
            start = pl.multiple_of((word_of(s) // WSLAB) * WSLAB, WSLAB)
            lead = (li_ref[0],) if stacked else ()
            return lead + (b0 + s, slice(None), pl.ds(start, WSLAB),
                           slice(None))

        def sslab_slice(s):
            start = pl.multiple_of((word_of(s) // SC) * SC, SC)
            lead = (li_ref[0],) if stacked else ()
            return lead + (b0 + s, slice(None), slice(None),
                           pl.ds(start, SC))

        for s in range(SPB):
            @pl.when(boundary(s))
            def _(s=s):
                wsl = wslab_slice(s)
                pltpu.make_async_copy(
                    k_hbm.at[wsl], kslab.at[s], sem.at[s, 0]).start()
                pltpu.make_async_copy(
                    v_hbm.at[wsl], vslab.at[s], sem.at[s, 1]).start()

            if not scales_res:
                @pl.when(valid(s))
                def _(s=s):
                    ssl = sslab_slice(s)
                    pltpu.make_async_copy(
                        ks_hbm.at[ssl], ksslab.at[s], sem.at[s, 2]).start()
                    pltpu.make_async_copy(
                        vs_hbm.at[ssl], vsslab.at[s], sem.at[s, 3]).start()

    elif fused:
        # dense cache: slab-row-aligned RMW (single rows can't address HBM's
        # (8, 128) tiling); reads start here, merge + writeback after the
        # pipeline (see the overlap note above).
        SLAB = kslab.shape[-2]

        def slab_slice(s):
            pos = pos_ref[b0 + s]
            safe = jnp.where(pos < S_cap, jnp.maximum(pos, 0), 0)
            start = pl.multiple_of((safe // SLAB) * SLAB, SLAB)
            lead = (li_ref[0],) if stacked else ()
            return lead + (b0 + s, slice(None), pl.ds(start, SLAB),
                           slice(None))

        for s in range(SPB):
            @pl.when(boundary(s))
            def _(s=s):
                sl = slab_slice(s)
                pltpu.make_async_copy(
                    k_hbm.at[sl], kslab.at[s], sem.at[s, 0]).start()
                pltpu.make_async_copy(
                    v_hbm.at[sl], vslab.at[s], sem.at[s, 1]).start()

    G = _pick_group(Hkv)
    n_grp = Hkv // G
    bw = bs // 4
    rows = bw if has_scales else bs

    def eff_len(s):
        """Rows the pipeline streams for slot s: a valid append row (always
        at position lengths-1, the decode contract) is folded in-register
        instead of read back, so it never counts."""
        le = lens_ref[b0 + s]
        if fused:
            le = le - valid(s).astype(jnp.int32)
        return le

    def lo_of(s):
        """Sliding window: first attended position, max(0, length - W).  The
        pipeline starts at its block (see ``blk_of``); the first block's
        sub-window rows mask out in the bodies."""
        if not window:
            return jnp.int32(0)
        return jnp.maximum(lens_ref[b0 + s] - window, 0)

    def lo_blk(s):
        return lo_of(s) // bs if window else jnp.int32(0)

    def n_live_blocks(s):
        """Pipeline steps that carry compute for slot s (may be 0)."""
        return (eff_len(s) + bs - 1) // bs - lo_blk(s)

    def new_scale_row(s, ref):
        """Row b0+s of a (B, Hkv) new-scale array via one-hot reduce (a
        (1, Hkv) block violates Mosaic's sublane rule; dynamic sublane
        indices must be 8-aligned)."""
        onehot_b = (jax.lax.broadcasted_iota(
            jnp.int32, ref.shape, 0) == b0 + s).astype(jnp.float32)
        return jnp.sum(ref[...].astype(jnp.float32) * onehot_b, axis=0)

    def fold_new_row(s):
        """One extra online-softmax update from the VMEM-resident append row
        (bit-identical inputs to reading the written row back: the operands
        ARE what the RMW stores)."""
        if has_scales:
            ksn = new_scale_row(s, ksn_ref)  # (Hkv,)
            vsn = new_scale_row(s, vsn_ref)
            kn = (kn_ref[s].astype(jnp.float32) - 128.0) * ksn[:, None]
            vn = (vn_ref[s].astype(jnp.float32) - 128.0) * vsn[:, None]
        else:
            kn = kn_ref[s].astype(jnp.float32)  # (Hkv, D)
            vn = vn_ref[s].astype(jnp.float32)
        for r in range(rep):
            qr = q_ref[s][:, r, :].astype(jnp.float32)  # (Hkv, D)
            sc = jnp.sum(qr * kn, axis=1, keepdims=True) * scale  # (Hkv, 1)
            m_prev = m_ref[r]
            m_new = jnp.maximum(m_prev, sc)
            m_ref[r] = m_new
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(sc - m_new)
            l_ref[r] = l_ref[r] * alpha + p
            acc_ref[r] = acc_ref[r] * alpha + p * vn

    nmax = jnp.int32(1)
    for s in range(SPB):
        nmax = jnp.maximum(nmax, n_live_blocks(s))
    # own-head lane segments of a (G, G*rows) cross-product block
    seg = jax.lax.broadcasted_iota(jnp.int32, (G, G * rows), 1) // rows
    row_i = jax.lax.broadcasted_iota(jnp.int32, (G, G * rows), 0)
    own = seg == row_i

    def fold_own(sx):
        """Sum the own-head lane segments of a (G, G*rows) cross block into
        (G, rows) — static tile-aligned slices, no reshape/relayout."""
        sxm = jnp.where(own, sx, 0.0)
        out = sxm[:, 0:rows]
        for h2 in range(1, G):
            out = out + sxm[:, h2 * rows : (h2 + 1) * rows]
        return out

    def expand_own(p):
        """(G, rows) probabilities -> (G, G*rows) with row h live only in its
        own-head lane segment (zeros kill the cross terms in the p·v dot)."""
        pt = jnp.concatenate([p] * G, axis=1)
        return jnp.where(own, pt, 0.0)

    def update(r, sl, scores, alpha_to=None):
        m_prev = m_ref[r, sl]  # (G, 1)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        m_ref[r, sl] = m_new
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[r, sl] = l_ref[r, sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
        return p, alpha

    def start_slot():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def finalize(s, length):
        for r in range(rep):
            denom = jnp.maximum(l_ref[r], 1e-30)
            out = (acc_ref[r] / denom).astype(o_ref.dtype)
            # a length-0 slot still runs one (clamped) block of garbage rows
            # with all scores NEG_INF -> p = 1; match the v1 kernel's
            # zeros-for-empty-slot semantics instead
            o_ref[s, :, r, :] = jnp.where(length > 0, out, jnp.zeros_like(out))

    def split_pid():
        """Flattened inner grid (SPB * nmax,) -> (slot-in-group, block)."""
        pid = pl.program_id(0)
        return pid // nmax, pid % nmax

    def copy_slab_from_resident(s, i, k_blk, v_blk):
        """Fill the append slab from the slot's last RESIDENT pipeline block
        (same HBM values the phase-1 read would fetch, already in VMEM) —
        only block-boundary appends (see ``boundary``) read HBM."""
        if not fused:
            return
        SLB = kslab.shape[-2]
        rows_per_blk = bw if has_scales else bs  # block rows along S(/4)

        @pl.when(jnp.logical_and(
            i == nmax - 1,
            jnp.logical_and(valid(s), jnp.logical_not(boundary(s))),
        ))
        def _():
            pos = pos_ref[b0 + s]
            r = pos // 4 if has_scales else pos  # row on the S(/4) axis
            nl = jnp.maximum((eff_len(s) + bs - 1) // bs, 1)
            off = (r // SLB) * SLB - (nl - 1) * rows_per_blk
            off = pl.multiple_of(off, SLB)
            kslab[s] = k_blk[:, pl.ds(off, SLB), :]
            vslab[s] = v_blk[:, pl.ds(off, SLB), :]

    def maybe_fold_then_finalize(s, i):
        @pl.when(i == nmax - 1)
        def _():
            if fused:
                @pl.when(valid(s))
                def _():
                    fold_new_row(s)
            finalize(s, lens_ref[b0 + s])  # zero-check on the FULL length

    def body_bf16(k_blk, v_blk):
        s, i = split_pid()
        length = eff_len(s)

        @pl.when(i == 0)
        def _():
            start_slot()

        @pl.when(i < n_live_blocks(s))
        def _():
            qf = q_ref[s]  # (Hkv, rep, D) bf16: MXU eats it directly
            base = (lo_blk(s) + i) * bs
            pos = base + jax.lax.broadcasted_iota(jnp.int32, (G, bs), 1)
            live = pos < length
            if window:
                live = jnp.logical_and(live, pos >= lo_of(s))
            for g in range(n_grp):
                sl = slice(g * G, (g + 1) * G)
                k2 = k_blk[sl].reshape(G * bs, D)  # contiguous leading merge
                v2 = v_blk[sl].reshape(G * bs, D)
                for r in range(rep):
                    qg = qf[sl, r, :]  # (G, D) bf16
                    sx = jax.lax.dot_general(
                        qg, k2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (G, G*bs)
                    scores = fold_own(sx) * scale
                    scores = jnp.where(live, scores, NEG_INF)
                    p, alpha = update(r, sl, scores)
                    pX = expand_own(p).astype(v2.dtype)
                    pv = jax.lax.dot_general(
                        pX, v2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (G, D)
                    acc_ref[r, sl] = acc_ref[r, sl] * alpha + pv

        copy_slab_from_resident(s, i, k_blk, v_blk)
        maybe_fold_then_finalize(s, i)

    def field(wg, j):
        """Byte stream j of biased words, in place at bit offset 8j (exact in
        f32; the 2^-8j descale folds into the scale rows).  The top byte uses
        a logical shift — already descaled AND mask-free."""
        if j == 3:
            return jax.lax.shift_right_logical(wg, 24).astype(jnp.float32)
        return (wg & (255 << (8 * j))).astype(jnp.float32)

    def inv_j(j):
        return 1.0 if j == 3 else float(2.0 ** (-8 * j))

    def body_int8(k_blk, v_blk, ks_blk=None, vs_blk=None):
        s, i = split_pid()
        length = eff_len(s)

        @pl.when(i == 0)
        def _():
            start_slot()

        @pl.when(i < n_live_blocks(s))
        def _():
            if scales_res:
                # scale arrays ride as VMEM-resident (SPB, 4, Hkv, S/4)
                # operand blocks (their bw < 128 minor can't slice through
                # the pipeline; S == bs so block i == the whole slot)
                ksb = ks_hbm[s].astype(jnp.float32)  # (4, Hkv, bw)
                vsb = vs_hbm[s].astype(jnp.float32)
            else:
                ksb = ks_blk[...].astype(jnp.float32)
                vsb = vs_blk[...].astype(jnp.float32)
            qf = q_ref[s].astype(jnp.float32)  # (Hkv, rep, D)
            qsum128 = 128.0 * jnp.sum(qf, axis=2, keepdims=True)  # (Hkv, rep, 1)
            # j-concatenated (G, 4*bw) score lanes: l = j*bw+w -> pos base+4w+j
            base = (lo_blk(s) + i) * bs
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 4 * bw), 1)
            pos = base + 4 * (l_iota % bw) + l_iota // bw
            live = pos < length
            if window:
                live = jnp.logical_and(live, pos >= lo_of(s))
            for g in range(n_grp):
                sl = slice(g * G, (g + 1) * G)
                kg = k_blk[sl]  # (G, bw, D) int32 words
                vg = v_blk[sl]
                for r in range(rep):
                    qg = qf[sl, r, :]  # (G, D) f32
                    qs_g = qsum128[sl, r]  # (G, 1)
                    parts = []
                    for j in range(4):
                        k2 = field(kg, j).reshape(G * bw, D)
                        sx = jax.lax.dot_general(
                            qg, k2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        su = fold_own(sx)  # (G, bw) = sum u·q·2^8j
                        ksj = ksb[j, sl, :]
                        parts.append(ksj * (su * inv_j(j) - qs_g) * scale)
                    scores = jnp.concatenate(parts, axis=1)  # (G, 4*bw)
                    scores = jnp.where(live, scores, NEG_INF)
                    p, alpha = update(r, sl, scores)
                    pv = None
                    for j in range(4):
                        v2 = field(vg, j).reshape(G * bw, D)
                        vsj = vsb[j, sl, :]
                        pe = p[:, j * bw : (j + 1) * bw] * vsj  # (G, bw)
                        pX = expand_own(pe * inv_j(j))
                        dv = jax.lax.dot_general(
                            pX, v2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        dvj = dv - 128.0 * jnp.sum(pe, axis=1, keepdims=True)
                        pv = dvj if pv is None else pv + dvj
                    acc_ref[r, sl] = acc_ref[r, sl] * alpha + pv

        copy_slab_from_resident(s, i, k_blk, v_blk)
        maybe_fold_then_finalize(s, i)

    def blk_of(s, i):
        """Block index for slot s at pipeline step i: the window's first
        block plus i, clamped to the slot's last live block — past-live
        steps re-address the resident block (no HBM traffic) and the body
        skips their compute; blocks a sliding window excludes never fetch."""
        nl = jnp.maximum((eff_len(s) + bs - 1) // bs, 1)
        return jnp.minimum(lo_blk(s) + i, nl - 1)

    def si(pid):
        return pid // nmax, pid % nmax

    def page_of(s, i):
        return jnp.maximum(tbl_ref[(b0 + s) * P + blk_of(s, i)], 0)

    def kv_idx(pid):
        s, i = si(pid)
        if paged:
            idx = (page_of(s, i), 0, 0, 0)
        else:
            idx = (b0 + s, 0, blk_of(s, i), 0)
        return ((li_ref[0],) + idx) if stacked else idx

    def sc_idx(pid):
        s, i = si(pid)
        if paged:
            idx = (page_of(s, i), 0, 0, 0)
        else:
            idx = (b0 + s, 0, 0, blk_of(s, i))
        return ((li_ref[0],) + idx) if stacked else idx

    lead = (None, None) if stacked else (None,)
    if has_scales and scales_res:
        kv_spec = pl.BlockSpec(lead + (Hkv, bw, D), kv_idx)
        pltpu.emit_pipeline(
            body_int8, grid=(SPB * nmax,), in_specs=[kv_spec, kv_spec],
        )(k_hbm, v_hbm)
    elif has_scales:
        kv_spec = pl.BlockSpec(lead + (Hkv, bw, D), kv_idx)
        sc_spec = pl.BlockSpec(lead + (4, Hkv, bw), sc_idx)
        pltpu.emit_pipeline(
            body_int8, grid=(SPB * nmax,),
            in_specs=[kv_spec, kv_spec, sc_spec, sc_spec],
        )(k_hbm, v_hbm, ks_hbm, vs_hbm)
    else:
        kv_spec = pl.BlockSpec(lead + (Hkv, bs, D), kv_idx)
        pltpu.emit_pipeline(
            body_bf16, grid=(SPB * nmax,), in_specs=[kv_spec, kv_spec]
        )(k_hbm, v_hbm)

    # phase 3 (fused append): the pipeline's reads are all complete, so the
    # slab merge + writeback can touch the aliased cache freely; the only
    # serial tail is the merge VPU work + the write DMA itself.
    if fused and has_scales:
        kn_all = kn_ref[...]  # (SPB, Hkv, D) int32 biased bytes (1..255)
        vn_all = vn_ref[...]
        if scales_res:
            # scale in/outputs are grid-blocked VMEM (whole-slot chunks,
            # written back by Mosaic like kv_append's aliased blocks — a
            # DMA from a sub-128-lane scratch slice is illegal); EVERY slot
            # writes its block: invalid slots copy old values through.
            sshape = ks_hbm.shape[1:]  # (4, Hkv, Sw)
            for s in range(SPB):
                pos = pos_ref[b0 + s]
                hit_s = jnp.logical_and(
                    jax.lax.broadcasted_iota(jnp.int32, sshape, 0) == pos % 4,
                    jax.lax.broadcasted_iota(
                        jnp.int32, sshape, 2) == word_of(s) % SC,
                )
                hit_s = jnp.logical_and(hit_s, valid(s))
                ksn = new_scale_row(s, ksn_ref)  # (Hkv,)
                vsn = new_scale_row(s, vsn_ref)
                kso_hbm[s] = jnp.where(
                    hit_s, ksn[None, :, None].astype(ks_hbm.dtype), ks_hbm[s])
                vso_hbm[s] = jnp.where(
                    hit_s, vsn[None, :, None].astype(vs_hbm.dtype), vs_hbm[s])
        for s in range(SPB):
            @pl.when(boundary(s))
            def _(s=s):  # non-boundary slabs were copied from resident blocks
                wsl = wslab_slice(s)
                pltpu.make_async_copy(
                    k_hbm.at[wsl], kslab.at[s], sem.at[s, 0]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[wsl], vslab.at[s], sem.at[s, 1]).wait()

            @pl.when(valid(s))
            def _(s=s):
                wsl, ssl = wslab_slice(s), sslab_slice(s)
                if not scales_res:
                    pltpu.make_async_copy(
                        ks_hbm.at[ssl], ksslab.at[s], sem.at[s, 2]).wait()
                    pltpu.make_async_copy(
                        vs_hbm.at[ssl], vsslab.at[s], sem.at[s, 3]).wait()
                pos = pos_ref[b0 + s]
                w = word_of(s)
                sh = (pos % 4) * 8
                keep = ~(255 << sh)
                hit_w = jax.lax.broadcasted_iota(
                    jnp.int32, kslab.shape[1:], 1) == w % WSLAB
                kslab[s] = jnp.where(
                    hit_w,
                    (kslab[s] & keep) | ((kn_all[s][:, None, :] & 255) << sh),
                    kslab[s])
                vslab[s] = jnp.where(
                    hit_w,
                    (vslab[s] & keep) | ((vn_all[s][:, None, :] & 255) << sh),
                    vslab[s])
                if not scales_res:
                    ksn = new_scale_row(s, ksn_ref)  # (Hkv,)
                    vsn = new_scale_row(s, vsn_ref)
                    hit_s = jnp.logical_and(
                        jax.lax.broadcasted_iota(
                            jnp.int32, ksslab.shape[1:], 0) == pos % 4,
                        jax.lax.broadcasted_iota(
                            jnp.int32, ksslab.shape[1:], 2) == w % SC,
                    )
                    ksslab[s] = jnp.where(
                        hit_s, ksn[None, :, None].astype(ksslab.dtype),
                        ksslab[s])
                    vsslab[s] = jnp.where(
                        hit_s, vsn[None, :, None].astype(vsslab.dtype),
                        vsslab[s])
                pltpu.make_async_copy(
                    kslab.at[s], ko_hbm.at[wsl], sem.at[s, 0]).start()
                pltpu.make_async_copy(
                    vslab.at[s], vo_hbm.at[wsl], sem.at[s, 1]).start()
                if not scales_res:
                    pltpu.make_async_copy(
                        ksslab.at[s], kso_hbm.at[ssl], sem.at[s, 2]).start()
                    pltpu.make_async_copy(
                        vsslab.at[s], vso_hbm.at[ssl], sem.at[s, 3]).start()

        for s in range(SPB):
            @pl.when(valid(s))
            def _(s=s):
                wsl, ssl = wslab_slice(s), sslab_slice(s)
                pltpu.make_async_copy(
                    kslab.at[s], ko_hbm.at[wsl], sem.at[s, 0]).wait()
                pltpu.make_async_copy(
                    vslab.at[s], vo_hbm.at[wsl], sem.at[s, 1]).wait()
                if not scales_res:
                    pltpu.make_async_copy(
                        ksslab.at[s], kso_hbm.at[ssl], sem.at[s, 2]).wait()
                    pltpu.make_async_copy(
                        vsslab.at[s], vso_hbm.at[ssl], sem.at[s, 3]).wait()

    elif fused:
        kn_all = kn_ref[...]  # (SPB, Hkv, D) new rows, already in VMEM
        vn_all = vn_ref[...]
        for s in range(SPB):
            @pl.when(boundary(s))
            def _(s=s):  # non-boundary slabs were copied from resident blocks
                sl = slab_slice(s)
                pltpu.make_async_copy(
                    k_hbm.at[sl], kslab.at[s], sem.at[s, 0]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[sl], vslab.at[s], sem.at[s, 1]).wait()

            @pl.when(valid(s))
            def _(s=s):
                sl = slab_slice(s)
                row = pos_ref[b0 + s] % SLAB
                hit = jax.lax.broadcasted_iota(
                    jnp.int32, kslab.shape[1:], 1) == row
                kslab[s] = jnp.where(hit, kn_all[s][:, None, :], kslab[s])
                vslab[s] = jnp.where(hit, vn_all[s][:, None, :], vslab[s])
                pltpu.make_async_copy(
                    kslab.at[s], ko_hbm.at[sl], sem.at[s, 0]).start()
                pltpu.make_async_copy(
                    vslab.at[s], vo_hbm.at[sl], sem.at[s, 1]).start()

        for s in range(SPB):
            @pl.when(valid(s))
            def _(s=s):
                sl = slab_slice(s)
                pltpu.make_async_copy(
                    kslab.at[s], ko_hbm.at[sl], sem.at[s, 0]).wait()
                pltpu.make_async_copy(
                    vslab.at[s], vo_hbm.at[sl], sem.at[s, 1]).wait()


def _decode_attention_v2(q4, k, v, lengths, bs, rep, Hkv, D,
                         layer_idx, page_table, k_scale=None, v_scale=None,
                         kv_new=None, window=None):
    """pallas_call wrapper for :func:`_kernel_v2` (real TPU only).

    ``kv_new``: write the new rows into the (aliased) cache inside the SAME
    kernel before attending — replaces a separate kv_append call.  Dense
    caches take ``(k_new [B,Hkv,D], v_new, positions [B])`` and return
    ``(out, k, v)``; packed int8 caches (``k_scale`` set) take
    ``(kq [B,Hkv,D] biased int32, vq, ks_new [B,Hkv], vs_new, positions)``
    and return ``(out, k, v, k_scale, v_scale)``."""
    B = q4.shape[0]
    # slots per program: the largest power of two (<= 8) dividing B — fewer
    # Mosaic programs amortize the ~5-8 us per-program fixed cost that
    # dominated at large B (B=32 paid it 32x per layer)
    SPB = next(c for c in (8, 4, 2, 1) if B % c == 0)
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
    fused = kv_new is not None
    if fused:
        assert not paged, "fused append: dense or packed-int8, not paged"
        if has_scales:
            kq_n, vq_n, ksn, vsn, positions = kv_new
        else:
            k_new, v_new, positions = kv_new
        args.append(positions.astype(jnp.int32))
        n_prefetch += 1
    q_index = (lambda g, *_: (g, 0, 0, 0))
    S_cap = k.shape[-2] * (4 if has_scales else 1)
    # scale arrays whose bw < 128 minor cannot slice through the inner
    # pipeline instead ride as VMEM-resident grid blocks (requires a single
    # block per slot, S == bs — the dispatch guarantees it); this is what
    # lets small-S (< 512) int8 caches use the v2 kernel at all
    scales_res = has_scales and (bs // 4) % 128 != 0
    if scales_res:
        assert not paged and k.shape[-2] * 4 == bs
    operands = [q4, k, v] + ([k_scale, v_scale] if has_scales else [])
    in_specs = (
        [pl.BlockSpec((SPB, Hkv, rep, D), q_index, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (len(operands) - 1)
    )
    if fused:
        # pin the cache operands to HBM: with ANY a small cache can land
        # VMEM-resident, where the slab DMA's dynamic slicing hits Mosaic's
        # packed-tile limits; HBM slab DMAs at SLAB-aligned offsets are legal
        hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        for i in range(1, len(operands)):
            in_specs[i] = hbm
    if scales_res:
        Sw = k.shape[-2]
        # prefetch-arg order at this level: lens[, li][, pos] (paged is
        # excluded above, so li — when stacked — is always rest[0])
        sc_block = pl.BlockSpec(
            ((SPB,) if layer_idx is None else (None, SPB)) + (4, Hkv, Sw),
            (lambda g, *_: (g, 0, 0, 0)) if layer_idx is None
            else (lambda g, lens, *rest: (rest[0][0], g, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        in_specs[3] = sc_block
        in_specs[4] = sc_block
    out_shape = jax.ShapeDtypeStruct((B, Hkv, rep, D), q4.dtype)
    out_specs = pl.BlockSpec((SPB, Hkv, rep, D), q_index,
                             memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((rep, Hkv, 1), jnp.float32),
        pltpu.VMEM((rep, Hkv, 1), jnp.float32),
        pltpu.VMEM((rep, Hkv, D), jnp.float32),
    ]
    alias = {}
    if fused and has_scales:
        Sw = k.shape[-2]
        sc_lanes = min(128, Sw)  # scale-chunk width along S/4
        operands += [kq_n.reshape(B, Hkv, D).astype(jnp.int32),
                     vq_n.reshape(B, Hkv, D).astype(jnp.int32),
                     ksn.reshape(B, Hkv).astype(k_scale.dtype),
                     vsn.reshape(B, Hkv).astype(v_scale.dtype)]
        kn_index = (lambda g, *_: (g, 0, 0))
        in_specs += [pl.BlockSpec((SPB, Hkv, D), kn_index,
                                  memory_space=pltpu.VMEM)] * 2
        # whole-array blocks: a (1, Hkv) block violates Mosaic's sublane rule
        in_specs += [pl.BlockSpec((B, Hkv), lambda g, *_: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [out_shape] + [
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (k, v, k_scale, v_scale)
        ]
        hbm_o = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        # resident scales write back as grid blocks (same spec as their
        # aliased inputs, the kv_append pattern) — a sub-128-lane scratch
        # DMA is illegal on the padded VMEM tile
        sc_out = sc_block if scales_res else hbm_o
        out_specs = [out_specs, hbm_o, hbm_o, sc_out, sc_out]
        scratch += [
            pltpu.VMEM((SPB, Hkv, 8, D), jnp.int32),  # 8 = int32 sublane tile
            pltpu.VMEM((SPB, Hkv, 8, D), jnp.int32),
            pltpu.VMEM((SPB, 4, Hkv, sc_lanes), k_scale.dtype),
            pltpu.VMEM((SPB, 4, Hkv, sc_lanes), v_scale.dtype),
            pltpu.SemaphoreType.DMA((SPB, 4)),
        ]
        # aliases index ALL call operands (scalar-prefetch included):
        # k/v/ks/vs sit right after q at n_prefetch + 1 .. + 4
        alias = {n_prefetch + i: i for i in (1, 2, 3, 4)}
    elif fused:
        slab_rows = 32 // jnp.dtype(k.dtype).itemsize  # HBM sublane tile
        operands += [k_new.reshape(B, Hkv, D).astype(k.dtype),
                     v_new.reshape(B, Hkv, D).astype(v.dtype)]
        kn_index = (lambda g, *_: (g, 0, 0))
        in_specs += [pl.BlockSpec((SPB, Hkv, D), kn_index,
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct(k.shape, k.dtype),
                     jax.ShapeDtypeStruct(v.shape, v.dtype)]
        out_specs = [out_specs,
                     pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                     pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        scratch += [
            pltpu.VMEM((SPB, Hkv, slab_rows, D), k.dtype),
            pltpu.VMEM((SPB, Hkv, slab_rows, D), v.dtype),
            pltpu.SemaphoreType.DMA((SPB, 2)),
        ]
        # aliases index ALL call operands (scalar-prefetch included):
        # k/v sit right after q at n_prefetch + 1 / + 2
        alias = {n_prefetch + 1: 1, n_prefetch + 2: 2}
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, bs, rep, Hkv, D, D ** -0.5, stacked, paged, P,
            has_scales, SPB, fused, S_cap, scales_res, window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(B // SPB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*args, *operands)
    return out


def _append_dense_fallback(k, v, kv_new, layer_idx, interpret):
    """Apply the kv_new row writes separately (paths without the fused v2
    kernel).  Stacked caches reuse the aliased kv_append kernel; flat ones
    scatter (drop semantics for positions >= S, like the fused path)."""
    k_new, v_new, positions = kv_new
    if layer_idx is not None:
        from xbitops_tpu.kernels.kv_append import kv_append_dense

        return kv_append_dense(
            k, v, k_new, v_new, positions, layer_idx, interpret=interpret
        )
    B, Hkv, S, _ = k.shape
    pos = jnp.where(positions < 0, S, positions)  # positive OOB drops
    idx = (
        jnp.arange(B)[:, None, None],
        jnp.arange(Hkv)[None, :, None],
        pos[:, None, None],
    )
    k = k.at[idx].set(k_new[:, :, None, :].astype(k.dtype), mode="drop")
    v = v.at[idx].set(v_new[:, :, None, :].astype(v.dtype), mode="drop")
    return k, v


def _append_packed_fallback(k, v, ks, vs, kv_new, layer_idx, interpret):
    """Apply the packed-int8 kv_new writes separately (paths without the
    fused v2 kernel) via the aliased kv_append kernel; flat caches ride a
    temporary leading layer axis."""
    from xbitops_tpu.kernels.kv_append import kv_append_packed

    kq, vq, ksn, vsn, positions = kv_new
    if layer_idx is None:
        k4, v4, ks4, vs4 = kv_append_packed(
            k[None], v[None], ks[None], vs[None],
            kq, vq, ksn, vsn, positions, jnp.int32(0), interpret=interpret,
        )
        return k4[0], v4[0], ks4[0], vs4[0]
    return kv_append_packed(
        k, v, ks, vs, kq, vq, ksn, vsn, positions, layer_idx,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("block_s", "interpret", "window"))
def decode_attention(
    q: jax.Array,  # [B, H, D]
    k: jax.Array,  # [B, Hkv, S, D]  (or [L, B, Hkv, S, D] with layer_idx)
    v: jax.Array,  # like k
    lengths: jax.Array,  # int32 [B] — live positions per slot (attend s < len)
    block_s: Optional[int] = None,
    interpret: Optional[bool] = None,
    layer_idx: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,  # [(L,) B, 4, Hkv, S/4]: int8 cache
    v_scale: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,  # int32 [B, P]: paged pool cache
    kv_new=None,  # (k_new [B,Hkv,D], v_new, positions [B]): fused append
    window: Optional[int] = None,  # sliding window: attend [len-W, len) only
) -> jax.Array:
    """Softmax(q k^T / sqrt(D)) v over each slot's first ``lengths[b]`` cache
    positions; returns [B, H, D].  HBM reads scale with ``lengths``, not S.

    ``window`` (sliding-window attention, Mistral semantics): attend only
    positions ``[max(0, lengths[b] - window), lengths[b])``.  Both kernels
    start each slot's block iteration at the window's first block — HBM
    reads then scale with ``min(lengths, window)`` — and mask the first
    block's sub-window rows; a fused-append new row (position lengths-1) is
    always inside the window.

    ``kv_new``: write the new rows at ``positions`` into the cache in the
    SAME kernel (aliased in place) before attending, replacing a separate
    ``kv_append_dense``/``kv_append_packed`` call and its per-layer fixed
    cost; positions >= S write nothing.  Dense caches (stacked or not) take
    ``(k_new [B,Hkv,D], v_new, positions)`` and return ``(out, k, v)``;
    packed int8 caches (``k_scale`` set) take ``(kq [B,Hkv,D] biased int32,
    vq, ks_new [B,Hkv], vs_new, positions)`` and return
    ``(out, k, v, k_scale, v_scale)``.  Paths that can't run the fused
    kernel (CPU interpret, odd shapes) apply the append separately first —
    semantics are identical everywhere.

    With ``k_scale``/``v_scale`` the cache is the biased packed int8 layout
    (``models.llama.KVCache`` quantized: words [.., Hkv, S/4, D], byte j of
    word w = position 4w+j stored as value+128) and blocks dequantize
    in-register — half the DMA bytes of the bf16 cache.

    With ``page_table`` the k/v operands are page POOLS
    ``[(L,) n_pages, Hkv, psz(/4), D]`` and grid step ``s`` of slot ``b``
    streams pool page ``page_table[b, s]`` — the indirection lives entirely
    in the scalar-prefetch-driven index maps.  Composes with the int8 cache
    (scale pools ``[(L,) n_pages, 4, Hkv, psz/4]``).
    """
    if interpret is None:
        interpret = common.interpret_default()
    stacked = layer_idx is not None
    has_scales = k_scale is not None
    paged = page_table is not None
    B, H, D = q.shape
    pack = 4 if has_scales else 1
    Hkv = k.shape[-3]
    if paged:
        psz = k.shape[-2] * pack
        P = page_table.shape[1]
        S = P * psz
        bs = psz
        n_blocks = P
    else:
        S = k.shape[-2] * pack
        # default block: 512 positions for packed words (the pipelined scale
        # blocks' 128-lane minimum, 2 MB/block); 128 for bf16 — block
        # granularity rounds every slot's reads UP to a block, and serving
        # lives at short-to-mid lengths where a 256-row block doubled the
        # read bytes (measured round 4: S=256 live<=120 serving paid ~1.3
        # ms/step extra at B=32).  At long context the waste is the tail
        # block only (<=3% at live=1000) and finer blocks pipeline the same.
        bs = min(block_s or (512 if has_scales else 128), S)
        n_blocks = common.cdiv(S, bs)
    assert H % Hkv == 0
    if window is not None:
        assert window >= 1, "sliding window must be >= 1"
        if window >= S:
            # a window covering the whole allocation never binds: drop it
            # (identical program to the no-window path)
            window = None
    rep = H // Hkv
    # query head h*rep+r shares kv head h (jnp.repeat convention)
    q4 = q.reshape(B, Hkv, rep, D)
    bw = bs // pack  # word rows per block (int8)

    # real-TPU fast path: one program per slot, inner dynamic-grid pipeline
    # over its live blocks (emit_pipeline has no interpreter support).
    # int8 scale blocks (4, Hkv, bw) need bw % 128 == 0 to SLICE through the
    # pipeline (Mosaic rejects sub-128 minors; measured: dense int8 at S=128
    # failed to compile) — bs % 512 == 0, i.e. paged page_size % 512 or
    # dense S >= 512.  Smaller DENSE caches (S == bs, one block per slot)
    # still run v2 with the scale arrays as VMEM-resident grid blocks;
    # small paged pools take the v1 grid kernel.
    if kv_new is not None:
        assert not paged, "kv_new: dense or packed-int8 caches, not paged"
    v2_ok = not interpret and S % bs == 0 and (
        not has_scales or bw % 128 == 0 or (not paged and S == bs)
    )
    if kv_new is not None and not has_scales and S % (
        32 // jnp.dtype(k.dtype).itemsize
    ):
        v2_ok = False  # fused slab RMW needs S on HBM sublane-tile boundaries
    if v2_ok and kv_new is not None:
        outs = _decode_attention_v2(
            q4, k, v, lengths, bs, rep, Hkv, D, layer_idx, page_table,
            k_scale=k_scale, v_scale=v_scale, kv_new=kv_new, window=window,
        )
        return (outs[0].reshape(B, H, D),) + tuple(outs[1:])
    if kv_new is not None:
        # no fused kernel here (CPU interpret / odd shapes): append first,
        # then attend — identical semantics, two dispatches
        if has_scales:
            k, v, k_scale, v_scale = _append_packed_fallback(
                k, v, k_scale, v_scale, kv_new, layer_idx, interpret
            )
            out = decode_attention(
                q, k, v, lengths,
                block_s=block_s, interpret=interpret, layer_idx=layer_idx,
                k_scale=k_scale, v_scale=v_scale, window=window,
            )
            return out, k, v, k_scale, v_scale
        k, v = _append_dense_fallback(k, v, kv_new, layer_idx, interpret)
        out = decode_attention(
            q, k, v, lengths,
            block_s=block_s, interpret=interpret, layer_idx=layer_idx,
            window=window,
        )
        return out, k, v
    if v2_ok:
        out = _decode_attention_v2(
            q4, k, v, lengths, bs, rep, Hkv, D, layer_idx, page_table,
            k_scale=k_scale, v_scale=v_scale, window=window,
        )
        return out.reshape(B, H, D)

    def clamp(s, lens, b):
        # clamp past-length blocks to the last live block: same index ->
        # Mosaic reuses the already-resident block, no HBM traffic.  A
        # sliding window additionally RAISES early steps to its first block
        # (consecutive steps then share the index — one fetch), so windowed
        # reads never touch excluded blocks.
        last = jnp.maximum(lens[b] - 1, 0) // bs
        s_eff = s
        if window:
            lo_b = jnp.maximum(lens[b] - window, 0) // bs
            s_eff = jnp.maximum(s, lo_b)
        return jnp.minimum(s_eff, last)

    args = [lengths.astype(jnp.int32)]
    n_prefetch = 1
    if paged:
        args.append(page_table.astype(jnp.int32).reshape(-1))
        n_prefetch += 1
    if stacked:
        args.append(jnp.asarray(layer_idx, jnp.int32).reshape(1))
        n_prefetch += 1

    def kv_index(b, s, lens, *rest):
        if paged:
            tbl = rest[0]
            # clamped like `clamp`; unallocated entries only reach here for
            # length-0 slots whose programs skip compute — max() keeps the
            # DMA address valid
            pg = jnp.maximum(tbl[b * P + clamp(s, lens, b)], 0)
            idx = (pg, 0, 0, 0)
        else:
            idx = (b, 0, clamp(s, lens, b), 0)
        if stacked:
            li = rest[-1]
            idx = (li[0],) + idx
        return idx

    def sc_index(b, s, lens, *rest):
        if paged:
            tbl = rest[0]
            pg = jnp.maximum(tbl[b * P + clamp(s, lens, b)], 0)
            idx = (pg, 0, 0, 0)
        else:
            idx = (b, 0, 0, clamp(s, lens, b))
        if stacked:
            idx = (rest[-1][0],) + idx
        return idx

    def io_index(b, s, lens, *rest):
        return (b, 0, 0, 0)

    lead = (None, None) if stacked else (None,)
    kv_spec = pl.BlockSpec(lead + (Hkv, bw, D), kv_index,
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec(lead + (4, Hkv, bw), sc_index,
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, Hkv, rep, D), io_index, memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, Hkv, rep, D), io_index, memory_space=pltpu.VMEM)

    in_specs = [q_spec, kv_spec, kv_spec]
    call_args = args + [q4, k, v]
    if has_scales:
        in_specs += [sc_spec, sc_spec]
        call_args += [k_scale, v_scale]

    out = pl.pallas_call(
        functools.partial(
            _kernel, bs, rep, Hkv, D, D ** -0.5, stacked, has_scales, paged,
            window,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(B, n_blocks),
            in_specs=in_specs,
            out_specs=o_spec,
            scratch_shapes=[
                pltpu.VMEM((rep, Hkv, 1), jnp.float32),  # running max
                pltpu.VMEM((rep, Hkv, 1), jnp.float32),  # running denom
                pltpu.VMEM((rep, Hkv, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*call_args)
    return out.reshape(B, H, D)
