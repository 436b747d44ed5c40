"""One-command on-chip parity gate (``python bench.py --selfcheck``).

The emit_pipeline kernels (flash-decode v2) cannot run under interpret mode
(CLAUDE.md rule 9), so CPU CI never executes them; before this module their
on-chip parity lived only in a manual skill recipe.  Each check mirrors a CI
test's oracle at the reference's own tolerances (SURVEY §4) and runs on
whatever backend is active — on a real TPU the v2 kernels engage, on CPU the
same code degrades to the v1 paths (still a valid smoke run).

Role model: the reference embeds its verification in the bench drivers
(``/root/reference/src/cu/unpack_weight_2_to_7.cu:560-579``).
"""

from __future__ import annotations

import sys
import traceback
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _ref_att(q, k, v, lengths, window=None):
    B, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    kk = jnp.repeat(k, rep, axis=2).astype(jnp.float32)
    vv = jnp.repeat(v, rep, axis=2).astype(jnp.float32)
    logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32), kk) * (D ** -0.5)
    mask = jnp.arange(S)[None, None, :] < lengths[:, None, None]
    if window is not None:
        lo = jnp.maximum(lengths - window, 0)
        mask &= jnp.arange(S)[None, None, :] >= lo[:, None, None]
    p = jax.nn.softmax(jnp.where(mask, logits, -1e30), axis=-1)
    return jnp.einsum("bhs,bshd->bhd", p, vv)


def check_gemv() -> None:
    """Fused qmatmul (precise) vs f32 dequant reference — rel 1e-5/abs 3e-4
    (the reference's f32-accum tolerance, gemv_w4a16_c32.cu:421-422)."""
    import xbitops_tpu as xb
    from xbitops_tpu import formats

    key = jax.random.PRNGKey(0)
    K, N, M = 512, 512, 8
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.1
    a = jax.random.normal(jax.random.fold_in(key, 1), (M, K), jnp.float32) * 0.5
    for bits, g in ((4, 128), (8, 128), (3, 64)):
        qt = xb.quantize_array(w, bits, g)
        wd = formats.dequant_qtensor_reference(qt, out_dtype=jnp.float32)
        got = np.asarray(xb.qmatmul(a, qt, out_dtype=jnp.float32, precise=True))
        want = np.asarray(
            jnp.dot(a, wd, precision=jax.lax.Precision.HIGHEST)
        )
        err = np.abs(got - want).max()
        assert err < 3e-4, f"gemv {bits}b/g{g}: abs err {err}"


def check_dequant() -> None:
    """dequant op vs the jnp format reference — abs 1e-3 (reference DQ gate)."""
    import xbitops_tpu as xb
    from xbitops_tpu import formats

    rng = np.random.default_rng(3)
    K, N, g = 512, 256, 128
    for bits in (2, 4, 5, 8):
        w = (rng.standard_normal((K, N)) * 0.1).astype(np.float32)
        wq, scales, zeros = formats.quantize(w, bits, g)
        s16 = scales.astype(np.float16)
        qweight, _, qzeros = formats.gptq_pack(wq, s16, zeros, bits)
        got = np.asarray(
            xb.dequant(jnp.asarray(qweight), jnp.asarray(s16),
                       jnp.asarray(qzeros), g, bits, K)
        ).astype(np.float32)
        want = (wq.astype(np.float32) - zeros.repeat(g, 0)[:K]) * (
            s16.astype(np.float32).repeat(g, 0)[:K]
        )
        err = np.abs(got - want).max()
        assert err <= 1e-3, f"dequant {bits}b: abs err {err}"


def check_decode_attention() -> None:
    """Flash-decode sweep: dense, stacked, int8-packed, paged, paged+stacked,
    paged+int8 — on TPU these drive the v2 emit_pipeline kernels (which have
    no interpret support, so CPU CI cannot execute them)."""
    from xbitops_tpu.kernels.decode_attention import decode_attention
    from xbitops_tpu.kernels.kv_append import kv_append_packed
    from xbitops_tpu.models.llama import (
        _pack_kv_scales, _pack_kv_words, _quant_kv,
    )

    L, B, S, H, Hkv, D = 2, 4, 512, 8, 4, 128
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D), jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D), jnp.bfloat16) * 0.3
    kT = jnp.swapaxes(k, 1, 2)  # head-major (B, Hkv, S, D)
    vT = jnp.swapaxes(v, 1, 2)
    lengths = jnp.asarray([1, 200, 256, 512], jnp.int32)
    want = np.asarray(_ref_att(q, k, v, lengths))

    got = np.asarray(decode_attention(q, kT, vT, lengths, block_s=256), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3, err_msg="dense")

    got = np.asarray(
        decode_attention(q, jnp.stack([kT] * L), jnp.stack([vT] * L), lengths,
                         block_s=256, layer_idx=jnp.int32(1)),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3, err_msg="stacked")

    # FUSED APPEND: the kernel writes new rows at `positions` in place and
    # attends them (lengths include the new token); compare vs appending in
    # jnp first.  Covers flat and stacked, plus the >= S drop semantics.
    key2 = jax.random.fold_in(key, 9)
    kn = jax.random.normal(key2, (B, Hkv, D), jnp.bfloat16) * 0.3
    vn = jax.random.normal(jax.random.fold_in(key2, 1), (B, Hkv, D),
                           jnp.bfloat16) * 0.3
    positions = jnp.asarray([0, 199, 255, S], jnp.int32)  # last drops (>= S)
    lens2 = jnp.minimum(positions + 1, S)
    b_i = jnp.arange(B)[:, None, None]
    h_i = jnp.arange(Hkv)[None, :, None]
    kT2 = kT.at[(b_i, h_i, positions[:, None, None])].set(
        kn[:, :, None, :], mode="drop")
    vT2 = vT.at[(b_i, h_i, positions[:, None, None])].set(
        vn[:, :, None, :], mode="drop")
    want2 = np.asarray(_ref_att(
        q, jnp.swapaxes(kT2, 1, 2), jnp.swapaxes(vT2, 1, 2), lens2))
    got, k_upd, v_upd = decode_attention(
        q, kT, vT, lens2, block_s=256, kv_new=(kn, vn, positions))
    np.testing.assert_allclose(np.asarray(got, np.float32), want2,
                               rtol=5e-2, atol=5e-3, err_msg="fused")
    np.testing.assert_array_equal(
        np.asarray(k_upd), np.asarray(kT2), err_msg="fused k write")
    np.testing.assert_array_equal(
        np.asarray(v_upd), np.asarray(vT2), err_msg="fused v write")
    got, k_upd, _ = decode_attention(
        q, jnp.stack([kT] * L), jnp.stack([vT] * L), lens2, block_s=256,
        layer_idx=jnp.int32(1), kv_new=(kn, vn, positions))
    np.testing.assert_allclose(np.asarray(got, np.float32), want2,
                               rtol=5e-2, atol=5e-3, err_msg="fused stacked")
    np.testing.assert_array_equal(
        np.asarray(k_upd[1]), np.asarray(kT2), err_msg="fused stacked write")
    np.testing.assert_array_equal(
        np.asarray(k_upd[0]), np.asarray(kT), err_msg="other layer untouched")

    # packed biased int8 cache
    kq, kscl = _quant_kv(k.astype(jnp.float32))
    vq, vscl = _quant_kv(v.astype(jnp.float32))
    kw, vw = _pack_kv_words(kq), _pack_kv_words(vq)
    ks_p = _pack_kv_scales(kscl).astype(jnp.bfloat16)
    vs_p = _pack_kv_scales(vscl).astype(jnp.bfloat16)
    got = np.asarray(
        decode_attention(q, kw, vw, lengths, k_scale=ks_p, v_scale=vs_p),
        np.float32,
    )
    kd = ((kq - 128).astype(jnp.float32) * kscl[..., None]).astype(jnp.bfloat16)
    vd = ((vq - 128).astype(jnp.float32) * vscl[..., None]).astype(jnp.bfloat16)
    want_q = np.asarray(_ref_att(q, kd, vd, lengths))
    np.testing.assert_allclose(got, want_q, rtol=5e-2, atol=2e-2, err_msg="int8")

    # FUSED int8 APPEND: the kernel RMWs the new byte + scale in place and
    # attends them; oracle = the aliased kv_append_packed kernel (itself
    # gated by check_kv_append) followed by the plain int8 attention above.
    # Covers flat and stacked, plus the >= S drop semantics.
    kqn, ksn = _quant_kv(kn.astype(jnp.float32)[:, None])  # (B, 1, Hkv, *)
    vqn, vsn = _quant_kv(vn.astype(jnp.float32)[:, None])
    kv_new_q = (kqn[:, 0], vqn[:, 0], ksn[:, 0], vsn[:, 0], positions)
    wk, wv, wks, wvs = kv_append_packed(
        kw[None], vw[None], ks_p[None], vs_p[None], *kv_new_q, jnp.int32(0)
    )
    want_fq = np.asarray(
        decode_attention(q, wk[0], wv[0], lens2, k_scale=wks[0],
                         v_scale=wvs[0]),
        np.float32,
    )
    got, k_upd, v_upd, ks_upd, vs_upd = decode_attention(
        q, kw, vw, lens2, k_scale=ks_p, v_scale=vs_p, kv_new=kv_new_q)
    np.testing.assert_allclose(np.asarray(got, np.float32), want_fq,
                               rtol=5e-2, atol=2e-2, err_msg="fused int8")
    for g, w, nm in ((k_upd, wk[0], "k"), (v_upd, wv[0], "v"),
                     (ks_upd, wks[0], "ks"), (vs_upd, wvs[0], "vs")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w), err_msg=f"fused int8 {nm} write")
    got, k_upd, _, ks_upd, _ = decode_attention(
        q, jnp.stack([kw] * L), jnp.stack([vw] * L), lens2,
        layer_idx=jnp.int32(1), k_scale=jnp.stack([ks_p] * L),
        v_scale=jnp.stack([vs_p] * L), kv_new=kv_new_q)
    np.testing.assert_allclose(np.asarray(got, np.float32), want_fq,
                               rtol=5e-2, atol=2e-2,
                               err_msg="fused int8 stacked")
    np.testing.assert_array_equal(
        np.asarray(k_upd[1]), np.asarray(wk[0]),
        err_msg="fused int8 stacked write")
    np.testing.assert_array_equal(
        np.asarray(k_upd[0]), np.asarray(kw),
        err_msg="fused int8 other layer untouched")
    np.testing.assert_array_equal(
        np.asarray(ks_upd[1]), np.asarray(wks[0]),
        err_msg="fused int8 stacked scale write")

    # SMALL-S int8 (S=128 -> bw=32 < 128): scale arrays ride as VMEM-resident
    # grid blocks instead of pipelined slices (round-4 scales_res path; the
    # round-3 kernel rejected these shapes and fell back to v1).  Plain +
    # fused-append, flat + stacked.
    Ss = 128
    ks_small = ks_p[..., : Ss // 4]
    vs_small = vs_p[..., : Ss // 4]
    kw_small = kw[..., : Ss // 4, :]
    vw_small = vw[..., : Ss // 4, :]
    lengths_s = jnp.asarray([1, 60, 100, 128], jnp.int32)
    got = np.asarray(
        decode_attention(q, kw_small, vw_small, lengths_s,
                         k_scale=ks_small, v_scale=vs_small),
        np.float32,
    )
    want_qs = np.asarray(_ref_att(q, kd[:, :Ss], vd[:, :Ss], lengths_s))
    np.testing.assert_allclose(got, want_qs, rtol=5e-2, atol=2e-2,
                               err_msg="int8 small-S")
    pos_s = jnp.asarray([0, 59, 99, Ss], jnp.int32)  # last drops (>= S)
    lens_s2 = jnp.minimum(pos_s + 1, Ss)
    kv_new_s = (kqn[:, 0], vqn[:, 0], ksn[:, 0], vsn[:, 0], pos_s)
    wk_s, wv_s, wks_s, wvs_s = kv_append_packed(
        kw_small[None], vw_small[None], ks_small[None], vs_small[None],
        *kv_new_s, jnp.int32(0)
    )
    want_fs = np.asarray(
        decode_attention(q, wk_s[0], wv_s[0], lens_s2, k_scale=wks_s[0],
                         v_scale=wvs_s[0]),
        np.float32,
    )
    got, k_upd, v_upd, ks_upd, vs_upd = decode_attention(
        q, kw_small, vw_small, lens_s2, k_scale=ks_small, v_scale=vs_small,
        kv_new=kv_new_s)
    np.testing.assert_allclose(np.asarray(got, np.float32), want_fs,
                               rtol=5e-2, atol=2e-2,
                               err_msg="fused int8 small-S")
    for g, w, nm in ((k_upd, wk_s[0], "k"), (v_upd, wv_s[0], "v"),
                     (ks_upd, wks_s[0], "ks"), (vs_upd, wvs_s[0], "vs")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w),
            err_msg=f"fused int8 small-S {nm} write")
    got, k_upd, _, ks_upd, _ = decode_attention(
        q, jnp.stack([kw_small] * L), jnp.stack([vw_small] * L), lens_s2,
        layer_idx=jnp.int32(1), k_scale=jnp.stack([ks_small] * L),
        v_scale=jnp.stack([vs_small] * L), kv_new=kv_new_s)
    np.testing.assert_allclose(np.asarray(got, np.float32), want_fs,
                               rtol=5e-2, atol=2e-2,
                               err_msg="fused int8 small-S stacked")
    np.testing.assert_array_equal(
        np.asarray(k_upd[1]), np.asarray(wk_s[0]),
        err_msg="fused int8 small-S stacked write")
    np.testing.assert_array_equal(
        np.asarray(ks_upd[0]), np.asarray(ks_small),
        err_msg="fused int8 small-S other layer untouched")

    # paged (flat + stacked): identity page table, pool == dense cache
    psz = 256
    P = S // psz
    table = jnp.arange(B * P, dtype=jnp.int32).reshape(B, P)
    pool_k = kT.reshape(B, Hkv, P, psz, D).swapaxes(1, 2).reshape(B * P, Hkv, psz, D)
    pool_v = vT.reshape(B, Hkv, P, psz, D).swapaxes(1, 2).reshape(B * P, Hkv, psz, D)
    got = np.asarray(
        decode_attention(q, pool_k, pool_v, lengths, page_table=table), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3, err_msg="paged")
    got = np.asarray(
        decode_attention(
            q, jnp.stack([pool_k] * L), jnp.stack([pool_v] * L), lengths,
            page_table=table, layer_idx=jnp.int32(1),
        ),
        np.float32,
    )
    np.testing.assert_allclose(
        got, want, rtol=5e-2, atol=5e-3, err_msg="paged+stacked"
    )

    # paged + int8 combination (identity table)
    pszw = psz // 4
    pool_kw = kw.reshape(B, Hkv, P, pszw, D).swapaxes(1, 2).reshape(B * P, Hkv, pszw, D)
    pool_vw = vw.reshape(B, Hkv, P, pszw, D).swapaxes(1, 2).reshape(B * P, Hkv, pszw, D)
    pool_ks = ks_p.reshape(B, 4, Hkv, P, pszw)
    pool_ks = jnp.moveaxis(pool_ks, 3, 1).reshape(B * P, 4, Hkv, pszw)
    pool_vs = vs_p.reshape(B, 4, Hkv, P, pszw)
    pool_vs = jnp.moveaxis(pool_vs, 3, 1).reshape(B * P, 4, Hkv, pszw)
    got = np.asarray(
        decode_attention(
            q, pool_kw, pool_vw, lengths, page_table=table,
            k_scale=pool_ks, v_scale=pool_vs,
        ),
        np.float32,
    )
    np.testing.assert_allclose(
        got, want_q, rtol=5e-2, atol=2e-2, err_msg="paged+int8"
    )

    # SLIDING WINDOW (Mistral): the pipeline starts at each slot's window
    # block and masks the first block's sub-window rows.  Dense + stacked +
    # int8 + fused-append (the new row is always inside the window).
    W = 160  # crosses block boundaries at block_s=256 and the int8 bs=512
    want_w = np.asarray(_ref_att(q, k, v, lengths, window=W))
    got = np.asarray(
        decode_attention(q, kT, vT, lengths, block_s=256, window=W),
        np.float32,
    )
    np.testing.assert_allclose(got, want_w, rtol=5e-2, atol=5e-3,
                               err_msg="window dense")
    got = np.asarray(
        decode_attention(q, jnp.stack([kT] * L), jnp.stack([vT] * L),
                         lengths, block_s=256, layer_idx=jnp.int32(1),
                         window=W),
        np.float32,
    )
    np.testing.assert_allclose(got, want_w, rtol=5e-2, atol=5e-3,
                               err_msg="window stacked")
    got = np.asarray(
        decode_attention(q, kw, vw, lengths, k_scale=ks_p, v_scale=vs_p,
                         window=W),
        np.float32,
    )
    want_wq = np.asarray(_ref_att(q, kd, vd, lengths, window=W))
    np.testing.assert_allclose(got, want_wq, rtol=5e-2, atol=2e-2,
                               err_msg="window int8")
    want_wf = np.asarray(_ref_att(
        q, jnp.swapaxes(kT2, 1, 2), jnp.swapaxes(vT2, 1, 2), lens2,
        window=W))
    got, k_upd, v_upd = decode_attention(
        q, kT, vT, lens2, block_s=256, kv_new=(kn, vn, positions), window=W)
    np.testing.assert_allclose(np.asarray(got, np.float32), want_wf,
                               rtol=5e-2, atol=5e-3,
                               err_msg="window fused append")
    np.testing.assert_array_equal(
        np.asarray(k_upd), np.asarray(kT2), err_msg="window fused k write")


def check_kv_append() -> None:
    """Fused aliased kv_append vs a host-side RMW reference (native backend)."""
    from xbitops_tpu.kernels.kv_append import kv_append_packed

    L, B, S, Hkv, D = 2, 4, 64, 4, 128
    Sw = S // 4
    rng = np.random.default_rng(0)
    k_all = jnp.asarray(rng.integers(-(2**31), 2**31, (L, B, Hkv, Sw, D), np.int64).astype(np.int32))
    v_all = jnp.asarray(rng.integers(-(2**31), 2**31, (L, B, Hkv, Sw, D), np.int64).astype(np.int32))
    ks_all = jnp.asarray(rng.standard_normal((L, B, 4, Hkv, Sw)), jnp.bfloat16)
    vs_all = jnp.asarray(rng.standard_normal((L, B, 4, Hkv, Sw)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(1, 256, (B, Hkv, D)).astype(np.int32))  # biased
    vq = jnp.asarray(rng.integers(1, 256, (B, Hkv, D)).astype(np.int32))
    kscl = jnp.asarray(rng.standard_normal((B, Hkv)), jnp.bfloat16)
    vscl = jnp.asarray(rng.standard_normal((B, Hkv)), jnp.bfloat16)
    positions = np.asarray([0, 5, 31, S + 3], np.int32)  # last = padding
    li = 1
    got = kv_append_packed(
        k_all, v_all, ks_all, vs_all, kq, vq, kscl, vscl,
        jnp.asarray(positions), jnp.int32(li),
    )
    wk, wv = np.array(k_all), np.array(v_all)
    wks, wvs = np.array(ks_all), np.array(vs_all)
    for b in range(B):
        pos = int(positions[b])
        if pos >= S:
            continue
        w, byte = pos // 4, pos % 4
        sh = byte * 8
        keep = ~(np.int32(255) << sh)
        wk[li, b, :, w] = (wk[li, b, :, w] & keep) | ((np.array(kq[b]) & 255) << sh)
        wv[li, b, :, w] = (wv[li, b, :, w] & keep) | ((np.array(vq[b]) & 255) << sh)
        wks[li, b, byte, :, w] = np.array(kscl[b], wks.dtype)
        wvs[li, b, byte, :, w] = np.array(vscl[b], wvs.dtype)
    for g, w in zip(got, (wk, wv, wks, wvs)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w, np.asarray(g).dtype))

    # dense (bf16) variant: strided head-major row writes via the aliased slab
    from xbitops_tpu.kernels.kv_append import kv_append_dense

    kd_all = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    vd_all = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    knew = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    vnew = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    gk, gv = kv_append_dense(
        kd_all, vd_all, knew, vnew, jnp.asarray(positions), jnp.int32(li)
    )
    wkd, wvd = np.array(kd_all), np.array(vd_all)
    for b in range(B):
        pos = int(positions[b])
        if pos >= S:
            continue
        wkd[li, b, :, pos] = np.asarray(knew[b])
        wvd[li, b, :, pos] = np.asarray(vnew[b])
    np.testing.assert_array_equal(np.asarray(gk), wkd)
    np.testing.assert_array_equal(np.asarray(gv), wvd)


def check_prefill_attention() -> None:
    """Flash prefill kernel (v2 emit_pipeline — no interpret support, so CPU
    CI covers only the v1 grid variant): dense + int8 + stacked + window +
    mixed live/pad rows vs the masked-softmax oracle."""
    from xbitops_tpu.kernels.prefill_attention import prefill_attention
    from xbitops_tpu.models.llama import (
        _pack_kv_scales, _pack_kv_words, _quant_kv,
    )

    N, T, H, Hkv, D, S, B = 3, 256, 8, 4, 128, 1024, 4
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (N, T, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    kT, vT = jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    pos = np.zeros((N, T), np.int32)
    pos[0] = 700 + np.arange(T)      # mid-prompt chunk
    pos[1] = np.where(np.arange(T) < 50, np.arange(T), S)  # ragged + pads
    pos[2] = S                        # inert row
    pos = jnp.asarray(pos)
    slots = jnp.asarray([2, 0, B], jnp.int32)  # last = inert slot
    live = np.asarray(pos) < S

    def ref(qq, kk, vv, window=None):
        rep = qq.shape[2] // kk.shape[2]
        kr = jnp.repeat(kk, rep, axis=2).astype(jnp.float32)
        vr = jnp.repeat(vv, rep, axis=2).astype(jnp.float32)
        safe = jnp.clip(slots, 0, B - 1)
        lo = jnp.einsum("nthd,nshd->nths", qq.astype(jnp.float32),
                        kr[safe]) * (D ** -0.5)
        m = jnp.arange(S)[None, None, :] <= pos[:, :, None]
        if window is not None:
            m &= pos[:, :, None] - jnp.arange(S)[None, None, :] < window
        p = jax.nn.softmax(jnp.where(m[:, :, None, :], lo, -1e30), axis=-1)
        return jnp.einsum("nths,nshd->nthd", p, vr[safe])

    for W in (None, 300):
        got = np.asarray(prefill_attention(q, kT, vT, pos, slots, window=W),
                         np.float32)
        want = np.asarray(ref(q, k, v, window=W))
        np.testing.assert_allclose(
            got[live], want[live], rtol=5e-2, atol=5e-3,
            err_msg=f"prefill dense W={W}")

    got = np.asarray(prefill_attention(
        q, jnp.stack([kT] * 2), jnp.stack([vT] * 2), pos, slots,
        layer_idx=jnp.int32(1)), np.float32)
    want = np.asarray(ref(q, k, v))
    np.testing.assert_allclose(got[live], want[live], rtol=5e-2, atol=5e-3,
                               err_msg="prefill stacked")

    kq, kscl = _quant_kv(k.astype(jnp.float32))
    vq, vscl = _quant_kv(v.astype(jnp.float32))
    kw, vw = _pack_kv_words(kq), _pack_kv_words(vq)
    ks_p = _pack_kv_scales(kscl).astype(jnp.bfloat16)
    vs_p = _pack_kv_scales(vscl).astype(jnp.bfloat16)
    kd = ((kq - 128).astype(jnp.float32) * kscl[..., None]).astype(jnp.bfloat16)
    vd = ((vq - 128).astype(jnp.float32) * vscl[..., None]).astype(jnp.bfloat16)
    for W in (None, 300):
        got = np.asarray(prefill_attention(
            q, kw, vw, pos, slots, k_scale=ks_p, v_scale=vs_p, window=W),
            np.float32)
        want = np.asarray(ref(q, kd, vd, window=W))
        np.testing.assert_allclose(
            got[live], want[live], rtol=5e-2, atol=2e-2,
            err_msg=f"prefill int8 W={W}")


CHECKS: List[Tuple[str, Callable[[], None]]] = [
    ("dequant", check_dequant),
    ("gemv", check_gemv),
    ("decode_attention", check_decode_attention),
    ("prefill_attention", check_prefill_attention),
    ("kv_append", check_kv_append),
]


def run_selfcheck() -> int:
    """Run every gate; returns the number of failures (0 = all green)."""
    failures = 0
    for name, fn in CHECKS:
        try:
            fn()
            _log(f"[selfcheck] {name}: PASS")
        except Exception:
            failures += 1
            _log(f"[selfcheck] {name}: FAIL\n{traceback.format_exc()}")
    return failures
