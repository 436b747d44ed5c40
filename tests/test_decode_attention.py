"""Length-aware decode-attention kernel vs the masked-softmax oracle.

The cache is head-major ([B, Hkv, S, D]; packed int8: biased words
[B, Hkv, S/4, D] + scales [B, 4, Hkv, S/4]) — tests build row-major
reference tensors and transpose at the kernel boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xbitops_tpu.kernels.decode_attention import decode_attention


def ref_att(q, k, v, lengths, window=None):
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


def hmT(x):
    """[.., S, Hkv, D] row-major -> head-major [.., Hkv, S, D]."""
    return jnp.swapaxes(x, -3, -2)


def pack_int8(kf, vf):
    """Row-major f32 k/v -> (words, scales, dequantized-bf16 refs)."""
    from xbitops_tpu.models.llama import (
        _pack_kv_scales, _pack_kv_words, _quant_kv,
    )

    kq, ks = _quant_kv(kf)  # biased bytes
    vq, vs = _quant_kv(vf)
    kd = ((kq - 128).astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
    vd = ((vq - 128).astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    return (
        _pack_kv_words(kq), _pack_kv_words(vq),
        _pack_kv_scales(ks).astype(jnp.bfloat16),
        _pack_kv_scales(vs).astype(jnp.bfloat16),
        kd, vd,
    )


@pytest.mark.parametrize(
    "B,S,H,Hkv,bs",
    [(2, 256, 8, 2, 64), (3, 300, 12, 4, 128), (1, 64, 4, 4, 64), (2, 128, 4, 1, 32)],
)
def test_decode_attention_matches_oracle(B, S, H, Hkv, bs):
    D = 128
    key = jax.random.PRNGKey(B * 100 + S)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D), jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D), jnp.bfloat16) * 0.3
    lengths = jnp.asarray(np.random.default_rng(S).integers(1, S + 1, B), jnp.int32)
    got = np.asarray(decode_attention(q, hmT(k), hmT(v), lengths, block_s=bs), np.float32)
    want = np.asarray(ref_att(q, k, v, lengths))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-3)


def test_decode_attention_stacked_layer_index():
    L, B, S, H, Hkv, D = 3, 2, 128, 8, 2, 128
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    ks = jax.random.normal(jax.random.fold_in(key, 1), (L, B, S, Hkv, D), jnp.bfloat16) * 0.3
    vs = jax.random.normal(jax.random.fold_in(key, 2), (L, B, S, Hkv, D), jnp.bfloat16) * 0.3
    lengths = jnp.asarray([60, 128], jnp.int32)
    for li in range(L):
        got = np.asarray(
            decode_attention(q, hmT(ks), hmT(vs), lengths, block_s=64,
                             layer_idx=jnp.int32(li)),
            np.float32,
        )
        want = np.asarray(ref_att(q, ks[li], vs[li], lengths))
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-3)


def test_decode_attention_length_isolation():
    """Values past each slot's length must not influence the output."""
    B, S, H, Hkv, D = 2, 128, 4, 2, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D), jnp.bfloat16)
    lengths = jnp.asarray([40, 100], jnp.int32)
    base = np.asarray(decode_attention(q, hmT(k), hmT(v), lengths, block_s=32), np.float32)
    # poison everything past the lengths with huge values
    pos = jnp.arange(S)[None, :, None, None]
    poison = jnp.where(pos >= lengths[:, None, None, None], 1e4, 0).astype(k.dtype)
    got = np.asarray(
        decode_attention(q, hmT(k + poison), hmT(v + poison), lengths, block_s=32),
        np.float32,
    )
    np.testing.assert_array_equal(got, base)


def test_decode_attention_int8_scales():
    """Packed biased int8 k/v + per-(pos, head) scales dequantize in-kernel to
    match the dequantized-oracle attention."""
    B, S, H, Hkv, D = 2, 128, 8, 2, 128
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kf = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D)) * 0.5
    vf = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D)) * 0.5
    kw, vw, ks_p, vs_p, kd, vd = pack_int8(kf, vf)
    lengths = jnp.asarray([50, 128], jnp.int32)
    got = np.asarray(
        decode_attention(q, kw, vw, lengths, block_s=64, k_scale=ks_p, v_scale=vs_p),
        np.float32,
    )
    want = np.asarray(ref_att(q, kd, vd, lengths))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_decode_attention_paged():
    """Paged pool + page-table indirection == dense-cache attention (pages
    shuffled through the pool, one slot partial-length)."""
    B, S, H, Hkv, D, psz = 2, 256, 8, 2, 128, 64
    P, n_pages = S // psz, 10
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kd = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D), jnp.bfloat16)
    vd = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D), jnp.bfloat16)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n_pages)[: B * P]
    table = np.full((B, P), -1, np.int32)
    pool_k = np.zeros((n_pages, Hkv, psz, D), np.float32)
    pool_v = np.zeros((n_pages, Hkv, psz, D), np.float32)
    kT = np.asarray(hmT(kd), np.float32)  # (B, Hkv, S, D)
    vT = np.asarray(hmT(vd), np.float32)
    for b in range(B):
        for p in range(P):
            pg = int(perm[b * P + p])
            table[b, p] = pg
            pool_k[pg] = kT[b, :, p * psz : (p + 1) * psz]
            pool_v[pg] = vT[b, :, p * psz : (p + 1) * psz]
    lengths = jnp.asarray([70, 256], jnp.int32)
    got = np.asarray(
        decode_attention(
            q, jnp.asarray(pool_k, jnp.bfloat16), jnp.asarray(pool_v, jnp.bfloat16),
            lengths, page_table=jnp.asarray(table),
        ),
        np.float32,
    )
    want = np.asarray(ref_att(q, kd, vd, lengths))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_decode_attention_paged_stacked():
    """Stacked paged pool [L, n_pages, Hkv, psz, D] + layer_idx — the shape
    the engine actually drives (the model always passes layer_idx)."""
    L, B, S, H, Hkv, D, psz = 3, 2, 256, 8, 2, 128, 64
    P, n_pages = S // psz, 10
    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kd = jax.random.normal(jax.random.fold_in(key, 1), (L, B, S, Hkv, D), jnp.bfloat16)
    vd = jax.random.normal(jax.random.fold_in(key, 2), (L, B, S, Hkv, D), jnp.bfloat16)
    rng = np.random.default_rng(4)
    perm = rng.permutation(n_pages)[: B * P]
    table = np.full((B, P), -1, np.int32)
    pool_k = np.zeros((L, n_pages, Hkv, psz, D), np.float32)
    pool_v = np.zeros((L, n_pages, Hkv, psz, D), np.float32)
    kT = np.asarray(hmT(kd), np.float32)  # (L, B, Hkv, S, D)
    vT = np.asarray(hmT(vd), np.float32)
    for b in range(B):
        for p in range(P):
            pg = int(perm[b * P + p])
            table[b, p] = pg
            pool_k[:, pg] = kT[:, b, :, p * psz : (p + 1) * psz]
            pool_v[:, pg] = vT[:, b, :, p * psz : (p + 1) * psz]
    lengths = jnp.asarray([70, 256], jnp.int32)
    for li in range(L):
        got = np.asarray(
            decode_attention(
                q, jnp.asarray(pool_k, jnp.bfloat16), jnp.asarray(pool_v, jnp.bfloat16),
                lengths, page_table=jnp.asarray(table), layer_idx=jnp.int32(li),
            ),
            np.float32,
        )
        want = np.asarray(ref_att(q, kd[li], vd[li], lengths))
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_decode_attention_paged_int8():
    """Paged + packed-int8 combination (round-2 verdict item 10): int8 word
    pools + scale pools behind a shuffled page table == dequantized oracle."""
    B, S, H, Hkv, D, psz = 2, 256, 8, 2, 128, 64
    P, n_pages = S // psz, 10
    key = jax.random.PRNGKey(13)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kf = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D)) * 0.5
    vf = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D)) * 0.5
    kw, vw, ks_p, vs_p, kd, vd = pack_int8(kf, vf)
    # kw (B, Hkv, S/4, D); ks_p (B, 4, Hkv, S/4)
    rng = np.random.default_rng(2)
    perm = rng.permutation(n_pages)[: B * P]
    table = np.full((B, P), -1, np.int32)
    pszw = psz // 4
    pool_k = np.zeros((n_pages, Hkv, pszw, D), np.int32)
    pool_v = np.zeros((n_pages, Hkv, pszw, D), np.int32)
    pool_ks = np.zeros((n_pages, 4, Hkv, pszw), np.float32)
    pool_vs = np.zeros((n_pages, 4, Hkv, pszw), np.float32)
    kw_n, vw_n = np.asarray(kw), np.asarray(vw)
    ks_n = np.asarray(ks_p, np.float32)
    vs_n = np.asarray(vs_p, np.float32)
    for b in range(B):
        for p in range(P):
            pg = int(perm[b * P + p])
            table[b, p] = pg
            sl = slice(p * pszw, (p + 1) * pszw)
            pool_k[pg] = kw_n[b, :, sl]
            pool_v[pg] = vw_n[b, :, sl]
            pool_ks[pg] = ks_n[b, :, :, sl]
            pool_vs[pg] = vs_n[b, :, :, sl]
    lengths = jnp.asarray([70, 256], jnp.int32)
    got = np.asarray(
        decode_attention(
            q, jnp.asarray(pool_k), jnp.asarray(pool_v), lengths,
            page_table=jnp.asarray(table),
            k_scale=jnp.asarray(pool_ks, jnp.bfloat16),
            v_scale=jnp.asarray(pool_vs, jnp.bfloat16),
        ),
        np.float32,
    )
    want = np.asarray(ref_att(q, kd, vd, lengths))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_decode_attention_fused_append():
    """kv_new: the call writes the new rows at `positions` (drop past S)
    and attends them; matches append-then-attend exactly.  On CPU this
    exercises the fallback composition (the fused v2 kernel is TPU-only;
    bench.py --selfcheck drives it on-chip)."""
    B, S, H, Hkv, D = 3, 128, 8, 4, 128
    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    kn = jax.random.normal(jax.random.fold_in(key, 3), (B, Hkv, D),
                           jnp.bfloat16) * 0.3
    vn = jax.random.normal(jax.random.fold_in(key, 4), (B, Hkv, D),
                           jnp.bfloat16) * 0.3
    positions = jnp.asarray([0, 77, S], jnp.int32)  # last is a drop (>= S)
    lens = jnp.minimum(positions + 1, S)
    kT, vT = hmT(k), hmT(v)
    b_i = jnp.arange(B)[:, None, None]
    h_i = jnp.arange(Hkv)[None, :, None]
    kT2 = kT.at[(b_i, h_i, positions[:, None, None])].set(
        kn[:, :, None, :], mode="drop")
    vT2 = vT.at[(b_i, h_i, positions[:, None, None])].set(
        vn[:, :, None, :], mode="drop")
    want = np.asarray(decode_attention(q, kT2, vT2, lens, block_s=64),
                      np.float32)

    # flat cache
    got, k_upd, v_upd = decode_attention(
        q, kT, vT, lens, block_s=64, kv_new=(kn, vn, positions))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(kT2))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(vT2))

    # stacked cache: only the indexed layer changes
    L = 2
    got, k_upd, v_upd = decode_attention(
        q, jnp.stack([kT] * L), jnp.stack([vT] * L), lens, block_s=64,
        layer_idx=jnp.int32(1), kv_new=(kn, vn, positions))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k_upd[1]), np.asarray(kT2))
    np.testing.assert_array_equal(np.asarray(k_upd[0]), np.asarray(kT))
    np.testing.assert_array_equal(np.asarray(v_upd[1]), np.asarray(vT2))


def test_decode_attention_fused_append_int8():
    """kv_new with a packed int8 cache: the call RMWs the new byte + scale
    at `positions` (drop past S) and attends them; matches append-then-
    attend exactly.  On CPU this exercises the kv_append_packed fallback
    composition (the fused v2 kernel is TPU-only; bench.py --selfcheck
    drives it on-chip)."""
    from xbitops_tpu.kernels.kv_append import kv_append_packed
    from xbitops_tpu.models.llama import _quant_kv

    B, S, H, Hkv, D = 3, 128, 8, 4, 128
    key = jax.random.PRNGKey(13)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kf = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D)) * 0.5
    vf = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D)) * 0.5
    kw, vw, ks_p, vs_p, _, _ = pack_int8(kf, vf)
    kn = jax.random.normal(jax.random.fold_in(key, 3), (B, 1, Hkv, D)) * 0.5
    vn = jax.random.normal(jax.random.fold_in(key, 4), (B, 1, Hkv, D)) * 0.5
    kq_n, ks_n = _quant_kv(kn)  # (B, 1, Hkv, D) biased / (B, 1, Hkv)
    vq_n, vs_n = _quant_kv(vn)
    positions = jnp.asarray([0, 77, S], jnp.int32)  # last is a drop (>= S)
    lens = jnp.minimum(positions + 1, S)

    # oracle: aliased append kernel (tested in test_kv_append), then attend
    wk, wv, wks, wvs = kv_append_packed(
        kw[None], vw[None], ks_p[None], vs_p[None],
        kq_n[:, 0], vq_n[:, 0], ks_n[:, 0], vs_n[:, 0],
        positions, jnp.int32(0),
    )
    want = np.asarray(
        decode_attention(q, wk[0], wv[0], lens, block_s=64,
                         k_scale=wks[0], v_scale=wvs[0]),
        np.float32,
    )

    # flat cache
    got, k_upd, v_upd, ks_upd, vs_upd = decode_attention(
        q, kw, vw, lens, block_s=64, k_scale=ks_p, v_scale=vs_p,
        kv_new=(kq_n[:, 0], vq_n[:, 0], ks_n[:, 0], vs_n[:, 0], positions))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(wk[0]))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(wv[0]))
    np.testing.assert_array_equal(np.asarray(ks_upd), np.asarray(wks[0]))
    np.testing.assert_array_equal(np.asarray(vs_upd), np.asarray(wvs[0]))

    # stacked cache: only the indexed layer changes
    L = 2
    got, k_upd, v_upd, ks_upd, vs_upd = decode_attention(
        q, jnp.stack([kw] * L), jnp.stack([vw] * L), lens, block_s=64,
        layer_idx=jnp.int32(1),
        k_scale=jnp.stack([ks_p] * L), v_scale=jnp.stack([vs_p] * L),
        kv_new=(kq_n[:, 0], vq_n[:, 0], ks_n[:, 0], vs_n[:, 0], positions))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k_upd[1]), np.asarray(wk[0]))
    np.testing.assert_array_equal(np.asarray(k_upd[0]), np.asarray(kw))
    np.testing.assert_array_equal(np.asarray(ks_upd[1]), np.asarray(wks[0]))
    np.testing.assert_array_equal(np.asarray(ks_upd[0]), np.asarray(ks_p))


@pytest.mark.parametrize(
    "B,S,H,Hkv,bs,window",
    [
        (2, 256, 8, 2, 64, 100),   # window crosses block boundaries
        (3, 300, 12, 4, 128, 64),  # window < one block
        (2, 128, 4, 4, 32, 200),   # window > some lengths (partially binds)
        (2, 128, 4, 1, 32, 1),     # degenerate: only the newest position
    ],
)
def test_decode_attention_sliding_window(B, S, H, Hkv, bs, window):
    """Sliding window == masked-softmax oracle over [len-W, len) only."""
    D = 128
    key = jax.random.PRNGKey(B * 10 + window)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    lengths = jnp.asarray(
        np.random.default_rng(S + window).integers(1, S + 1, B), jnp.int32)
    got = np.asarray(
        decode_attention(q, hmT(k), hmT(v), lengths, block_s=bs,
                         window=window),
        np.float32,
    )
    want = np.asarray(ref_att(q, k, v, lengths, window=window))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-3)


def test_decode_attention_sliding_window_excluded_blocks_isolated():
    """Poisoning every position OUTSIDE the window changes nothing — the
    excluded blocks must neither be read into the softmax nor the output."""
    B, S, H, Hkv, D, W = 2, 256, 4, 2, 128, 80
    key = jax.random.PRNGKey(21)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D), jnp.bfloat16)
    lengths = jnp.asarray([130, 256], jnp.int32)
    base = np.asarray(
        decode_attention(q, hmT(k), hmT(v), lengths, block_s=64, window=W),
        np.float32,
    )
    pos = jnp.arange(S)[None, :, None, None]
    lo = jnp.maximum(lengths - W, 0)[:, None, None, None]
    outside = (pos < lo) | (pos >= lengths[:, None, None, None])
    poison = jnp.where(outside, 1e4, 0).astype(k.dtype)
    got = np.asarray(
        decode_attention(q, hmT(k + poison), hmT(v + poison), lengths,
                         block_s=64, window=W),
        np.float32,
    )
    np.testing.assert_array_equal(got, base)


def test_decode_attention_sliding_window_int8_and_stacked():
    """Window composes with the packed int8 cache and stacked layers."""
    B, S, H, Hkv, D, W = 2, 128, 8, 2, 128, 50
    key = jax.random.PRNGKey(31)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kf = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D)) * 0.5
    vf = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D)) * 0.5
    kw, vw, ks_p, vs_p, kd, vd = pack_int8(kf, vf)
    lengths = jnp.asarray([70, 128], jnp.int32)
    got = np.asarray(
        decode_attention(q, kw, vw, lengths, block_s=64,
                         k_scale=ks_p, v_scale=vs_p, window=W),
        np.float32,
    )
    want = np.asarray(ref_att(q, kd, vd, lengths, window=W))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)

    L = 2
    got = np.asarray(
        decode_attention(q, jnp.stack([kw] * L), jnp.stack([vw] * L),
                         lengths, block_s=64, layer_idx=jnp.int32(1),
                         k_scale=jnp.stack([ks_p] * L),
                         v_scale=jnp.stack([vs_p] * L), window=W),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_decode_attention_sliding_window_fused_append():
    """kv_new + window: the appended row (position len-1) is always inside
    the window; result == append-then-attend with the same window."""
    B, S, H, Hkv, D, W = 3, 128, 8, 4, 128, 40
    key = jax.random.PRNGKey(41)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D),
                          jnp.bfloat16) * 0.3
    kn = jax.random.normal(jax.random.fold_in(key, 3), (B, Hkv, D),
                           jnp.bfloat16) * 0.3
    vn = jax.random.normal(jax.random.fold_in(key, 4), (B, Hkv, D),
                           jnp.bfloat16) * 0.3
    positions = jnp.asarray([0, 77, S], jnp.int32)  # last is a drop (>= S)
    lens = jnp.minimum(positions + 1, S)
    kT, vT = hmT(k), hmT(v)
    b_i = jnp.arange(B)[:, None, None]
    h_i = jnp.arange(Hkv)[None, :, None]
    kT2 = kT.at[(b_i, h_i, positions[:, None, None])].set(
        kn[:, :, None, :], mode="drop")
    vT2 = vT.at[(b_i, h_i, positions[:, None, None])].set(
        vn[:, :, None, :], mode="drop")
    want = np.asarray(
        decode_attention(q, kT2, vT2, lens, block_s=64, window=W), np.float32)
    got, k_upd, v_upd = decode_attention(
        q, kT, vT, lens, block_s=64, kv_new=(kn, vn, positions), window=W)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k_upd), np.asarray(kT2))
    np.testing.assert_array_equal(np.asarray(v_upd), np.asarray(vT2))
