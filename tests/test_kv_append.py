"""Fused in-place KV-append kernel vs the XLA read-modify-write path.

The decode write path on real TPU is ``kernels/kv_append.kv_append_packed``
(one aliased Pallas call per layer); under interpret mode the model takes the
RMW scatter path instead, so without these tests the kernel had zero CI
coverage (round-2 verdict item 5).  Layouts are head-major: words
``[L, B, Hkv, S/4, D]`` (biased bytes), scales ``[L, B, 4, Hkv, S/4]``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xbitops_tpu.kernels.kv_append import kv_append_dense, kv_append_packed
from xbitops_tpu.models import llama


def _rmw_reference(k_all, v_all, ks_all, vs_all, kq, vq, ks, vs, positions, li):
    """The XLA byte read-modify-write the kernel replaces (numpy, per slot)."""
    k_all, v_all = np.array(k_all), np.array(v_all)
    ks_all, vs_all = np.array(ks_all), np.array(vs_all)
    L, B, Hkv, Sw, D = k_all.shape
    for b in range(B):
        pos = int(positions[b])
        if pos >= Sw * 4:
            continue  # padding / inactive slot writes nothing
        w, byte = pos // 4, pos % 4
        sh = byte * 8
        keep = ~(np.int32(255) << sh)
        k_all[li, b, :, w] = (k_all[li, b, :, w] & keep) | (
            (np.array(kq[b]) & 255) << sh
        )
        v_all[li, b, :, w] = (v_all[li, b, :, w] & keep) | (
            (np.array(vq[b]) & 255) << sh
        )
        ks_all[li, b, byte, :, w] = np.array(ks[b], ks_all.dtype)
        vs_all[li, b, byte, :, w] = np.array(vs[b], vs_all.dtype)
    return k_all, v_all, ks_all, vs_all


@pytest.mark.parametrize("B,pad_slot", [(4, None), (3, 1)])
def test_kv_append_packed_matches_rmw(B, pad_slot):
    L, S, Hkv, D = 2, 64, 4, 128
    Sw = S // 4
    rng = np.random.default_rng(0)
    k_all = jnp.asarray(rng.integers(-(2**31), 2**31, (L, B, Hkv, Sw, D), np.int64).astype(np.int32))
    v_all = jnp.asarray(rng.integers(-(2**31), 2**31, (L, B, Hkv, Sw, D), np.int64).astype(np.int32))
    ks_all = jnp.asarray(rng.standard_normal((L, B, 4, Hkv, Sw)), jnp.bfloat16)
    vs_all = jnp.asarray(rng.standard_normal((L, B, 4, Hkv, Sw)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(1, 256, (B, Hkv, D)).astype(np.int32))  # biased
    vq = jnp.asarray(rng.integers(1, 256, (B, Hkv, D)).astype(np.int32))
    ks = jnp.asarray(rng.standard_normal((B, Hkv)), jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((B, Hkv)), jnp.bfloat16)
    # mixed word bytes and a padding position (>= S) that must write nothing
    positions = rng.integers(0, S, B).astype(np.int32)
    if pad_slot is not None:
        positions[pad_slot] = S + 5
    for li in range(L):
        want = _rmw_reference(
            k_all, v_all, ks_all, vs_all, kq, vq, ks, vs, positions, li
        )
        got = kv_append_packed(
            k_all, v_all, ks_all, vs_all, kq, vq, ks, vs,
            jnp.asarray(positions), jnp.int32(li), interpret=True,
        )
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w, np.asarray(g).dtype))


@pytest.mark.parametrize("B,pad_slot,dtype", [
    (4, None, jnp.bfloat16), (3, 1, jnp.bfloat16), (2, 0, jnp.float32),
])
def test_kv_append_dense_matches_scatter(B, pad_slot, dtype):
    L, S, Hkv, D = 2, 64, 4, 128
    rng = np.random.default_rng(1)
    k_all = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), dtype)
    v_all = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), dtype)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), dtype)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), dtype)
    positions = rng.integers(0, S, B).astype(np.int32)
    if pad_slot is not None:
        positions[pad_slot] = S + 3  # must write nothing
    for li in range(L):
        want_k, want_v = np.array(k_all), np.array(v_all)
        for b in range(B):
            if positions[b] < S:
                want_k[li, b, :, positions[b]] = np.asarray(kn[b])
                want_v[li, b, :, positions[b]] = np.asarray(vn[b])
        got_k, got_v = kv_append_dense(
            k_all, v_all, kn, vn, jnp.asarray(positions), jnp.int32(li),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_k), want_k)
        np.testing.assert_array_equal(np.asarray(got_v), want_v)


def test_engine_decode_dense_fused_append_matches_scatter(monkeypatch):
    """Model-level gate: a bf16-cache decode with the fused dense append
    forced on (interpret mode) must produce the same cache and logits as the
    default scatter path."""
    cfg = llama.LlamaConfig.tiny(seq=64)
    key = jax.random.PRNGKey(2)
    params = llama.init_params(key, cfg, bits=4, group_size=32)
    tokens = jnp.asarray([[3, 1, 4, 1], [5, 9, 2, 6]], jnp.int32)

    def run():
        cache = llama.KVCache.init(cfg, 2)
        logits, cache = llama.prefill(params, cfg, tokens, cache)
        outs = []
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        for _ in range(3):
            lg, cache = llama.decode_step(params, cfg, tok, cache)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            outs.append(np.asarray(lg, np.float32))
        return outs, cache

    base_outs, base_cache = run()
    monkeypatch.setattr(llama, "FORCE_FUSED_KV_APPEND", True)
    fused_outs, fused_cache = run()
    for a, b in zip(base_outs, fused_outs):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(base_cache.k), np.asarray(fused_cache.k))
    np.testing.assert_array_equal(np.asarray(base_cache.v), np.asarray(fused_cache.v))


def test_engine_decode_fused_append_matches_rmw(monkeypatch):
    """Model-level gate: a full quantized-cache decode with the fused append
    forced on (interpret mode) must produce the same cache bytes and logits as
    the default RMW path."""
    cfg = llama.LlamaConfig.tiny(seq=64)
    key = jax.random.PRNGKey(0)
    params = llama.init_params(key, cfg, bits=8, group_size=32)
    tokens = jnp.asarray([[3, 1, 4, 1], [5, 9, 2, 6]], jnp.int32)

    def run():
        cache = llama.KVCache.init(cfg, 2, quantized=True)
        logits, cache = llama.prefill(params, cfg, tokens, cache)
        outs = []
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        for _ in range(3):
            lg, cache = llama.decode_step(params, cfg, tok, cache)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            outs.append(np.asarray(lg, np.float32))
        return outs, cache

    base_outs, base_cache = run()
    monkeypatch.setattr(llama, "FORCE_FUSED_KV_APPEND", True)
    fused_outs, fused_cache = run()
    for a, b in zip(base_outs, fused_outs):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(base_cache.k), np.asarray(fused_cache.k))
    np.testing.assert_array_equal(np.asarray(base_cache.v), np.asarray(fused_cache.v))
    np.testing.assert_array_equal(
        np.asarray(base_cache.k_scale, np.float32),
        np.asarray(fused_cache.k_scale, np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(base_cache.v_scale, np.float32),
        np.asarray(fused_cache.v_scale, np.float32),
    )
    assert base_cache.lengths.tolist() == fused_cache.lengths.tolist()
