"""Checkpoint ingestion tests: synthesized AutoGPTQ safetensors -> packed params,
and the packed save/restore round-trip."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors import numpy as st_np

from xbitops_tpu import formats
from xbitops_tpu.io import load_autogptq, load_packed, save_packed
from xbitops_tpu.models import llama

H, FFN, LAYERS, HEADS, KV_HEADS, VOCAB = 128, 256, 2, 4, 2, 512
HEAD_DIM = 32
BITS, GROUP = 4, 32


def _quantized_entry(rng, tensors, prefix, k, n, desc_act=False):
    """Emit AutoGPTQ-convention tensors (qzeros stores zero-1) for one linear."""
    w = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
    perm = rng.permutation(k) if desc_act else None
    wq, scales, zeros = formats.quantize(w if perm is None else w[perm], BITS, GROUP)
    if perm is not None:
        g_idx = np.empty(k, np.int32)
        g_idx[perm] = np.arange(k) // GROUP
        unperm = np.empty_like(wq)
        unperm[perm] = wq
        wq = unperm
        tensors[f"{prefix}.g_idx"] = g_idx
    else:
        tensors[f"{prefix}.g_idx"] = (np.arange(k) // GROUP).astype(np.int32)
    qweight, s16, qzeros = formats.gptq_pack(wq, scales, zeros - 1, BITS)
    tensors[f"{prefix}.qweight"] = qweight
    tensors[f"{prefix}.scales"] = s16
    tensors[f"{prefix}.qzeros"] = qzeros
    return qweight, s16, qzeros


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("autogptq")
    rng = np.random.default_rng(0)
    tensors = {}
    golden = {}
    for i in range(LAYERS):
        pre = f"model.layers.{i}"
        qdim = HEADS * HEAD_DIM
        kvdim = KV_HEADS * HEAD_DIM
        golden[f"{pre}.self_attn.q_proj"] = _quantized_entry(
            rng, tensors, f"{pre}.self_attn.q_proj", H, qdim
        )
        _quantized_entry(rng, tensors, f"{pre}.self_attn.k_proj", H, kvdim)
        _quantized_entry(rng, tensors, f"{pre}.self_attn.v_proj", H, kvdim)
        _quantized_entry(rng, tensors, f"{pre}.self_attn.o_proj", qdim, H)
        _quantized_entry(
            rng, tensors, f"{pre}.mlp.gate_proj", H, FFN, desc_act=(i == 0)
        )
        _quantized_entry(rng, tensors, f"{pre}.mlp.up_proj", H, FFN)
        _quantized_entry(rng, tensors, f"{pre}.mlp.down_proj", FFN, H)
        tensors[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float16)
        tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(H, np.float16)
    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((VOCAB, H)) * 0.02
    ).astype(np.float16)
    tensors["model.norm.weight"] = np.ones(H, np.float16)
    tensors["lm_head.weight"] = (rng.standard_normal((VOCAB, H)) * 0.1).astype(
        np.float16
    )
    st_np.save_file(tensors, str(d / "model.safetensors"))
    (d / "config.json").write_text(
        json.dumps(
            dict(
                model_type="llama",
                vocab_size=VOCAB,
                hidden_size=H,
                intermediate_size=FFN,
                num_hidden_layers=LAYERS,
                num_attention_heads=HEADS,
                num_key_value_heads=KV_HEADS,
                head_dim=HEAD_DIM,
                rope_theta=10000.0,
                rms_norm_eps=1e-5,
                max_position_embeddings=64,
            )
        )
    )
    (d / "quantize_config.json").write_text(
        json.dumps(dict(bits=BITS, group_size=GROUP, desc_act=False))
    )
    return d, golden


def test_load_autogptq_structure(ckpt_dir):
    d, golden = ckpt_dir
    params, cfg = load_autogptq(str(d))
    assert cfg.hidden_size == H and cfg.num_layers == LAYERS
    assert cfg.num_kv_heads == KV_HEADS and cfg.head_dim == HEAD_DIM
    layer0, layer1 = params["layers"][0], params["layers"][1]
    # qkv fused everywhere; layer0's mlp has act-order gate -> fusion skipped
    assert isinstance(layer0["wqkv"], formats.QTensor)
    assert layer0["wqkv"].shape == (H, (HEADS + 2 * KV_HEADS) * HEAD_DIM)
    assert layer0["w_gate"].perm is not None
    assert "w_gateup" not in layer0
    assert isinstance(layer1["w_gateup"], formats.QTensor)
    assert layer1["w_gateup"].shape == (H, 2 * FFN)
    assert params["lm_head"].shape == (H, VOCAB)  # dense fallback, transposed

    # unfused load keeps per-projection tensors
    params_u, _ = load_autogptq(str(d), fuse=False)
    l0 = params_u["layers"][0]
    assert isinstance(l0["wq"], formats.QTensor) and l0["wq"].perm is None
    assert l0["wq"].bits == BITS and l0["wq"].group_size == GROUP


def test_load_autogptq_dequant_parity(ckpt_dir):
    """Loaded QTensor dequantizes exactly like the GPTQ interchange oracle with
    the AutoGPTQ zero-1 convention (add_zero_bias=1)."""
    d, golden = ckpt_dir
    params, cfg = load_autogptq(str(d), fuse=False)
    qweight, s16, qzeros = golden["model.layers.0.self_attn.q_proj"]
    want = np.asarray(
        formats.dequant_reference(
            jnp.asarray(qweight), jnp.asarray(s16), jnp.asarray(qzeros),
            GROUP, BITS, H, add_zero_bias=1, out_dtype=jnp.float32,
        )
    )
    got = np.asarray(
        formats.dequant_qtensor_reference(
            params["layers"][0]["wq"], out_dtype=jnp.float32
        )
    )
    np.testing.assert_array_equal(got, want)


def test_load_autogptq_forward(ckpt_dir):
    d, _ = ckpt_dir
    params, cfg = load_autogptq(str(d), max_seq_len=32)
    cache = llama.KVCache.init(cfg, 2)
    tokens = jnp.asarray([[1, 5, 9], [2, 4, 0]], jnp.int32)
    logits, cache = llama.prefill(params, cfg, tokens, cache)
    assert logits.shape == (2, 3, VOCAB)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_load_autogptq_tp(ckpt_dir):
    d, _ = ckpt_dir
    params, cfg = load_autogptq(str(d), tp=2)
    assert formats.is_row_sharded(params["layers"][0]["wo"])
    assert formats.is_row_sharded(params["layers"][0]["w_down"])
    assert not formats.is_row_sharded(params["layers"][0]["wqkv"])
    # shard-stacked dequant equals the unsharded weight, shard by shard
    p1, _ = load_autogptq(str(d), tp=1)
    whole = np.asarray(
        formats.dequant_qtensor_reference(p1["layers"][0]["wo"], jnp.float32)
    )
    qt = params["layers"][0]["wo"]
    from xbitops_tpu.parallel.tp import squeeze_row_shard
    import dataclasses as dc

    Ks = qt.K_logical
    for s in range(2):
        local = dc.replace(
            qt,
            planes=tuple(p[s] for p in qt.planes),
            scales=qt.scales[s],
            scale_zeros=qt.scale_zeros[s],
        )
        shard = np.asarray(formats.dequant_qtensor_reference(local, jnp.float32))
        np.testing.assert_allclose(
            shard, whole[s * Ks : (s + 1) * Ks], rtol=0, atol=1e-6
        )


@pytest.fixture(scope="module")
def mixtral_ckpt_dir(tmp_path_factory):
    """Synthesized AutoGPTQ MIXTRAL checkpoint (2 experts, top-2)."""
    d = tmp_path_factory.mktemp("autogptq_mixtral")
    rng = np.random.default_rng(1)
    tensors = {}
    E = 2
    for i in range(LAYERS):
        pre = f"model.layers.{i}"
        qdim, kvdim = HEADS * HEAD_DIM, KV_HEADS * HEAD_DIM
        _quantized_entry(rng, tensors, f"{pre}.self_attn.q_proj", H, qdim)
        _quantized_entry(rng, tensors, f"{pre}.self_attn.k_proj", H, kvdim)
        _quantized_entry(rng, tensors, f"{pre}.self_attn.v_proj", H, kvdim)
        _quantized_entry(rng, tensors, f"{pre}.self_attn.o_proj", qdim, H)
        tensors[f"{pre}.block_sparse_moe.gate.weight"] = (
            rng.standard_normal((E, H)) * 0.1
        ).astype(np.float16)
        for e in range(E):
            ep = f"{pre}.block_sparse_moe.experts.{e}"
            _quantized_entry(rng, tensors, f"{ep}.w1", H, FFN)
            _quantized_entry(rng, tensors, f"{ep}.w3", H, FFN)
            _quantized_entry(rng, tensors, f"{ep}.w2", FFN, H)
        tensors[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float16)
        tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(H, np.float16)
    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((VOCAB, H)) * 0.02
    ).astype(np.float16)
    tensors["model.norm.weight"] = np.ones(H, np.float16)
    tensors["lm_head.weight"] = (rng.standard_normal((VOCAB, H)) * 0.1).astype(
        np.float16
    )
    st_np.save_file(tensors, str(d / "model.safetensors"))
    (d / "config.json").write_text(
        json.dumps(
            dict(
                model_type="mixtral",
                vocab_size=VOCAB,
                hidden_size=H,
                intermediate_size=FFN,
                num_hidden_layers=LAYERS,
                num_attention_heads=HEADS,
                num_key_value_heads=KV_HEADS,
                head_dim=HEAD_DIM,
                num_local_experts=E,
                num_experts_per_tok=2,
                max_position_embeddings=64,
            )
        )
    )
    (d / "quantize_config.json").write_text(
        json.dumps(dict(bits=BITS, group_size=GROUP, desc_act=False))
    )
    return d


def test_load_mixtral(mixtral_ckpt_dir):
    from xbitops_tpu.models.moe import MoeConfig

    params, cfg = load_autogptq(str(mixtral_ckpt_dir), max_seq_len=32)
    assert isinstance(cfg, MoeConfig)
    assert cfg.n_experts == 2 and cfg.experts_per_token == 2
    l0 = params["layers"][0]
    assert l0["router"].shape == (H, 2)
    assert isinstance(l0["w_experts_gateup"], formats.QTensor)
    assert l0["w_experts_gateup"].planes[0].shape[0] == 2  # expert axis
    assert l0["w_experts_gateup"].shape == (H, 2 * FFN)
    assert "w_down" not in l0 and "w_gateup" not in l0
    # forward runs (prefill + decode) through the MoE FFN
    cache = llama.KVCache.init(cfg, 2)
    tokens = jnp.asarray([[1, 5, 9], [2, 4, 0]], jnp.int32)
    logits, cache = llama.prefill(params, cfg, tokens, cache)
    assert logits.shape == (2, 3, VOCAB)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))
    with pytest.raises(NotImplementedError, match="EXPERT"):
        load_autogptq(str(mixtral_ckpt_dir), tp=2)


def test_packed_roundtrip(ckpt_dir, tmp_path):
    d, _ = ckpt_dir
    params, cfg = load_autogptq(str(d))
    out = tmp_path / "packed"
    save_packed(params, str(out))
    loaded = load_packed(str(out))
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(loaded)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# desc_act fixture dims: tile-legal at tp=2 (every column-sharded tensor
# keeps >= 128 local lanes, incl. the gathered o_proj's N = hidden)
DH, DFFN, DHEADS, DKV, DHD, DVOCAB, DLAYERS = 256, 512, 4, 2, 128, 512, 2


@pytest.fixture(scope="module")
def desc_ckpt_dir(tmp_path_factory):
    """AutoGPTQ checkpoint with desc_act (non-trivial g_idx) on EVERY linear —
    the combination the round-4 verdict listed as unloadable at tp>1."""
    d = tmp_path_factory.mktemp("autogptq_desc")
    rng = np.random.default_rng(7)
    tensors = {}
    qdim = DHEADS * DHD
    kvdim = DKV * DHD
    for i in range(DLAYERS):
        pre = f"model.layers.{i}"
        for prefix, k, n in (
            (f"{pre}.self_attn.q_proj", DH, qdim),
            (f"{pre}.self_attn.k_proj", DH, kvdim),
            (f"{pre}.self_attn.v_proj", DH, kvdim),
            (f"{pre}.self_attn.o_proj", qdim, DH),
            (f"{pre}.mlp.gate_proj", DH, DFFN),
            (f"{pre}.mlp.up_proj", DH, DFFN),
            (f"{pre}.mlp.down_proj", DFFN, DH),
        ):
            _quantized_entry(rng, tensors, prefix, k, n, desc_act=True)
        tensors[f"{pre}.input_layernorm.weight"] = np.ones(DH, np.float16)
        tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(DH, np.float16)
    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((DVOCAB, DH)) * 0.02
    ).astype(np.float16)
    tensors["model.norm.weight"] = np.ones(DH, np.float16)
    tensors["lm_head.weight"] = (rng.standard_normal((DVOCAB, DH)) * 0.1).astype(
        np.float16
    )
    st_np.save_file(tensors, str(d / "model.safetensors"))
    (d / "config.json").write_text(
        json.dumps(
            dict(
                model_type="llama", vocab_size=DVOCAB, hidden_size=DH,
                intermediate_size=DFFN, num_hidden_layers=DLAYERS,
                num_attention_heads=DHEADS, num_key_value_heads=DKV,
                head_dim=DHD, rope_theta=10000.0, rms_norm_eps=1e-5,
                max_position_embeddings=64,
            )
        )
    )
    (d / "quantize_config.json").write_text(
        json.dumps(dict(bits=BITS, group_size=GROUP, desc_act=True))
    )
    return d


def _dense_from_gptq(tensors, prefix, k):
    """Ground-truth dense weight straight from GPTQ semantics (per-row g_idx
    group lookup, AutoGPTQ zero-1 convention) — independent of the loader.
    The zero term is the fp16-rounded product ``fp16(s * z)``, matching both
    the reference's ``__hfma2(wq, s, -s*z)`` operand and the packed
    ``scale_zeros`` store."""
    qweight = jnp.asarray(tensors[f"{prefix}.qweight"])
    s16 = np.asarray(tensors[f"{prefix}.scales"]).astype(np.float16)
    qzeros = jnp.asarray(tensors[f"{prefix}.qzeros"])
    g = np.asarray(tensors[f"{prefix}.g_idx"], np.int64)
    wq = np.asarray(formats.gptq_unpack_weight(qweight, BITS, k), np.float32)
    zeros = np.asarray(
        formats.gptq_unpack_zeros(qzeros, BITS, s16.shape[1]), np.float16
    )
    sz = (s16 * (zeros + np.float16(1.0))).astype(np.float32)
    return wq * s16.astype(np.float32)[g] - sz[g]


def test_load_autogptq_desc_act_tp(desc_ckpt_dir):
    """desc_act on every linear: tp=1 (down-proj fold) and tp=2 (fold +
    gathered o_proj) both match the dense GPTQ-semantics forward."""
    from xbitops_tpu.parallel import mesh as meshlib, model_tp

    d = desc_ckpt_dir
    tensors = st_np.load_file(str(d / "model.safetensors"))

    p1, cfg = load_autogptq(str(d), max_seq_len=32)
    l0 = p1["layers"][0]
    # down-proj's sort folded into gate/up columns: no runtime gather
    assert l0["w_down"].perm is None
    assert l0["wo"].perm is not None  # o_proj keeps the runtime perm
    assert "w_gateup" not in l0  # gate/up have their own K-perms: unfused

    # ground truth: dense weights by GPTQ per-row semantics
    dense = dict(
        embed=p1["embed"], ln_final=p1["ln_final"], lm_head=p1["lm_head"],
        layers=[],
    )
    for i in range(DLAYERS):
        pre = f"model.layers.{i}"
        dense["layers"].append(dict(
            wq=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.self_attn.q_proj", DH), jnp.bfloat16),
            wk=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.self_attn.k_proj", DH), jnp.bfloat16),
            wv=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.self_attn.v_proj", DH), jnp.bfloat16),
            wo=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.self_attn.o_proj", DHEADS * DHD), jnp.bfloat16),
            w_gate=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.mlp.gate_proj", DH), jnp.bfloat16),
            w_up=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.mlp.up_proj", DH), jnp.bfloat16),
            w_down=jnp.asarray(_dense_from_gptq(tensors, f"{pre}.mlp.down_proj", DFFN), jnp.bfloat16),
            ln_attn=p1["layers"][i]["ln_attn"],
            ln_mlp=p1["layers"][i]["ln_mlp"],
        ))
    # the FOLD itself, gated exactly (f32 accum, reference tolerance): gate's
    # outputs land in down-sort order, and down consumes sorted activations
    from xbitops_tpu.ops.qmatmul import qmatmul

    rng = np.random.default_rng(3)
    down_order = np.argsort(
        np.asarray(tensors["model.layers.0.mlp.down_proj.g_idx"]), kind="stable"
    )
    gate_f32 = _dense_from_gptq(tensors, "model.layers.0.mlp.gate_proj", DH)
    down_f32 = _dense_from_gptq(tensors, "model.layers.0.mlp.down_proj", DFFN)
    a = jnp.asarray(rng.standard_normal((2, DH)) * 0.3, jnp.float32)
    got = np.asarray(qmatmul(a, l0["w_gate"], out_dtype=jnp.float32, precise=True))
    np.testing.assert_allclose(
        got, np.asarray(a) @ gate_f32[:, down_order], rtol=1e-5, atol=3e-4
    )
    b = jnp.asarray(rng.standard_normal((2, DFFN)) * 0.3, jnp.float32)
    got = np.asarray(qmatmul(b, l0["w_down"], out_dtype=jnp.float32, precise=True))
    np.testing.assert_allclose(
        got, np.asarray(b) @ down_f32[down_order, :], rtol=1e-5, atol=3e-4
    )

    B, T = 2, 5
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B, T), 0, DVOCAB)
    ref_logits, _ = llama.prefill(dense, cfg, tokens, llama.KVCache.init(cfg, B))

    # bf16 forwards: the dense ground truth rounds dequant->bf16 while the
    # kernel path applies fp16-bit scales in f32, so a tail of near-zero
    # logits differs by ~0.1 abs (measured 0.4% of elements) — the exact
    # gates above carry the correctness load
    logits1, _ = llama.prefill(p1, cfg, tokens, llama.KVCache.init(cfg, B))
    np.testing.assert_allclose(
        np.asarray(logits1, np.float32), np.asarray(ref_logits, np.float32),
        rtol=5e-2, atol=1.5e-1,
    )

    # tp=2: fold + gathered o_proj through the sharded forward; compared to
    # the SAME-kernel tp=1 logits (tight) and the dense reference (loose)
    p2, cfg2 = load_autogptq(str(d), tp=2, max_seq_len=32)
    l0 = p2["layers"][0]
    assert formats.is_row_sharded(l0["w_down"]) and l0["w_down"].perm is None
    assert not formats.is_row_sharded(l0["wo"]) and l0["wo"].perm is not None
    mesh = meshlib.make_mesh((1, 2), ("data", "model"))
    params_s = model_tp.shard_params(p2, mesh)
    cache_s = model_tp.shard_cache(llama.KVCache.init(cfg2, B), mesh)
    tp_logits, tp_cache = model_tp.tp_prefill(params_s, cfg2, mesh, tokens, cache_s)
    # same-kernel comparison: bf16 psum/gather reorders round a 0.5% tail of
    # near-zero logits by <= 0.05 abs (same band as test_tp_matches_single_chip)
    np.testing.assert_allclose(
        np.asarray(tp_logits, np.float32), np.asarray(logits1, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(tp_logits, np.float32), np.asarray(ref_logits, np.float32),
        rtol=5e-2, atol=1.5e-1,
    )
    # and a decode step
    nxt = jnp.argmax(tp_logits[:, -1], -1).astype(jnp.int32)
    step_logits, _ = model_tp.tp_decode_step(params_s, cfg2, mesh, nxt, tp_cache)
    assert bool(jnp.all(jnp.isfinite(step_logits.astype(jnp.float32))))
