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
