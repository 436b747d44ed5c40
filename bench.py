"""Headline benchmark: Llama-7B 4-bit decode tokens/s/chip vs a16w16 bf16 baseline.

Prints ONE JSON line:
  {"metric": ..., "value": tokens/s, "unit": "tokens/s", "vs_baseline": ...}

``vs_baseline`` is our 4-bit-vs-dense speedup divided by the reference's own
headline claim ("Roughly 2times faster" than a16w16, reference README.md:19-20)
— i.e. >= 1.0 means we match or beat the reference's speedup on its own metric.

Timing notes: the remote-tunnel TPU backend has large, variable dispatch latency,
so steps are chained inside one jitted ``fori_loop`` (data dependency through the
KV cache + sampled token) and the per-step slope is taken between two iteration
counts (constant dispatch overhead differences out).  See utils/benchlib.py.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from xbitops_tpu.models import llama
from xbitops_tpu.utils import synth

B = 8  # decode batch (slots): step time is weight-bound, so tokens/s ~ B;
# 8 rows fill one sublane tile (no padding waste on either model)
SEQ = 128  # KV capacity; decode timing is weight-bound, cache size irrelevant
REF_HEADLINE_SPEEDUP = 2.0  # reference README.md:19-20


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_decode_runner(cfg):
    # NOTE: the final cache is returned and the input donated so the loop
    # carry can alias in place at large S (an un-returned cache doubles HBM);
    # measured at B=32/SEQ=128 the returned-output variant costs ~3.6 ms/step
    # extra (carry copy), so the bench keeps SEQ small and discards the cache.
    @jax.jit
    def run(params, tokens, cache, n):
        def body(i, carry):
            toks, cache = carry
            logits, cache = llama.decode_step(params, cfg, toks, cache)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache

        toks, _ = lax.fori_loop(0, n, body, (tokens, cache))
        return jnp.sum(toks)

    return run


def time_decode_step(params, cfg, label: str, repeats: int = 3, batch=None,
                     kv_quant: bool = False, live: int = 0) -> float:
    """Seconds per decode step, dispatch overhead differenced out.

    ``live``: pre-set every slot's cache length (long-context decode —
    attention reads scale with it); capacity bounds the chained step count."""
    nb = batch or B
    cache = llama.KVCache.init(cfg, nb, quantized=kv_quant)
    if live:
        cache = dataclasses.replace(
            cache, lengths=jnp.full((nb,), live, jnp.int32))
    state = {"cache": cache}
    tokens = jnp.zeros((nb,), jnp.int32)
    run = make_decode_runner(cfg)
    n_cap = 4096 if not live else max((cfg.max_seq_len - live) // 3 - 2, 4)

    def timed(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, tokens, state["cache"], jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.perf_counter()
    float(run(params, tokens, state["cache"], jnp.int32(2)))  # compile + warm
    log(f"[{label}] compile+warm {time.perf_counter() - t0:.1f}s")
    n = 4
    t = timed(n, 1)
    while t < 0.5 and n < n_cap:
        n = min(2 * n, n_cap)
        t = timed(n, 1)
    t1 = min(t, timed(n, repeats - 1))
    t3 = timed(3 * n, repeats)
    sec = max((t3 - t1) / (2 * n), 1e-9)
    log(f"[{label}] n={n}: {sec * 1e3:.3f} ms/step ({nb / sec:.1f} tok/s)")
    return sec


def packed_model_bytes(params) -> int:
    """HBM bytes of quantized + dense weight reads per decode step."""
    total = 0
    for leaf in jax.tree.leaves(params, is_leaf=lambda x: hasattr(x, "bytes_packed")):
        if hasattr(leaf, "bytes_packed"):
            total += leaf.bytes_packed()
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def main() -> None:
    cfg = dataclasses.replace(llama.LlamaConfig.llama2_7b(), max_seq_len=SEQ)
    key = jax.random.PRNGKey(0)

    log("building 4-bit 7B model (random packed bits)...")
    qparams = llama.stack_layers(
        synth.random_llama_params(key, cfg, bits=4, group_size=128),
        consume=True,  # peak HBM: one model + a layer, not two models
    )
    qparams = jax.block_until_ready(qparams)
    qbytes = packed_model_bytes(qparams)
    log(f"quant model packed bytes: {qbytes / 1e9:.2f} GB")
    q_sec = time_decode_step(qparams, cfg, "4bit")
    q_tps = B / q_sec
    hbm_gbps = qbytes / q_sec / 1e9
    del qparams

    log("building a16w16 bf16 7B baseline...")
    try:
        dparams = synth.random_llama_params(key, cfg, bits=None)
        dparams = jax.block_until_ready(dparams)
        d_sec = time_decode_step(dparams, cfg, "a16w16")
        del dparams
    except Exception as e:  # OOM on small-HBM chips: per-op aggregate fallback
        log(f"full dense baseline failed ({type(e).__name__}: {str(e)[:120]})")
        d_sec = dense_aggregate_baseline(cfg)

    # peak serving throughput at a larger batch (quant only; the dense model
    # can't fit B=32 alongside its 13.5 GB of weights — not a fair comparator)
    log("measuring peak-batch decode (B=32)...")
    qparams2 = synth.random_llama_params(key, cfg, bits=4, group_size=128)
    qparams2 = llama.stack_layers(qparams2)
    try:
        peak_sec = time_decode_step(qparams2, cfg, "4bit-B32", batch=32)
        peak_tps = 32 / peak_sec
    except Exception as e:
        log(f"peak-batch measurement failed: {type(e).__name__}")
        peak_tps = None

    # long-context decode (the framework's headline strength): int8 KV at
    # S=2048 with 1000 live positions per slot, B=8 — flash-kernel reads
    # scale with live lengths, the int8 cache halves their bytes
    log("measuring long-context int8-KV decode (S=2048, live=1000)...")
    try:
        cfg_lc = dataclasses.replace(cfg, max_seq_len=2048)
        lc_sec = time_decode_step(qparams2, cfg_lc, "4bit-int8kv-S2048",
                                  kv_quant=True, live=1000)
        lc_ms = lc_sec * 1e3
    except Exception as e:
        log(f"long-context measurement failed: {type(e).__name__}")
        lc_ms = None

    # long-context SERVING (end-to-end Engine: chunked prefill admission +
    # burst decode + readback through the tunnel) — the number users feel
    log("measuring long-context serving (S=2048, slots=16, 1000-tok prompts)...")
    try:
        serve_tps = serving_longctx(qparams2)
    except Exception as e:
        log(f"serving measurement failed: {type(e).__name__}: {str(e)[:120]}")
        serve_tps = None
    del qparams2

    speedup = d_sec / q_sec
    result = {
        "metric": "llama7b_4bit_decode_tokens_per_s_per_chip",
        "value": round(q_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(speedup / REF_HEADLINE_SPEEDUP, 3),
        "speedup_vs_a16w16": round(speedup, 3),
        "a16w16_tokens_per_s": round(B / d_sec, 2),
        "decode_batch": B,
        "hbm_gbps": round(hbm_gbps, 1),
        "peak_tokens_per_s_b32": None if peak_tps is None else round(peak_tps, 1),
        "long_ctx_int8_ms_per_step_s2048_live1000": (
            None if lc_ms is None else round(lc_ms, 2)),
        "long_ctx_tokens_per_s": (
            None if lc_ms is None else round(B / lc_ms * 1e3, 1)),
        "serving_long_ctx_tokens_per_s": (
            None if serve_tps is None else round(serve_tps, 1)),
    }
    print(json.dumps(result), flush=True)


def serving_longctx(params) -> float:
    """End-to-end long-context serving: S=2048, 16 slots, ~1000-token prompts
    through chunked prefill, 16 requests x 128 new tokens, burst-32 decode.
    The engine auto-picks the int8 KV cache (long-context regime) with
    donation (two int8 16-slot caches exceed HBM headroom); 16 slots admit
    the whole wave at once and decode at B=16 (measured round 5: 415 tok/s
    vs 369 at 8 slots — the B=16 burst amortizes weight reads 2x)."""
    import numpy as np

    from xbitops_tpu.engine.engine import Engine, Request

    cfg2 = dataclasses.replace(llama.LlamaConfig.llama2_7b(), max_seq_len=2048)
    eng = Engine(params, cfg2, slots=16, decode_burst=32,
                 prefill_buckets=[16, 32], prefill_chunk=512)
    log(f"[serving] kv_quant={eng.kv_quant} donate={eng.donate_cache}")
    rng = np.random.default_rng(1)

    def reqs(n, new):
        return [
            Request(prompt=rng.integers(0, cfg2.vocab_size, size=1000).tolist(),
                    max_new_tokens=new, id=i)
            for i in range(n)
        ]

    eng.generate(reqs(16, 32))  # warm every program (chunk waves + burst)
    t0 = time.perf_counter()
    outs = eng.generate(reqs(16, 128))
    dt = time.perf_counter() - t0
    n_tok = sum(len(c.tokens) for c in outs)
    log(f"[serving] {n_tok} tok in {dt:.2f}s = {n_tok / dt:.1f} tok/s")
    return n_tok / dt


def dense_aggregate_baseline(cfg) -> float:
    """Lower-bound a16w16 decode step: sum of the dense bf16 matmul times over
    all projection shapes (generous to the baseline — zero overheads counted)."""
    h, ffn, vocab = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    qdim = cfg.num_heads * cfg.head_dim
    kvdim = cfg.num_kv_heads * cfg.head_dim
    shapes = [
        (h, qdim, cfg.num_layers),
        (h, kvdim, 2 * cfg.num_layers),
        (qdim, h, cfg.num_layers),
        (h, ffn, 2 * cfg.num_layers),
        (ffn, h, cfg.num_layers),
        (h, vocab, 1),
    ]
    total = 0.0
    key = jax.random.PRNGKey(1)
    for K, N, count in shapes:
        w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
        x0 = jnp.ones((B, K), jnp.bfloat16)

        @jax.jit
        def run(x, n, w=w, K=K, N=N):
            def body(i, x):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                dep = y[:, : min(K, N)].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
                if N < K:
                    dep = jnp.pad(dep, ((0, 0), (0, K - N)))
                return x + dep

            return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

        float(run(x0, jnp.int32(2)))
        n = 16
        t = None
        while True:
            t0 = time.perf_counter()
            float(run(x0, jnp.int32(n)))
            t = time.perf_counter() - t0
            if t >= 0.3 or n >= 65536:
                break
            n *= 4
        t0 = time.perf_counter()
        float(run(x0, jnp.int32(3 * n)))
        t3 = time.perf_counter() - t0
        per = max((t3 - t) / (2 * n), 1e-9)
        total += per * count
        log(f"[dense {K}x{N}] {per * 1e6:.1f} us x{count}")
    return total


if __name__ == "__main__":
    if "--selfcheck" in sys.argv:
        # one-command on-chip parity gate (covers the emit_pipeline kernels
        # that interpret-mode CI cannot execute); exit code = failure count
        from xbitops_tpu.utils.selfcheck import run_selfcheck

        sys.exit(run_selfcheck())
    main()
