"""On-device quantization: float weight → QTensor (TPU layout).

The reference has no quantizer (checkpoints arrive pre-quantized); this exists so
models can be quantized on the fly for benchmarks and tests, and so full-model
conversion never leaves the accelerator.  Asymmetric per-group min/max with GPTQ
conventions (``w ≈ (wq - z) * s``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from xbitops_tpu import formats
from xbitops_tpu.formats import QTensor
from xbitops_tpu.kernels import common


def quantize_array(
    w: jax.Array,
    bits: int,
    group_size: int = 128,
    sym: bool = False,
    tile_k: Optional[int] = None,
    scale_store_dtype=jnp.float32,
    scale_round_dtype=None,
    row_shards: int = 1,
    act_order: bool = False,
    storage_bits=None,
) -> QTensor:
    """Quantize ``w[K, N]`` to ``bits`` with per-group scale/zero, returning the
    packed TPU layout.  ``scale_round_dtype`` (e.g. fp16) optionally rounds scales
    through a checkpoint dtype first, for parity with fp16 GPTQ checkpoints.
    ``row_shards > 1`` packs for row-parallel TP (stacked shard leaves — see
    ``formats.make_row_sharded_qtensor``).

    ``act_order`` quantizes rows in descending-salience order so groups span
    similar-magnitude rows (the GPTQ desc_act idea; real checkpoints carry the
    measured order as ``g_idx`` through :func:`formats.from_gptq`).  The row
    permutation is stored on the QTensor and activations are gathered at
    matmul time — kernels stay gather-free (exllama's approach to the
    reference's disabled act-order kernel, ``quant_cuda_kernel.cu:257-336``)."""
    K, N = w.shape
    perm = None
    if act_order:
        if row_shards > 1:
            raise NotImplementedError("act_order + row-parallel sharding")
        salience = jnp.sum(jnp.abs(w.astype(jnp.float32)), axis=1)
        perm = jnp.argsort(-salience).astype(jnp.int32)
        w = jnp.take(w, perm, axis=0)
    Kp = common.round_up(K, group_size)
    wf = jnp.pad(w.astype(jnp.float32), ((0, Kp - K), (0, 0)))
    G = Kp // group_size
    maxq = (1 << bits) - 1
    wg = wf.reshape(G, group_size, N)
    if sym:
        amax = jnp.max(jnp.abs(wg), axis=1)
        scale = jnp.maximum(amax / (maxq / 2), 1e-8)
        zero = jnp.full((G, N), (maxq + 1) // 2, jnp.float32)
    else:
        lo = jnp.minimum(jnp.min(wg, axis=1), 0.0)
        hi = jnp.maximum(jnp.max(wg, axis=1), 0.0)
        scale = jnp.maximum((hi - lo) / maxq, 1e-8)
        zero = jnp.clip(jnp.round(-lo / scale), 0, maxq)
    if scale_round_dtype is not None:
        scale = scale.astype(scale_round_dtype).astype(jnp.float32)
    q = jnp.clip(jnp.round(wg / scale[:, None, :] + zero[:, None, :]), 0, maxq)
    wq = q.reshape(Kp, N).astype(jnp.int32)[:K]
    scale = scale.astype(scale_round_dtype or jnp.float32)
    zero = zero.astype(jnp.int32)
    if row_shards > 1:
        return formats.make_row_sharded_qtensor(
            wq, scale, zero, bits, group_size, row_shards,
            tile_k=tile_k, scale_store_dtype=scale_store_dtype,
            storage_bits=storage_bits,
        )
    return formats.make_qtensor(
        wq, scale, zero, bits, group_size, add_zero_bias=0, tile_k=tile_k,
        perm=perm, scale_store_dtype=scale_store_dtype, storage_bits=storage_bits,
    )
