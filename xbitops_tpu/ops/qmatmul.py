"""Public fused quantized matmul / GEMV ops.

``qmatmul`` is the TPU-native surface (activations × QTensor); ``gemv`` is the
reference-compatible wrapper for ``XbitOps.gemv`` (``dq_torch_ops.cc:46-78``) —
but unlike the reference, which aborts outside bits=4/group_size=128
(``gemv_w4a16_pt.cu:152-155``), every bit-width 1..8 and group size ≥ 16 is
supported here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from xbitops_tpu import formats
from xbitops_tpu.formats import QTensor
from xbitops_tpu.kernels import common
from xbitops_tpu.kernels.qgemv_kernel import qmatmul_kernel


def _pick_tile_m(M: int) -> int:
    # Sublane-friendly M tile: small M pads up to one 8-sublane tile; large M tiles
    # at 256 rows.
    if M <= 8:
        return 8
    if M <= 256:
        return common.round_up(M, 8)
    return 256


def qmatmul(
    a: jax.Array,
    qt: QTensor,
    out_dtype=None,
    precise: bool = False,
    use_kernel: bool = True,
    tile_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    layer: Optional[jax.Array] = None,
    a8: bool = False,
) -> jax.Array:
    """``a[..., K] @ dequant(qt)[K, N] -> [..., N]`` without materializing the
    dense weight.

    Leading dims of ``a`` fold into M (as the reference folds 3-D inputs,
    ``dq_torch_ops.cc:61-64``).  Act-order QTensors gather the activation columns
    through ``qt.perm`` (exllama-style) rather than gathering weights.

    ``layer`` (traced int32): ``qt``'s arrays carry a leading layer axis
    (``models.llama.stack_layers``) and the kernel reads that layer in place —
    the scan-over-layers path with zero weight copies.

    ``a8=True`` (W4A8-style): activations are quantized per row to int8
    (absmax) and the dots run on the MXU's s8xs8->s32 path at 2x the bf16 MAC
    rate — the win is on MXU-bound prefill (large M); decode stays bf16.  The
    weight side is exact; only activations round (~1/254 per-element relative).
    """
    out_dtype = out_dtype or a.dtype
    if layer is not None and not use_kernel:
        qt = jax.tree.map(lambda x: x[layer], qt)
        layer = None
    *lead, K = a.shape
    if K != qt.K_logical:
        raise ValueError(f"a K={K} != weight K={qt.K_logical}")
    M = 1
    for d in lead:
        M *= d
    a2 = a.reshape(M, K)
    if qt.perm is not None:
        # stacked QTensors carry a per-layer permutation [L, K]
        p = qt.perm if layer is None else qt.perm[layer]
        a2 = jnp.take(a2, p, axis=1)
    if qt.K != K:  # padded packed rows: zero activations contribute nothing
        a2 = jnp.pad(a2, ((0, 0), (0, qt.K - K)))

    Nl = qt.shape[1]
    if not use_kernel:
        w = formats.dequant_qtensor_reference(qt, out_dtype=jnp.float32)
        if qt.perm is not None:  # undo: reference dequant returns logical order
            w = jnp.take(w, qt.perm, axis=0)
        a_or = (
            a.reshape(M, K) if qt.perm is None else a2[:, :K]
        ).astype(jnp.float32)
        if a8:  # fake-quant the activations like the kernel path does
            sc = jnp.maximum(jnp.max(jnp.abs(a_or), axis=1, keepdims=True), 1e-30) / 127.0
            a_or = jnp.round(a_or / sc) * sc
        out = jnp.dot(
            a_or,
            w[:K] if qt.perm is None else w,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # true f32 on TPU MXU (oracle)
        )
        return out.reshape(*lead, Nl).astype(out_dtype)

    tm = _pick_tile_m(M) if not a8 else min(256, common.round_up(M, 32))
    Mp = common.round_up(M, tm)
    if Mp != M:
        a2 = jnp.pad(a2, ((0, Mp - M), (0, 0)))
    if a8:
        # per-row absmax int8: a ~= a_scale * aq (padded rows are all-zero and
        # quantize to zero).  The scale returns on the kernel's f32 output.
        af = a2.astype(jnp.float32)
        a_scale = jnp.maximum(jnp.max(jnp.abs(af), axis=1, keepdims=True), 1e-30) / 127.0
        aq = jnp.round(af / a_scale).astype(jnp.int8)
        out = qmatmul_kernel(
            aq, qt, out_dtype=jnp.float32, tile_m=tm, tile_n=tile_n,
            interpret=interpret, layer_idx=layer, a8=True,
        )
        out = out * a_scale
        return out[:M, :Nl].reshape(*lead, Nl).astype(out_dtype)
    # Mosaic has no fp16 compute path on TPU: activations enter the kernel in the
    # compute dtype, and fp16 outputs are rounded outside the kernel.
    a2 = a2.astype(jnp.float32 if precise else jnp.bfloat16)
    kernel_out = jnp.dtype(out_dtype)
    if kernel_out == jnp.float16:
        kernel_out = jnp.dtype(jnp.float32)
    out = qmatmul_kernel(
        a2, qt, out_dtype=kernel_out, tile_m=tm, tile_n=tile_n,
        precise=precise, interpret=interpret, layer_idx=layer,
    )
    return out[:M, :Nl].reshape(*lead, Nl).astype(out_dtype)


def gemv(
    input_a: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    qzeros: jax.Array,
    group_size: int,
    bits: int,
    in_features: int,
    add_zero_bias: int = 0,
    g_idx: Optional[jax.Array] = None,
    out_dtype=None,
    use_kernel: bool = True,
) -> jax.Array:
    """Drop-in analog of ``XbitOps.gemv`` (``dq_torch_ops.cc:46-78``): fused
    dequantize + GEMV/GEMM from the GPTQ interchange layout.

    For hot loops, convert once with :func:`xbitops_tpu.from_gptq` and call
    :func:`qmatmul` — this wrapper repacks the weight on every call.
    """
    qt = formats.from_gptq(
        qweight, scales, qzeros, bits, group_size, in_features,
        add_zero_bias=add_zero_bias, g_idx=g_idx,
    )
    return qmatmul(input_a, qt, out_dtype=out_dtype or input_a.dtype, use_kernel=use_kernel)
