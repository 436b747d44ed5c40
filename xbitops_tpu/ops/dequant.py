"""Public ``dequant`` op — unpack 1–8-bit packed weights to fp16/bf16/f32.

Reference-compatible surface of ``XbitOps.dequant`` (``dq_torch_ops.cc:23-44``),
with its validation rules, plus the TPU-native fast path on a pre-converted
:class:`~xbitops_tpu.formats.QTensor`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from xbitops_tpu import formats
from xbitops_tpu.formats import QTensor
from xbitops_tpu.kernels.dequant_kernel import dequant_kernel


def _validate(qweight, scales, qzeros, group_size, bits, in_features):
    # Mirrors the reference's TORCH_CHECK guards (dq_torch_ops.cc:25-31), minus the
    # bits=1 hole it validates but aborts on (SURVEY §5 quirk 5) — we support 1-bit.
    if group_size < 16:
        raise ValueError(f"group_size must be >= 16, got {group_size}")
    if not 1 <= bits <= 8:
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    expect_rows = (in_features * bits + 31) // 32
    if qweight.shape[0] != expect_rows:
        raise ValueError(
            f"qweight rows {qweight.shape[0]} != ceil(K*bits/32) = {expect_rows}"
        )
    if scales.shape[0] != -(-in_features // group_size):
        raise ValueError("scales rows != ceil(K/group_size)")
    if qzeros.shape != (scales.shape[0], (scales.shape[1] * bits + 31) // 32):
        raise ValueError("qzeros shape mismatch")


def dequant_qtensor(
    qt: QTensor,
    out_dtype=jnp.bfloat16,
    use_kernel: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Dequantize a TPU-layout QTensor to a dense ``(K, N)`` matrix."""
    if use_kernel:
        # Mosaic has no fp16 compute path on TPU: the kernel emits f32 and the
        # (single) fp16 rounding happens outside — same numerics as an fp16 fma.
        kernel_dtype = jnp.float32 if jnp.dtype(out_dtype) == jnp.float16 else out_dtype
        w = dequant_kernel(qt, out_dtype=kernel_dtype, interpret=interpret)
        if kernel_dtype != jnp.dtype(out_dtype):
            w = w.astype(out_dtype)
    else:
        w = formats.dequant_qtensor_reference(qt, out_dtype=out_dtype)
        return w
    w = w[: qt.K_logical, : qt.shape[1]]
    if qt.perm is not None:
        w = jnp.zeros_like(w).at[qt.perm].set(w)
    return w


def dequant(
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
    """Drop-in analog of ``XbitOps.dequant`` (``dq_torch_ops.cc:23-44``).

    Accepts the GPTQ interchange layout and returns the dense ``(K, N)`` weight in
    ``out_dtype`` (default: the scales' dtype, matching the reference's
    fp16-in/fp16-out and bf16-in/bf16-out behavior — without the reference's extra
    bf16→fp16→bf16 round-trip kernels, ``dq_torch_ops.cc:34-42``).

    For repeated use, convert once with :func:`xbitops_tpu.from_gptq` and call
    :func:`dequant_qtensor` — this wrapper repacks on every call.
    """
    _validate(qweight, scales, qzeros, group_size, bits, in_features)
    out_dtype = out_dtype or scales.dtype
    qt = formats.from_gptq(
        qweight, scales, qzeros, bits, group_size, in_features,
        add_zero_bias=add_zero_bias, g_idx=g_idx,
    )
    return dequant_qtensor(qt, out_dtype=out_dtype, use_kernel=use_kernel)
