"""C++ scalar oracle tests: fp16 emulation, cross-implementation pack parity, and
jnp-oracle vs C++-oracle agreement at the reference's tolerances (the role of
``cpp_simulate.cc`` + golden-file comparisons in the reference, SURVEY §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from xbitops_tpu import formats
from xbitops_tpu.utils import cpp_oracle, fixtures


def test_half_conversion_exact():
    # The software fp16 must match numpy's IEEE binary16 bit-for-bit.
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.standard_normal(2000).astype(np.float32) * 10,
        np.array([0.0, -0.0, 1e-8, -1e-8, 65504.0, -65504.0, 70000.0, 6e-5, 5.96e-8],
                 np.float32),
    ])
    for v in vals:
        got = cpp_oracle.half_roundtrip(float(v))
        want = float(np.float32(v).astype(np.float16))
        assert got == want or (np.isnan(got) and np.isnan(want)), (v, got, want)


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
def test_pack_parity_cpp_vs_numpy(bits):
    # Two independent packer implementations must agree bit-for-bit.
    rng = np.random.default_rng(bits)
    wq = rng.integers(0, 1 << bits, (96, 64), dtype=np.uint8)
    np.testing.assert_array_equal(
        cpp_oracle.pack(wq, bits), formats._pack_bits_np(wq, bits, axis=0)
    )


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 8])
def test_dequant_jnp_vs_cpp(bits):
    K, N, g = 128, 64, 32
    rng = np.random.default_rng(bits)
    w = (rng.standard_normal((K, N)) * 0.1).astype(np.float32)
    wq, scales, zeros = formats.quantize(w, bits, g)
    scales16 = scales.astype(np.float16)
    qweight, _, qzeros = formats.gptq_pack(wq, scales, zeros, bits)
    cpp = cpp_oracle.dequant_f16(qweight, scales16, qzeros, bits, g, K).astype(np.float32)
    jnpv = np.asarray(
        formats.dequant_reference(
            jnp.asarray(qweight), jnp.asarray(scales16), jnp.asarray(qzeros),
            g, bits, K, out_dtype=jnp.float16,
        )
    ).astype(np.float32)
    # reference DQ tolerance: abs 1e-3 (unpack_weight_2_to_7.cu:570); these two
    # should in fact agree to fp16 ulp
    np.testing.assert_allclose(jnpv, cpp, atol=1e-3, rtol=0)


def test_gemv_jnp_vs_cpp():
    M, K, N, g, bits = 2, 128, 64, 32, 4
    fx = fixtures.make_fixture(M, K, N, bits, g, seed=1)
    wd = fx.weight.astype(np.float32)
    expect = fx.a.astype(np.float32) @ wd
    # C++ gemv (f32 accumulation) vs float reference of its own dequant output:
    # the reference's strict tolerance (gemv_w4a16_c32.cu:421-422)
    np.testing.assert_allclose(
        fx.out.astype(np.float32), expect, rtol=1e-3, atol=3e-3
    )


def test_act_order_cpp():
    K, N, g, bits = 64, 32, 16, 4
    rng = np.random.default_rng(5)
    wq = rng.integers(0, 16, (K, N)).astype(np.uint8)
    zeros = rng.integers(0, 15, (K // g, N)).astype(np.uint8)
    scales = (rng.random((K // g, N)) + 0.5).astype(np.float16)
    g_idx = rng.permutation(np.arange(K) // g).astype(np.int32)
    qweight, _, qzeros = formats.gptq_pack(wq, scales, zeros, bits)
    cpp = cpp_oracle.dequant_f16(
        qweight, scales, qzeros, bits, g, K, g_idx=g_idx
    ).astype(np.float32)
    jnpv = np.asarray(
        formats.dequant_reference(
            jnp.asarray(qweight), jnp.asarray(scales), jnp.asarray(qzeros),
            g, bits, K, g_idx=jnp.asarray(g_idx), out_dtype=jnp.float16,
        )
    ).astype(np.float32)
    np.testing.assert_allclose(jnpv, cpp, atol=1e-3, rtol=0)


def test_fixture_roundtrip_and_verify_cli(tmp_path):
    import subprocess
    from pathlib import Path

    fx = fixtures.make_fixture(1, 128, 64, 5, 32, seed=2)
    d = fixtures.write_fixture(fx, tmp_path / "fx")
    cpp_dir = Path(cpp_oracle._CPP_DIR)
    exe = tmp_path / "xbit_verify"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", str(cpp_dir / "xbit_verify.cc"),
         str(cpp_dir / "xbit_oracle.cc"), "-o", str(exe)],
        check=True,
    )
    r = subprocess.run([str(exe), str(d)], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout


def test_fp16_accum_gate():
    """The reference's SHIPPED fused kernel accumulates in fp16 (__hfma2
    chains, gemv_w4a16_pt.cu:115-124) and gates at rel 1.001 AND abs 4e-4
    (gemv_w4a16.cu:406-407).  Our kernel accumulates in f32 (strictly
    tighter); this pins that at realistic activation magnitudes our precise
    output passes the reference's own fp16-accum gate against the
    fp16-chain oracle — parity now covers BOTH reference variants.

    Measured caveat, kept as an assertion: at inflated magnitudes (|out|~3)
    fp16 accumulation noise alone exceeds the gate — even the reference's
    own f32-accum and fp16-accum variants disagree there (94/512 gate
    violations at K=512, w-sigma 0.1) — so the gate is only meaningful at
    checkpoint-realistic scales, which is what the reference's golden
    fixtures were.
    """
    import jax.numpy as jnp

    import xbitops_tpu as xb

    K, N, g, bits = 2048, 128, 128, 4
    rng = np.random.default_rng(11)
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    a = (rng.standard_normal((4, K)) * 0.2).astype(np.float16)
    wq, scales, zeros = formats.quantize(w, bits, g)
    s16 = scales.astype(np.float16)
    qweight, _, qzeros = formats.gptq_pack(wq, s16, zeros, bits)
    ref16 = cpp_oracle.gemv_f16acc(a, qweight, s16, qzeros, bits, g, K).astype(np.float32)
    qt = formats.from_gptq(
        jnp.asarray(qweight), jnp.asarray(s16), jnp.asarray(qzeros),
        bits, g, K, scale_store_dtype=jnp.float16,
    )
    got = np.asarray(
        xb.qmatmul(jnp.asarray(a.astype(np.float32)), qt,
                   out_dtype=jnp.float16, precise=True)
    ).astype(np.float32)

    def gate_violations(x, y):
        ratio = np.where(y != 0, x / np.where(y == 0, 1, y), 1.0)
        bad = (np.abs(x - y) > 4e-4) & ((ratio > 1.001) | (ratio < 1 / 1.001))
        return int(bad.sum())

    assert gate_violations(got, ref16) == 0
    # and the fp16-accum oracle itself stays within fp16-noise of the strict
    # f32-accum oracle (the error the reference's shipped kernel carries)
    ref32 = cpp_oracle.gemv_f16(a, qweight, s16, qzeros, bits, g, K).astype(np.float32)
    assert gate_violations(ref32, ref16) == 0
    assert np.abs(ref16 - ref32).max() < 2e-3
