"""Op-level kernel perf sweep on the real chip (chunked post-scale kernel)."""
import time
import jax, jax.numpy as jnp
import xbitops_tpu as xb
from xbitops_tpu.utils.benchlib import measure_step
from xbitops_tpu.utils import synth
from xbitops_tpu.kernels.qgemv_kernel import qmatmul_kernel

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

key = jax.random.PRNGKey(0)
M = 8

def carry_step(fn, K, N):
    def step(x):
        y = fn(x)
        d = y[:, : min(K, N)].astype(x.dtype) * 1e-3
        if N < K:
            d = jnp.pad(d, ((0, 0), (0, K - N)))
        return x + d
    return step

for K, N in [(4096, 4096), (11008, 4096), (4096, 11008), (4096, 32000)]:
    a = jax.random.normal(key, (M, K), jnp.bfloat16) * 0.2
    for bits in (4, 2, 8, 3):
        qt = synth.random_qtensor(jax.random.fold_in(key, bits), K, N, bits, 128)
        if qt.K != K:
            a_in = jnp.pad(a, ((0, 0), (0, qt.K - K)))
        else:
            a_in = a
        packed = qt.bytes_packed()
        for tn in (1024, 2048):
            try:
                def fn(x, qt=qt, tn=tn):
                    o = qmatmul_kernel(x, qt, out_dtype=jnp.bfloat16, tile_m=8, tile_n=tn)
                    return o[:, :N]
                dt = measure_step(carry_step(fn, qt.K, N), a_in)
                wb = K * N * bits // 8
                log(f"q{bits} {K}x{N} tk={qt.tile_k} tn={tn}: {dt*1e6:8.1f} us  total {packed/dt/1e9:6.1f} GB/s  wt-only {wb/dt/1e9:6.1f} GB/s")
            except Exception as e:
                log(f"q{bits} {K}x{N} tn={tn}: FAIL {str(e)[:120]}")
        del qt
