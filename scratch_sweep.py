"""Kernel perf sweep: tile sizes + ablations to find what bounds the fused GEMV."""
import time
import jax, jax.numpy as jnp
import xbitops_tpu as xb
from xbitops_tpu.utils.benchlib import measure_step
from xbitops_tpu.kernels.qgemv_kernel import qmatmul_kernel

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

key = jax.random.PRNGKey(0)
results = []
for K, N in [(4096, 4096), (8192, 8192), (11008, 4096)]:
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
    a = jax.random.normal(key, (8, K), jnp.bfloat16) * 0.2
    for tk in (256, 512):
        qt = xb.quantize_array(w, 4, 128, tile_k=tk)
        packed = qt.bytes_packed()
        for tn in (256, 512, 1024):
            if N % tn:
                continue
            try:
                def step(x, qt=qt, tn=tn):
                    o = qmatmul_kernel(x, qt, out_dtype=jnp.bfloat16, tile_m=8, tile_n=tn)
                    return jnp.pad(o * 0.01, ((0, 0), (0, K - N)))[:, :K] if K != N else o * 0.01
                dt = measure_step(step, a)
                log(f"K={K} N={N} tk={tk} tn={tn}: {dt*1e6:7.1f} us  {packed/dt/1e9:6.1f} GB/s")
                results.append((K, N, tk, tn, dt))
            except Exception as e:
                log(f"K={K} N={N} tk={tk} tn={tn}: FAIL {str(e)[:80]}")
log("best per shape:")
import collections
by = collections.defaultdict(list)
for K, N, tk, tn, dt in results:
    by[(K, N)].append((dt, tk, tn))
for k, v in by.items():
    v.sort()
    log(f"  {k}: tk={v[0][1]} tn={v[0][2]} {v[0][0]*1e6:.1f} us")
