"""Op-level kernel perf sweep on the real chip: where does the BW gap come from."""
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
    """Make step: (M,K)->(M,K) wrapping fn (M,K)->(M,N) with cheap dependency."""
    def step(x):
        y = fn(x)
        d = y[:, : min(K, N)].astype(x.dtype) * 1e-3
        if N < K:
            d = jnp.pad(d, ((0, 0), (0, K - N)))
        return x + d
    return step

for K, N in [(4096, 4096), (11008, 4096), (4096, 11008), (4096, 32000)]:
    a = jax.random.normal(key, (M, K), jnp.bfloat16) * 0.2
    # dense baseline
    w = (jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02)
    dt = measure_step(carry_step(lambda x: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16), K, N), a)
    log(f"dense {K}x{N}: {dt*1e6:8.1f} us  {K*N*2/dt/1e9:6.1f} GB/s")
    del w
    for tk in (256, 512, 1024):
        if K % tk:
            continue
        qt = synth.random_qtensor(jax.random.fold_in(key, tk), K, N, 4, 128, tile_k=tk)
        packed = qt.bytes_packed()
        for tn in (512, 1024, 2048):
            if N % tn:
                continue
            try:
                def fn(x, qt=qt, tn=tn):
                    return qmatmul_kernel(x, qt, out_dtype=jnp.bfloat16, tile_m=8, tile_n=tn)
                dt = measure_step(carry_step(fn, K, N), a)
                wb = K*N/2
                log(f"q4 {K}x{N} tk={tk} tn={tn}: {dt*1e6:8.1f} us  total {packed/dt/1e9:6.1f} GB/s  wt-only {wb/dt/1e9:6.1f} GB/s  (scale ovh {100*(packed-wb)/wb:.0f}%)")
            except Exception as e:
                log(f"q4 {K}x{N} tk={tk} tn={tn}: FAIL {str(e)[:100]}")
        del qt
