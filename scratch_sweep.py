"""Dequant-kernel timing with a strong data dependency (no cross-iteration
overlap: the carry consumes a full reduction of the output)."""
import time
import jax, jax.numpy as jnp
from xbitops_tpu.utils.benchlib import measure_step
from xbitops_tpu.utils import synth
from xbitops_tpu.kernels.dequant_kernel import dequant_kernel

t00 = time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)

key = jax.random.PRNGKey(0)
K, N = 4096, 12288  # reference DQ bench shape (7B fused QKV)
for bits in (2, 4, 8):
    qt = synth.random_qtensor(jax.random.fold_in(key, bits), K, N, bits, 128)
    x0 = jnp.zeros((8, 128), jnp.float32)
    def fn(x, qt=qt):
        w = dequant_kernel(qt, out_dtype=jnp.bfloat16)
        return x + jnp.sum(w.astype(jnp.float32)) * 1e-9
    dt = measure_step(fn, x0)
    moved = qt.bytes_packed() + K * N * 2
    log(f"dequant b{bits} {K}x{N}: {dt*1e6:7.1f} us  rw {moved/dt/1e9:6.1f} GB/s (incl. reduce)")
    del qt
