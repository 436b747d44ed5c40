"""Token sampling: greedy / temperature / top-k / top-p, jittable.

The reference has no sampling (it stops at the GEMV); this serves the decode
engine.  Per-slot temperature is a runtime array (one compiled program covers
mixed greedy/sampled batches); top-k / top-p are engine-level static knobs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(
    logits: jax.Array,  # [B, V] float
    key: jax.Array,
    temperature: jax.Array,  # [B] float; <= 0 means greedy
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Sample one token per row.  Greedy rows (temperature <= 0) are exact
    argmax regardless of top_k/top_p."""
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)

    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    if top_k and top_k < logits.shape[-1]:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p (always >= 1 tok
        # — force-keep the argmax so top_p <= 0 can't zero out every row)
        keep = (cum - probs < top_p).at[:, 0].set(True)
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1)[:, None]
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1)

    return jnp.where(temperature <= 0.0, greedy, sampled).astype(jnp.int32)
