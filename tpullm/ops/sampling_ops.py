"""On-device sampling ops (≡ the reference's backend samplers, llama.h:1260:
sampling executes in-graph on the accelerator and only token ids travel back
to the host — essential here because host↔device readback is the decode
bottleneck, exactly like the reference's GPU case).

Supports greedy, temperature, top-k, top-p, min-p with traced (no-recompile)
parameters over a fixed top-K extraction window.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

TOPK_WINDOW = 64  # fixed extraction width; top_k param masks within it


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceSamplingParams:
    """Traced sampling parameters (pass as arrays to avoid recompiles)."""

    temp: jax.Array  # f32 scalar; <= 0 → greedy
    top_k: jax.Array  # i32 scalar; 0 → disabled (window-wide)
    top_p: jax.Array  # f32 scalar; >= 1 → disabled
    min_p: jax.Array  # f32 scalar; 0 → disabled

    @classmethod
    def make(cls, temp=0.0, top_k=40, top_p=0.95, min_p=0.05):
        return cls(
            temp=jnp.float32(temp),
            top_k=jnp.int32(top_k),
            top_p=jnp.float32(top_p),
            min_p=jnp.float32(min_p),
        )


def sample_token(logits: jax.Array, rng: jax.Array, p: DeviceSamplingParams) -> jax.Array:
    """logits [V] -> sampled token id (i32 scalar). Greedy when temp <= 0."""
    greedy = jnp.argmax(logits).astype(jnp.int32)

    vals, idx = jax.lax.top_k(logits, TOPK_WINDOW)  # descending
    vals = vals.astype(jnp.float32)

    # top-k mask within the window
    ranks = jnp.arange(TOPK_WINDOW)
    k = jnp.where(p.top_k > 0, jnp.minimum(p.top_k, TOPK_WINDOW), TOPK_WINDOW)
    masked = jnp.where(ranks < k, vals, -jnp.inf)

    # temperature
    t = jnp.maximum(p.temp, 1e-6)
    probs = jax.nn.softmax(masked / t)

    # min-p: drop probs below min_p * max
    probs = jnp.where(probs >= p.min_p * probs.max(), probs, 0.0)

    # top-p over the (sorted) window: keep the smallest prefix reaching top_p
    norm = probs / probs.sum()
    csum = jnp.cumsum(norm)
    keep = (csum - norm) < p.top_p  # include the crossing element
    probs = jnp.where(keep, probs, 0.0)

    choice = jax.random.categorical(rng, jnp.log(probs + 1e-30))
    sampled = idx[choice].astype(jnp.int32)
    return jnp.where(p.temp <= 0.0, greedy, sampled)


def sample_batch(logits: jax.Array, rng: jax.Array, p: DeviceSamplingParams) -> jax.Array:
    """logits [B, V] -> [B] token ids (shared params, split rngs)."""
    B = logits.shape[0]
    keys = jax.random.split(rng, B)
    return jax.vmap(lambda l, k: sample_token(l, k, p))(logits, keys)


def top_k_extract(logits: jax.Array, k: int = TOPK_WINDOW):
    """[..., V] -> (values [..., k], ids [..., k]) — the hybrid path for host
    sampler chains (penalties/mirostat/grammar) without full-vocab readback."""
    return jax.lax.top_k(logits, k)
