"""Attention ops: jnp reference implementation (the KQ·softmax·V path of
reference llama-graph.cpp build_attn_mha); the Pallas flash-attention kernel
(tpullm/ops/pallas/flash.py) replaces it on TPU for long sequences."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_reference(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,  # [B, S, Hkv, Dv]
    mask: jax.Array,  # [B, T, S] bool (True = attend)
    scale: float,
    softcap: float = 0.0,
) -> jax.Array:
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    qf = q.reshape(B, T, Hkv, G, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, kf) * scale  # [B,Hkv,G,T,S]
    if softcap:
        scores = jnp.tanh(scores / softcap) * softcap
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # rows with no valid key (fully masked) produce NaN; zero them
    probs = jnp.where(jnp.any(mask[:, None, None, :, :], axis=-1, keepdims=True), probs, 0.0)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v.astype(jnp.float32))
    return out.reshape(B, T, H, v.shape[-1]).astype(q.dtype)


def causal_mask(
    positions: jax.Array,  # [B, T] absolute positions of the query tokens
    n_keys: int,
    kv_len: jax.Array | int,  # number of valid cache entries incl. this batch
    sliding_window: int = 0,
) -> jax.Array:
    """[B, T, S] boolean mask over a cache laid out as absolute slots 0..n_keys."""
    key_pos = jnp.arange(n_keys)[None, None, :]
    qpos = positions[:, :, None]
    mask = key_pos <= qpos
    mask &= key_pos < (kv_len if isinstance(kv_len, int) else kv_len)
    if sliding_window > 0:
        mask &= key_pos > qpos - sliding_window
    return mask


def attention(q, k, v, mask, scale, softcap: float = 0.0) -> jax.Array:
    from .pallas import flash

    if flash.available() and flash.supports(q, k, v):
        return flash.flash_attention(q, k, v, mask, scale, softcap)
    return attention_reference(q, k, v, mask, scale, softcap)
