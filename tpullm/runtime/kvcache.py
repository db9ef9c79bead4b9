"""KV cache as fixed-shape donated JAX arrays.

Role of the reference's llama_kv_cache (src/llama-kv-cache.cpp): per-layer K/V
storage that decode steps append into. XLA's static shapes replace the
reference's cell allocator for the single-context case; the paged multi-slot
variant (server continuous batching) builds on the same arrays with per-slot
offsets. Quantized (Q8) KV storage follows with the Pallas attention kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.hparams import HParams


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jax.Array  # [n_layer, B, S, Hkv, Dk]
    v: jax.Array  # [n_layer, B, S, Hkv, Dv]

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape_k = (hp.n_layer, batch, max_len, hp.n_head_kv, hp.head_dim)
        shape_v = (hp.n_layer, batch, max_len, hp.n_head_kv, hp.head_dim_v)
        return cls(jnp.zeros(shape_k, dtype), jnp.zeros(shape_v, dtype))

    def update(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "KVCache":
        """Write [B, T, Hkv, D] at position `offset` of layer `layer`."""
        k = jax.lax.dynamic_update_slice(
            self.k, k_new[None].astype(self.k.dtype), (layer, 0, offset, 0, 0)
        )
        v = jax.lax.dynamic_update_slice(
            self.v, v_new[None].astype(self.v.dtype), (layer, 0, offset, 0, 0)
        )
        return KVCache(k, v)
