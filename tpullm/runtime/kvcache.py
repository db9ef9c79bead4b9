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
    # head-major layout: sequence and feature are the minor (tiled) dims,
    # so Pallas attention blocks slice (S, D) tiles directly
    k: jax.Array  # [n_layer, B, Hkv, S, Dk]
    v: jax.Array  # [n_layer, B, Hkv, S, Dv]

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape_k = (hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim)
        shape_v = (hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim_v)
        return cls(jnp.zeros(shape_k, dtype), jnp.zeros(shape_v, dtype))

    def update(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "KVCache":
        """Write k/v [B, Hkv, T, D] at sequence position `offset` of `layer`.

        `offset` is either a scalar (all rows write at the same position —
        single-stream engine) or an int32 [B] vector of per-slot positions
        (continuous batching); a negative per-slot offset skips the write
        (that slot is idle this step).
        """
        offset = jnp.asarray(offset)
        if offset.ndim == 0:
            k = jax.lax.dynamic_update_slice(
                self.k, k_new[None].astype(self.k.dtype), (layer, 0, 0, offset, 0)
            )
            v = jax.lax.dynamic_update_slice(
                self.v, v_new[None].astype(self.v.dtype), (layer, 0, 0, offset, 0)
            )
            return KVCache(k, v)

        def row(cache_row, new_row, off):
            # cache_row [Hkv, S, D], new_row [Hkv, T, D]
            # off < 0 → rewrite the currently-stored values (no-op write)
            start = jnp.maximum(off, 0)
            cur = jax.lax.dynamic_slice(cache_row, (0, start, 0), new_row.shape)
            src = jnp.where(off >= 0, new_row.astype(cache_row.dtype), cur)
            return jax.lax.dynamic_update_slice(cache_row, src, (0, start, 0))

        k_l = jax.vmap(row)(self.k[layer], k_new, offset)
        v_l = jax.vmap(row)(self.v[layer], v_new, offset)
        return KVCache(self.k.at[layer].set(k_l), self.v.at[layer].set(v_l))
