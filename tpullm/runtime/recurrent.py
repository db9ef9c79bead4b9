"""Recurrent state cache for SSM/linear-attention models.

Role of the reference's llama_memory_recurrent (src/llama-memory-recurrent.*):
instead of per-position K/V slots, each layer keeps a fixed-size rolling
state — the (d_conv-1)-sample convolution tail and the [d_inner, d_state]
SSM hidden state. Fixed-shape donated arrays, like KVCache.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.hparams import HParams


@jax.tree_util.register_pytree_node_class
@dataclass
class RecurrentCache:
    conv: jax.Array  # [L, B, d_inner, d_conv-1]
    ssm: jax.Array  # [L, B, d_inner, d_state] f32

    def tree_flatten(self):
        return (self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:  # recurrent state has no length dimension
        return 1 << 30

    @property
    def batch(self) -> int:
        return self.conv.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int = 0, dtype=jnp.float32):
        # mamba2 convolves the concatenated xBC stream (build_mamba2_layer:
        # conv width d_inner + 2·n_group·d_state); mamba1 convolves x alone
        d_conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
        if hp.ssm_n_group == 0:
            d_conv_w = hp.ssm_d_inner
        return cls(
            jnp.zeros((hp.n_layer, batch, d_conv_w, hp.ssm_d_conv - 1),
                      jnp.float32),
            jnp.zeros((hp.n_layer, batch, hp.ssm_d_inner, hp.ssm_d_state),
                      jnp.float32),
        )

    def update(self, layer: int, conv_new: jax.Array, ssm_new: jax.Array) -> "RecurrentCache":
        return RecurrentCache(
            self.conv.at[layer].set(conv_new.astype(self.conv.dtype)),
            self.ssm.at[layer].set(ssm_new.astype(self.ssm.dtype)),
        )
