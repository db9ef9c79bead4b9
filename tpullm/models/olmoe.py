"""OLMoE decoder (reference graph: llm_build_olmoe, src/models/olmoe.cpp).

Distinctives vs qwen-MoE: q/k RMSNorm over the FULL projection (before the
head reshape, like olmo2 — not per-head), plain softmax top-k routing with
no weight renormalization, no shared expert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .qwen_moe import build_params as _qwen_build_params

# identical tensor set (router + stacked experts + optional q/k norms)
build_params = _qwen_build_params


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, KVCache]:
    B, T = tokens.shape
    x = params["tok_embd"][tokens]
    scale = hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        # full-projection q/k norms (before the head split)
        q = rms_norm(layer["wq"](h), layer["q_norm"], hp.rms_eps)
        k = rms_norm(layer["wk"](h), layer["k_norm"], hp.rms_eps)
        v = layer["wv"](h)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        x = x + layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        router_logits = layer["router"](hs).astype(jnp.float32)
        weights, idx = route(router_logits, hp.n_expert_used,
                             gating="softmax", norm_weights=False)
        ffn = moe_ffn(
            hs, weights, idx,
            layer["w_gate_exps"], layer["w_up_exps"], layer["w_down_exps"],
        )
        x = x + ffn.reshape(B, T, -1)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
