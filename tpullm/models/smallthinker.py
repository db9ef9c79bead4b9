"""SmallThinker MoE decoder.

Reference graph: llm_build_smallthinker (src/models/smallthinker.cpp):
router logits computed on the RAW pre-attention residual stream, ReLU-gated
experts with renormalized routing, NoPE on every n_no_rope_layer_step-th
layer (il % step == 0), optional iSWA sliding-window layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "router": linear(p + "ffn_gate_inp.weight"),
            "w_gate_exps": experts(p + "ffn_gate_exps.weight"),
            "w_up_exps": experts(p + "ffn_up_exps.weight"),
            "w_down_exps": experts(p + "ffn_down_exps.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


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
    step = hp.no_rope_step

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len)
    mask_swa = (
        causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)
        if hp.sliding_window > 0 else mask_full
    )

    for li, layer in enumerate(params["layers"]):
        # router reads the RAW residual stream (llm_build_smallthinker:38)
        router_logits = layer["router"](x).astype(jnp.float32)

        use_rope = step == 0 or (li % step != 0)
        is_swa = hp.is_swa(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if use_rope:
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask_swa if is_swa else mask_full, scale,
            offsets=offsets, sliding_window=hp.sliding_window if is_swa else 0,
        )
        x = x + layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        weights, idx = route(
            router_logits.reshape(B * T, -1), hp.n_expert_used,
            gating=hp.expert_gating_func, norm_weights=True,
        )
        ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                      layer["w_up_exps"], layer["w_down_exps"], act="relu")
        x = x + ffn.reshape(B, T, -1)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
