"""Grok-1 decoder (xAI).

Reference graph: llm_build_grok (src/models/grok.cpp): pre-norm GQA
attention followed by a POST attention-output norm, GELU-gated MoE with
renormalized softmax routing (optionally summed with a parallel dense GELU
FFN scaled by √2/2), ffn_post_norm before the residual add, logits
MULTIPLIED by f_logit_scale then final-softcapped.
"""

from __future__ import annotations

import math

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
from .llama import Params
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

    def vec(name):
        return load_vector(t[name])

    def maybe(name):
        return vec(name) if name in t else None

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "attn_out_norm": vec(p + "attn_output_norm.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "ffn_post_norm": vec(p + "layer_output_norm.weight"
                                 if p + "layer_output_norm.weight" in t
                                 else p + "post_ffw_norm.weight"),
            "router": linear(p + "ffn_gate_inp.weight"),
            "w_gate_exps": experts(p + "ffn_gate_exps.weight"),
            "w_up_exps": experts(p + "ffn_up_exps.weight"),
            "w_down_exps": experts(p + "ffn_down_exps.weight"),
        }
        if p + "ffn_gate.weight" in t:  # parallel dense GELU branch
            layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["w_down"] = linear(p + "ffn_down.weight")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
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
    if hp.embd_scale != 1.0:  # grok embeds scaled by sqrt(n_embd)-style key
        x = x * jnp.asarray(hp.embd_scale, x.dtype)
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets,
                             softcap=hp.softcap_attn)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        attn_out = rms_norm(attn_out, layer["attn_out_norm"], hp.rms_eps)
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        logits = layer["router"](hs).astype(jnp.float32)
        weights, idx = route(logits, hp.n_expert_used, gating="softmax",
                             norm_weights=True)
        ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                      layer["w_up_exps"], layer["w_down_exps"],
                      act="gelu").reshape(B, T, -1)
        if "w_gate" in layer:  # parallel dense GELU ffn, summed and scaled
            gate = layer["w_gate"](h)
            up = layer["w_up"](h)
            dense = layer["w_down"](
                jax.nn.gelu(gate.astype(jnp.float32), approximate=False)
                .astype(up.dtype) * up
            )
            ffn = (ffn + dense) * jnp.asarray(math.sqrt(2) / 2, ffn.dtype)
        ffn = rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ffn

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    logits = logits.astype(jnp.float32)
    if hp.logit_scale != 1.0:  # grok MULTIPLIES (llm_build_grok ggml_scale)
        logits = logits * hp.logit_scale
    if hp.softcap_final:
        logits = jnp.tanh(logits / hp.softcap_final) * hp.softcap_final
    return logits, cache
