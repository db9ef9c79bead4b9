"""AFMoE decoder (gated-attention MoE with dual norm sandwiches).

Reference graph: llm_build_afmoe (src/models/afmoe.cpp): MuP sqrt(n_embd)
embedding scale; per layer — attention whose pre-wo output is gated by
sigmoid(attn_gate(normed input)) with per-head qk norms, NoPE on every
n_no_rope_layer_step-th layer, iSWA local layers with their own rope base;
pre+post norms around BOTH the attention and FFN blocks; dense lead layers
then sigmoid-routed MoE (selection bias, renorm, route scale) + gated shared
expert.
"""

from __future__ import annotations

from dataclasses import replace

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

    def vec(name):
        return load_vector(t[name])

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_post_norm": vec(p + "post_attention_norm.weight"),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "w_gate_attn": linear(p + "attn_gate.weight"),
            "wo": linear(p + "attn_output.weight"),
            "q_norm": vec(p + "attn_q_norm.weight"),
            "k_norm": vec(p + "attn_k_norm.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "ffn_post_norm": vec(p + "post_ffw_norm.weight"),
        }
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in t:
                layer["exp_probs_b"] = vec(p + "exp_probs_b.bias")
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
            if p + "ffn_gate_shexp.weight" in t:
                layer["w_gate_shexp"] = linear(p + "ffn_gate_shexp.weight")
                layer["w_up_shexp"] = linear(p + "ffn_up_shexp.weight")
                layer["w_down_shexp"] = linear(p + "ffn_down_shexp.weight")
        else:  # dense lead layer
            layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["w_down"] = linear(p + "ffn_down.weight")
        layers.append(layer)

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
    scale = hp.head_dim ** -0.5
    # MuP embedding scale (hardcoded sqrt(hidden) in llm_build_afmoe)
    x = params["tok_embd"][tokens] * jnp.asarray(
        float(np.sqrt(hp.n_embd)), params["tok_embd"].dtype)

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len, 0)
    mask_swa = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)
    rope_global = hp.rope
    rope_swa = (replace(hp.rope, freq_base=hp.rope_freq_base_swa)
                if hp.rope_freq_base_swa > 0 else hp.rope)

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        use_rope = hp.no_rope_step > 0 and (li + 1) % hp.no_rope_step != 0
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        gate = layer["w_gate_attn"](h)
        q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        if use_rope:
            rope = rope_swa if swa else rope_global
            q = apply_rope(q, positions, rope)
            k = apply_rope(k, positions, rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask_swa if swa else mask_full, scale,
            offsets=offsets, sliding_window=hp.sliding_window if swa else 0,
        )
        attn_out = attn_out.reshape(B, T, hp.n_head * hp.head_dim_v)
        # attention gating BEFORE the output projection
        attn_out = attn_out * jax.nn.sigmoid(
            gate.astype(jnp.float32)).astype(attn_out.dtype)
        cur = layer["wo"](attn_out)
        cur = rms_norm(cur, layer["attn_post_norm"], hp.rms_eps)
        x = x + cur

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:
            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(
                logits, hp.n_expert_used, gating=hp.expert_gating_func,
                norm_weights=hp.expert_weights_norm,
                scale=hp.expert_weights_scale,
                select_bias=layer.get("exp_probs_b"),
            )
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            if "w_gate_shexp" in layer:
                g = layer["w_gate_shexp"](hs)
                u = layer["w_up_shexp"](hs)
                sh = layer["w_down_shexp"](
                    jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u)
                ffn = ffn + sh.astype(ffn.dtype)
            ffn = ffn.reshape(B, T, -1)
        else:
            g = layer["w_gate"](h)
            u = layer["w_up"](h)
            ffn = layer["w_down"](
                jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u)
        ffn = rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ffn

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
