"""MiMo-2 and Step-3.5 iSWA decoders.

Reference graphs: llm_build_mimo2_iswa (src/models/mimo2-iswa.cpp) and
llm_build_step35_iswa (step35-iswa.cpp). Shared shape: interleaved
sliding-window attention with per-layer head counts (NAS arrays) and a
per-layer rope base (SWA layers use the local base), dense-with-biases or
MoE FFN.

mimo2: per-head attention sinks join the softmax (≡ gpt-oss), sigmoid
routing with renorm + selection bias.
step35: per-head qk norms, GLOBAL layers rope only n_rot/2 dims, a
head-wise scalar gate sigmoid(attn_gate(normed x)) multiplies each head's
attention output before wo, and MoE layers always add a gated shared expert.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, causal_mask
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
            "sinks": maybe(p + "attn_sinks.weight"),  # mimo2
            "q_norm": maybe(p + "attn_q_norm.weight"),  # step35
            "k_norm": maybe(p + "attn_k_norm.weight"),
            "gate_attn": (linear(p + "attn_gate.weight")
                          if p + "attn_gate.weight" in t else None),  # step35
            "ffn_norm": vec(p + "ffn_norm.weight"),
        }
        if p + "ffn_gate_inp.weight" in t:
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in t:
                layer["exp_probs_b"] = vec(p + "exp_probs_b.bias")
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
            if p + "ffn_gate_shexp.weight" in t:  # step35 shared expert
                layer["w_gate_shexp"] = linear(p + "ffn_gate_shexp.weight")
                layer["w_up_shexp"] = linear(p + "ffn_up_shexp.weight")
                layer["w_down_shexp"] = linear(p + "ffn_down_shexp.weight")
        else:
            layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["b_gate"] = maybe(p + "ffn_gate.bias")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["b_up"] = maybe(p + "ffn_up.bias")
            layer["w_down"] = linear(p + "ffn_down.weight")
            layer["b_down"] = maybe(p + "ffn_down.bias")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _forward(hp, params, tokens, positions, cache, cache_offset,
             return_hidden, step35: bool):
    B, T = tokens.shape
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len, 0)
    mask_swa = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)
    rope_global = hp.rope
    if step35:  # global layers rope only n_rot/2 dims (step35-iswa.cpp:55)
        rope_global = replace(hp.rope, dims=hp.rope.dims // 2)
    rope_swa = (replace(hp.rope, freq_base=hp.rope_freq_base_swa)
                if hp.rope_freq_base_swa > 0 else hp.rope)

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        n_h = hp.n_head_l(li)
        n_kv = hp.n_head_kv_l(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, n_h, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, n_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, n_kv, hp.head_dim_v)
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        rope = rope_swa if swa else rope_global
        q = apply_rope(q, positions, rope)
        k = apply_rope(k, positions, rope)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        if n_kv < hp.n_head_kv:  # zero-pad into the max-width cache
            pad = ((0, 0), (0, hp.n_head_kv - n_kv), (0, 0), (0, 0))
            kt = jnp.pad(kt, pad)
            vt = jnp.pad(vt, pad)
        cache = cache.update(li, kt, vt, cache_offset)
        k_all, v_all = cache.kv(li)
        k_all = k_all[:, :n_kv]
        v_all = v_all[:, :n_kv]
        mask = mask_swa if swa else mask_full
        attn_out = attention(
            q, k_all, v_all, mask, scale, offsets=offsets,
            sliding_window=hp.sliding_window if swa else 0,
            sinks=layer["sinks"][:n_h] if layer["sinks"] is not None else None,
        )
        if layer["gate_attn"] is not None:  # step35 head-wise scalar gate
            gate = layer["gate_attn"](h).astype(jnp.float32)  # [B,T,n_h]
            attn_out = attn_out * jax.nn.sigmoid(gate)[..., None].astype(attn_out.dtype)
        cur = layer["wo"](attn_out.reshape(B, T, n_h * hp.head_dim_v))
        x = x + cur

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:
            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            if step35:
                weights, idx = route(
                    logits, hp.n_expert_used, gating=hp.expert_gating_func,
                    norm_weights=hp.expert_weights_norm,
                    scale=hp.expert_weights_scale,
                    select_bias=layer.get("exp_probs_b"),
                )
            else:  # mimo2: sigmoid routing, renormalized
                weights, idx = route(
                    logits, hp.n_expert_used, gating="sigmoid",
                    norm_weights=True, select_bias=layer.get("exp_probs_b"),
                )
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            if "w_gate_shexp" in layer:
                g = layer["w_gate_shexp"](hs)
                u = layer["w_up_shexp"](hs)
                sh = layer["w_down_shexp"](
                    jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u)
                ffn = ffn + sh.astype(ffn.dtype)
            x = x + ffn.reshape(B, T, -1)
        else:
            g = layer["w_gate"](h)
            u = layer["w_up"](h)
            if layer["b_gate"] is not None:
                g = g + layer["b_gate"].astype(g.dtype)
            if layer["b_up"] is not None:
                u = u + layer["b_up"].astype(u.dtype)
            ffn = layer["w_down"](
                jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u)
            if layer["b_down"] is not None:
                ffn = ffn + layer["b_down"].astype(ffn.dtype)
            x = x + ffn

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache


def forward(hp, params, tokens, positions, cache, cache_offset,
            return_hidden: bool = False):
    return _forward(hp, params, tokens, positions, cache, cache_offset,
                    return_hidden, step35=False)


def forward_step35(hp, params, tokens, positions, cache, cache_offset,
                   return_hidden: bool = False):
    return _forward(hp, params, tokens, positions, cache, cache_offset,
                    return_hidden, step35=True)
