"""LFM2 hybrid decoder (LiquidAI — gated short-convolutions + attention).

Reference graph: llm_build_lfm2 (src/models/lfm2.cpp): per layer either a
gated short-convolution block
  [b|c|x] = in_proj(h);  y = c ⊙ causal_conv(b ⊙ x);  out_proj(y)
with an (l_cache−1)-sample carried tail, or GQA attention with per-head qk
RMS norms + neox rope; swiglu FFN (MoE in lfm2moe) after every layer. The
final norm reuses the token_embd_norm tensor. State rides the HybridCache
(conv plane = n_embd wide).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from .hparams import HParams
from .jamba import HybridCache
from .llama import Params
from .mamba import _causal_conv
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

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
        }
        if p + "ffn_gate_inp.weight" in t:  # lfm2moe layer
            import numpy as np

            def experts(name):
                return load_expert_stack(t[name], mode=mode, dtype=dtype)

            layer["router"] = linear(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in t:
                layer["exp_probs_b"] = load_vector(t[p + "exp_probs_b.bias"])
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
        else:
            layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["w_down"] = linear(p + "ffn_down.weight")
        if p + "shortconv.in_proj.weight" in t:
            layer.update({
                "conv_in": linear(p + "shortconv.in_proj.weight"),
                "conv_w": jnp.asarray(
                    t[p + "shortconv.conv.weight"].to_numpy(), jnp.float32
                ),  # (n_embd, l_cache)
                "conv_out": linear(p + "shortconv.out_proj.weight"),
            })
        else:
            layer.update({
                "wq": linear(p + "attn_q.weight"),
                "wk": linear(p + "attn_k.weight"),
                "wv": linear(p + "attn_v.weight"),
                "wo": linear(p + "attn_output.weight"),
                "q_norm": load_vector(t[p + "attn_q_norm.weight"]),
                "k_norm": load_vector(t[p + "attn_k_norm.weight"]),
            })
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        # lfm2 reuses token_embd_norm as the final norm (llama-model.cpp
        # LFM2 output_norm ← LLM_TENSOR_TOKEN_EMBD_NORM)
        "output_norm": load_vector(t["token_embd_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: HybridCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, HybridCache]:
    B, T = tokens.shape
    E = hp.n_embd
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    k_cache, v_cache = cache.k, cache.v
    conv_cache = cache.conv
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if "conv_in" in layer:  # gated shortconv block
            bcx = layer["conv_in"](h).astype(jnp.float32)  # [B,T,3E]
            b, c, xin = bcx[..., :E], bcx[..., E:2 * E], bcx[..., 2 * E:]
            bx = b * xin
            conv_out, conv_state = _causal_conv(
                bx, conv_cache[li], layer["conv_w"],
                jnp.zeros((E,), jnp.float32),
            )
            conv_cache = conv_cache.at[li].set(conv_state)
            y = c * conv_out
            out = layer["conv_out"](y.astype(x.dtype))
        else:
            q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
            k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
            v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kt[None].astype(k_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0),
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vt[None].astype(v_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0),
            )
            attn_out = attention(q, k_cache[li], v_cache[li], mask, scale,
                                 offsets=offsets)
            out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        x = x + out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:  # lfm2moe: renormalized, gguf gating func
            from ..ops.moe import moe_ffn, route

            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(
                logits, hp.n_expert_used, gating=hp.expert_gating_func,
                norm_weights=True, select_bias=layer.get("exp_probs_b"),
            )
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            x = x + ffn.reshape(B, T, -1)
        else:
            gate = layer["w_gate"](h)
            up = layer["w_up"](h)
            x = x + layer["w_down"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return (logits.astype(jnp.float32),
            HybridCache(k_cache, v_cache, conv_cache, cache.ssm))
