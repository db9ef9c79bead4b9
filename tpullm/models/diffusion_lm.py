"""Diffusion language models (Dream, LLaDA) — bidirectional denoisers.

Reference graphs: llm_build_dream (src/models/dream.cpp) and
llm_build_llada (src/models/llada.cpp) — the llama/qwen2 block stack with
NO KV cache and NON-causal attention (build_attn_inp_no_cache): every
denoising step re-evaluates the full token canvas. The iterative unmasking
loop lives in tpullm.tools.diffusion (≡ examples/diffusion/diffusion-cli).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..models.hparams import HParams
from ..ops.attention import attention_reference
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from .llama import Params
from .llama import build_params as build_params  # same tensor set (± biases)
from .qwen_moe import build_params as build_params_moe  # llada-moe tensor set


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,  # the full denoising canvas [B, T]
    positions: jax.Array,
    cache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, object]:
    B, T = tokens.shape
    x = params["tok_embd"][tokens]
    scale = hp.head_dim ** -0.5
    mask = jnp.ones((B, T, T), bool)  # bidirectional

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h)
        k = layer["wk"](h)
        v = layer["wv"](h)
        if layer["bq"] is not None:
            q = q + layer["bq"].astype(q.dtype)
        if layer["bk"] is not None:
            k = k + layer["bk"].astype(k.dtype)
        if layer["bv"] is not None:
            v = v + layer["bv"].astype(v.dtype)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        attn_out = attention_reference(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask, scale
        )
        x = x + layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:  # llada-moe (softmax, un-renormalized)
            from ..ops.moe import moe_ffn, route

            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(logits, hp.n_expert_used, gating="softmax",
                                 norm_weights=hp.expert_weights_norm)
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
    return logits.astype(jnp.float32), cache
