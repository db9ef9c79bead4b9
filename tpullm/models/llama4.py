"""Llama 4 decoder (Scout/Maverick — iSWA chunked attention + MoE).

Reference graph: llm_build_llama_iswa (src/models/llama-iswa.cpp) with
LLM_ARCH_LLAMA4 hparams (llama-model.cpp:670-686): chunked sliding-window
attention (8192-token chunks) on 3 of every 4 layers, NoPE on the 4th
(full-attention) layers with the attention-temperature tuning scale
  q *= log(floor((pos+1)/8192)+1)·0.1 + 1,
L2 (weightless) qk norm on rope layers, sigmoid-routed MoE with an ungated
shared expert on MoE layers, dense swiglu on interleaved dense layers.
Weight tensors follow the qwen-moe layout (build reused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .qwen_moe import build_params as build_params  # same tensor set

ATTN_TEMP_FLOOR = 8192  # n_attn_temp_floor_scale (llama-model.cpp:683)
ATTN_TEMP_SCALE = 0.1
ATTN_TEMP_OFFSET = 1.0


def _l2_norm(x: jax.Array, eps: float) -> jax.Array:
    # Llama4TextL2Norm ≡ weightless RMS norm (mean-based): the reference
    # lowers it to ggml_rms_norm with f_norm_rms_eps (llama-iswa.cpp:92)
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        (xf * xf).mean(-1, keepdims=True) + eps)).astype(x.dtype)


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
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5
    W = hp.sliding_window  # chunk size (8192 for released models)

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len)
    if W > 0:
        key_pos = jnp.arange(cache.max_len)[None, None, :]
        same_chunk = (key_pos // W) == (positions[:, :, None] // W)
        mask_chunk = mask_full & same_chunk  # LLAMA_SWA_TYPE_CHUNKED
    else:
        mask_chunk = mask_full
    # attention-temperature tuning for NoPE layers
    attn_temp = (
        jnp.log(jnp.floor(
            (positions.astype(jnp.float32) + ATTN_TEMP_OFFSET) / ATTN_TEMP_FLOOR
        ) + 1.0) * ATTN_TEMP_SCALE + 1.0
    )[:, :, None, None]

    for li, layer in enumerate(params["layers"]):
        # pattern: 3 chunked+rope layers, every 4th is full-attention NoPE
        use_rope = W == 0 or hp.is_swa(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if use_rope:
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
            q = _l2_norm(q, hp.rms_eps)  # use_kq_norm (rope layers only)
            k = _l2_norm(k, hp.rms_eps)
        else:
            q = q * attn_temp.astype(q.dtype)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        if use_rope and W > 0:
            # chunked layers: the flash kernels derive causal(+window) masks
            # from offsets and cannot express LLAMA_SWA_TYPE_CHUNKED, so
            # force the mask-honoring reference path (offsets=None)
            k_all, v_all = cache.kv(li)
            attn_out = attention(q, k_all, v_all, mask_chunk, scale)
        else:
            attn_out = attention_cached(q, cache, li, mask_full, scale,
                                        offsets=offsets)
        x = x + layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:  # sigmoid-routed MoE + ungated shared expert
            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(logits, hp.n_expert_used, gating="sigmoid",
                                 norm_weights=False)
            # llama4 applies the sigmoid weights BEFORE the expert FFN
            # (build_moe_ffn weight_before_ffn, llama-graph.cpp:1181)
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"],
                          weight_before_ffn=True)
            if "w_gate_shexp" in layer:
                gate = layer["w_gate_shexp"](hs)
                up = layer["w_up_shexp"](hs)
                sh = layer["w_down_shexp"](
                    jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
                )
                ffn = ffn + sh.astype(ffn.dtype)
            x = x + ffn.reshape(B, T, -1)
        else:  # interleaved dense layer
            gate = layer["w_gate"](h)
            up = layer["w_up"](h)
            x = x + layer["w_down"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
