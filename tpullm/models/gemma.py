"""Gemma-2 / Gemma-3 decoders.

Reference graphs: llm_build_gemma2_iswa / llm_build_gemma3_iswa
(src/models/gemma2-iswa.cpp, gemma3-iswa.cpp). Distinctives vs the llama
family: sqrt(n_embd)-scaled embeddings, pre+post RMS norms around both the
attention and FFN blocks, tanh-approx GELU FFN, interleaved sliding-window
attention (gemma2 alternates 1:1 with logit softcapping; gemma3 runs 5
local : 1 global with qk-norm and a lower rope base on local layers), and a
final-logit softcap (gemma2). Norm weights arrive with the +1 already folded
in by the GGUF converter, so plain rms_norm applies.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache, SWACache
from .hparams import HParams
from .llama import Params
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_vector(name):
        return load_vector(t[name]) if name in t else None

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "attn_post_norm": maybe_vector(p + "post_attention_norm.weight"),
            "q_norm": maybe_vector(p + "attn_q_norm.weight"),  # gemma3
            "k_norm": maybe_vector(p + "attn_k_norm.weight"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
            "ffn_post_norm": maybe_vector(p + "post_ffw_norm.weight"),
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
    x = params["tok_embd"][tokens] * jnp.asarray(hp.embd_scale, dtype=params["tok_embd"].dtype)
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len, 0)
    ring = isinstance(cache, SWACache)
    if ring:
        # iSWA dual cache: SWA layers live in a ring; the mask comes from the
        # per-slot absolute positions, not the slot index
        cache = cache.advance(positions, cache_offset)
        mask_swa = cache.ring_mask(positions)
    else:
        mask_swa = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)

    rope_global = hp.rope
    rope_swa = (
        replace(hp.rope, freq_base=hp.rope_freq_base_swa)
        if hp.rope_freq_base_swa > 0 else hp.rope
    )

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        rope = rope_swa if swa else rope_global
        mask = mask_swa if swa else mask_full

        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        q = apply_rope(q, positions, rope)
        k = apply_rope(k, positions, rope)

        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale,
            softcap=hp.softcap_attn,
            offsets=None if (ring and swa) else offsets,
            sliding_window=hp.sliding_window if swa and not ring else 0,
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["attn_post_norm"] is not None:
            attn_out = rms_norm(attn_out, layer["attn_post_norm"], hp.rms_eps)
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(up.dtype) * up
        )
        if layer["ffn_post_norm"] is not None:
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
    if hp.softcap_final:
        logits = jnp.tanh(logits / hp.softcap_final) * hp.softcap_final
    return logits, cache


def forward_embedding(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,  # unused: bidirectional encoder (llama_encode path)
    cache_offset,
    return_hidden: bool = True,
) -> tuple[jax.Array, KVCache]:
    """EmbeddingGemma (llm_build_gemma_embedding): the gemma3 layer stack run
    bidirectionally with no KV cache — sqrt(n_embd) input scale, per-head
    qk-norm, per-layer rope base (local layers use the SWA base), q scaled by
    f_attention_scale, pre+post norms, GELU FFN. Local layers keep the
    sliding-window limit relative to query position."""
    B, T = tokens.shape
    x = params["tok_embd"][tokens] * jnp.asarray(
        hp.embd_scale, dtype=params["tok_embd"].dtype)
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5

    n_valid = jnp.asarray(cache_offset).reshape(-1, 1, 1)
    valid = jnp.arange(T)[None, None, :] < jnp.maximum(n_valid, 1)
    mask_full = jnp.broadcast_to(valid, (B, T, T))
    if hp.sliding_window > 0:
        diff = positions[:, :, None] - positions[:, None, :]
        mask_swa = mask_full & (jnp.abs(diff) < hp.sliding_window)
    else:
        mask_swa = mask_full

    rope_global = hp.rope
    rope_swa = (
        replace(hp.rope, freq_base=hp.rope_freq_base_swa)
        if hp.rope_freq_base_swa > 0 else hp.rope
    )

    from ..ops.attention import attention_reference

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        rope = rope_swa if swa else rope_global
        q = apply_rope(q, positions, rope)
        k = apply_rope(k, positions, rope)
        attn_out = attention_reference(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            mask_swa if swa else mask_full, scale,
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["attn_post_norm"] is not None:
            attn_out = rms_norm(attn_out, layer["attn_post_norm"], hp.rms_eps)
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(up.dtype) * up
        )
        if layer["ffn_post_norm"] is not None:
            ffn = rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ffn

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    return x.astype(jnp.float32), cache
