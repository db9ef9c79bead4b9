"""Chameleon decoder (Meta — early-fusion multimodal token LM).

Reference graph: llm_build_chameleon (src/models/chameleon.cpp): llama body
with per-head LayerNorm qk norms (weight+bias, applied BEFORE rope) and an
optional "swin norm" mode (hparams.swin_norm, GGUF %s.swin_norm) where the
attention/FFN norms move AFTER the sub-blocks (post-norm sandwich). Output
head masks the image-token logit band [4, 8196) to -inf — text-only output
until image decoding is supported (mirrors the reference TODO).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params
from .weights import load_embedding, load_linear, load_vector

IMG_TOKEN_START = 4
IMG_TOKEN_END = 8196


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe(name):
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
            "q_norm": maybe(p + "attn_q_norm.weight"),
            "q_norm_b": maybe(p + "attn_q_norm.bias"),
            "k_norm": maybe(p + "attn_k_norm.weight"),
            "k_norm_b": maybe(p + "attn_k_norm.bias"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
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
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        h = x if hp.swin_norm else rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        # per-head LayerNorm qk norms, pre-rope (LLM_NORM with bias)
        if layer["q_norm"] is not None:
            q = layer_norm(q, layer["q_norm"], layer["q_norm_b"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = layer_norm(k, layer["k_norm"], layer["k_norm_b"], hp.rms_eps)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if hp.swin_norm:  # norm AFTER attention, before the residual add
            attn_out = rms_norm(attn_out, layer["attn_norm"], hp.rms_eps)
        x = x + attn_out

        h = x if hp.swin_norm else rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        if hp.swin_norm:
            ffn = rms_norm(ffn, layer["ffn_norm"], hp.rms_eps)
        x = x + ffn

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    logits = logits.astype(jnp.float32)
    # suppress the image-token band for text-only output (reference TODO)
    if logits.shape[-1] >= IMG_TOKEN_END:
        vocab_idx = jnp.arange(logits.shape[-1])
        img = (vocab_idx >= IMG_TOKEN_START) & (vocab_idx < IMG_TOKEN_END)
        logits = jnp.where(img, -jnp.inf, logits)
    return logits, cache
