"""GPT-2 decoder (reference graph: llm_build_gpt2, src/models/gpt2.cpp).

Distinctives: LayerNorm (weight+bias) instead of RMSNorm, learned absolute
position embeddings (no rope), fused attn_qkv projection with bias, biased
GELU MLP, tied output head, final LayerNorm. Also covers the starcoder/
codeshell shape with separate hparams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import layer_norm
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe_vec(name):
        return load_vector(t[name]) if name in t else None

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_norm_b": maybe_vec(p + "attn_norm.bias"),
            "wqkv": linear(p + "attn_qkv.weight"),
            "bqkv": maybe_vec(p + "attn_qkv.bias"),
            "wo": linear(p + "attn_output.weight"),
            "bo": maybe_vec(p + "attn_output.bias"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "ffn_norm_b": maybe_vec(p + "ffn_norm.bias"),
            "w_up": linear(p + "ffn_up.weight"),
            "b_up": maybe_vec(p + "ffn_up.bias"),
            "w_down": linear(p + "ffn_down.weight"),
            "b_down": maybe_vec(p + "ffn_down.bias"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "pos_embd": load_embedding(t["position_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
        "output_norm_b": maybe_vec("output_norm.bias"),
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
    x = params["tok_embd"][tokens] + params["pos_embd"][positions]
    scale = hp.head_dim ** -0.5
    E = hp.n_embd

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)

    for li, layer in enumerate(params["layers"]):
        h = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], hp.rms_eps)
        qkv = layer["wqkv"](h)
        if layer["bqkv"] is not None:
            qkv = qkv + layer["bqkv"].astype(qkv.dtype)
        n_q = hp.n_head * hp.head_dim
        n_kv = hp.n_head_kv * hp.head_dim
        q = qkv[..., :n_q].reshape(B, T, hp.n_head, hp.head_dim)
        k = qkv[..., n_q:n_q + n_kv].reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = qkv[..., n_q + n_kv:].reshape(B, T, hp.n_head_kv, hp.head_dim_v)

        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, n_q))
        if layer["bo"] is not None:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)
        x = x + attn_out

        h = layer_norm(x, layer["ffn_norm"], layer["ffn_norm_b"], hp.rms_eps)
        up = layer["w_up"](h)
        if layer["b_up"] is not None:
            up = up + layer["b_up"].astype(up.dtype)
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(up.dtype)
        down = layer["w_down"](act)
        if layer["b_down"] is not None:
            down = down + layer["b_down"].astype(down.dtype)
        x = x + down

    x = layer_norm(x, params["output_norm"], params["output_norm_b"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
