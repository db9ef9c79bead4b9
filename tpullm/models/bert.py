"""BERT-family encoder (reference graph: llm_build_bert, src/models/bert.cpp).

Embedding model: token + learned-position + token-type embeddings with a
LayerNorm, N post-norm encoder blocks (bidirectional attention with biases,
GELU FFN), no output head — forward always yields hidden states, pooled by
the embeddings pipeline (mean/cls, ≡ llama_pooling_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention_reference
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
            "wq": linear(p + "attn_q.weight"),
            "bq": maybe_vec(p + "attn_q.bias"),
            "wk": linear(p + "attn_k.weight"),
            "bk": maybe_vec(p + "attn_k.bias"),
            "wv": linear(p + "attn_v.weight"),
            "bv": maybe_vec(p + "attn_v.bias"),
            "wo": linear(p + "attn_output.weight"),
            "bo": maybe_vec(p + "attn_output.bias"),
            "attn_out_norm": vec(p + "attn_output_norm.weight"),
            "attn_out_norm_b": maybe_vec(p + "attn_output_norm.bias"),
            "w_up": linear(p + "ffn_up.weight"),
            "b_up": maybe_vec(p + "ffn_up.bias"),
            "w_down": linear(p + "ffn_down.weight"),
            "b_down": maybe_vec(p + "ffn_down.bias"),
            "ffn_out_norm": vec(p + "layer_output_norm.weight"),
            "ffn_out_norm_b": maybe_vec(p + "layer_output_norm.bias"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "pos_embd": load_embedding(t["position_embd.weight"], dtype=dtype),
        "type_embd": (
            load_embedding(t["token_types.weight"], dtype=dtype)
            if "token_types.weight" in t else None
        ),
        "embd_norm": load_vector(t["token_embd_norm.weight"]),
        "embd_norm_b": (
            load_vector(t["token_embd_norm.bias"])
            if "token_embd_norm.bias" in t else None
        ),
        "layers": layers,
    }


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,  # unused (encoder); kept for the common arch signature
    cache_offset,
    return_hidden: bool = True,
) -> tuple[jax.Array, KVCache]:
    """Returns (hidden [B, T, E] f32, cache). Bidirectional over the ubatch
    (no KV cache — ≡ llama_encode)."""
    B, T = tokens.shape
    x = params["tok_embd"][tokens] + params["pos_embd"][positions]
    if params["type_embd"] is not None:
        x = x + params["type_embd"][0]  # token type 0 (single segment)
    x = layer_norm(x, params["embd_norm"], params["embd_norm_b"], hp.rms_eps)
    scale = hp.head_dim ** -0.5

    # bidirectional over the VALID prefix: cache_offset carries the number of
    # real (non-padding) tokens in this fixed-shape bucket
    n_valid = jnp.asarray(cache_offset).reshape(-1, 1, 1)  # scalar or [B]
    valid = jnp.arange(T)[None, None, :] < jnp.maximum(n_valid, 1)
    mask = jnp.broadcast_to(valid, (B, T, T))

    for layer in params["layers"]:
        q = layer["wq"](x)
        k = layer["wk"](x)
        v = layer["wv"](x)
        if layer["bq"] is not None:
            q = q + layer["bq"].astype(q.dtype)
        if layer["bk"] is not None:
            k = k + layer["bk"].astype(k.dtype)
        if layer["bv"] is not None:
            v = v + layer["bv"].astype(v.dtype)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        attn = attention_reference(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask, scale
        )
        attn = layer["wo"](attn.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["bo"] is not None:
            attn = attn + layer["bo"].astype(attn.dtype)
        x = layer_norm(x + attn, layer["attn_out_norm"],
                       layer["attn_out_norm_b"], hp.rms_eps)

        up = layer["w_up"](x)
        if layer["b_up"] is not None:
            up = up + layer["b_up"].astype(up.dtype)
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(up.dtype)
        down = layer["w_down"](act)
        if layer["b_down"] is not None:
            down = down + layer["b_down"].astype(down.dtype)
        x = layer_norm(x + down, layer["ffn_out_norm"],
                       layer["ffn_out_norm_b"], hp.rms_eps)

    return x.astype(jnp.float32), cache
