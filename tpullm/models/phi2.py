"""Phi-2 decoder (reference graph: llm_build_phi2, src/models/phi2.cpp).

Distinctives: LayerNorm(+bias) pre-norm shared by a PARALLEL attention + FFN
(x = x + attn(norm(x)) + ffn(norm(x))), partial neox rope (n_rot < head_dim),
fused-or-split qkv with biases, sequential GELU FFN, biased output head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import layer_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params
from .phi3 import slice_rows
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    def maybe(name):
        return load_vector(t[name]) if name in t else None

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "wo": linear(t[p + "attn_output.weight"]),
            "bo": maybe(p + "attn_output.bias"),
            "w_up": linear(t[p + "ffn_up.weight"]),
            "b_up": maybe(p + "ffn_up.bias"),
            "w_down": linear(t[p + "ffn_down.weight"]),
            "b_down": maybe(p + "ffn_down.bias"),
        }
        if p + "attn_qkv.weight" in t:  # fused (split at load, like phi3)
            qkv = t[p + "attn_qkv.weight"]
            bqkv = t[p + "attn_qkv.bias"].to_numpy()
            layer["wq"] = linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight"))
            layer["wk"] = linear(
                slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight"))
            layer["wv"] = linear(
                slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv, p + "attn_v.weight"))
            layer["bq"] = jnp.asarray(bqkv[:n_q], jnp.float32)
            layer["bk"] = jnp.asarray(bqkv[n_q:n_q + n_kv], jnp.float32)
            layer["bv"] = jnp.asarray(bqkv[n_q + n_kv:], jnp.float32)
        else:
            layer["wq"] = linear(t[p + "attn_q.weight"])
            layer["wk"] = linear(t[p + "attn_k.weight"])
            layer["wv"] = linear(t[p + "attn_v.weight"])
            layer["bq"] = maybe(p + "attn_q.bias")
            layer["bk"] = maybe(p + "attn_k.bias")
            layer["bv"] = maybe(p + "attn_v.bias")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output_norm_b": maybe("output_norm.bias"),
        "output": linear(t["output.weight"]),
        "output_b": maybe("output.bias"),
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
    scale = hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)

    for li, layer in enumerate(params["layers"]):
        h = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], hp.rms_eps)
        q = layer["wq"](h) + layer["bq"].astype(x.dtype)
        k = layer["wk"](h) + layer["bk"].astype(x.dtype)
        v = layer["wv"](h) + layer["bv"].astype(x.dtype)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)  # partial: first rope.dims only
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["bo"] is not None:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)

        # parallel FFN from the SAME normed input
        up = layer["w_up"](h)
        if layer["b_up"] is not None:
            up = up + layer["b_up"].astype(up.dtype)
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=False)
        ffn = layer["w_down"](act.astype(up.dtype))
        if layer["b_down"] is not None:
            ffn = ffn + layer["b_down"].astype(ffn.dtype)
        x = x + attn_out + ffn

    x = layer_norm(x, params["output_norm"], params["output_norm_b"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    logits = params["output"](x).astype(jnp.float32)
    if params["output_b"] is not None:
        logits = logits + params["output_b"]
    return logits, cache
