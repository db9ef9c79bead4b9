"""DBRX decoder (reference graph: llm_build_dbrx, src/models/dbrx.cpp).

Distinctives: LayerNorm (weight-only) norms, fused qkv projection clamped to
±clamp_kqv, neox rope, MoE (softmax routing with renormalized top-k weights)
fed from a second LayerNorm named attn_output_norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import layer_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params
from .phi3 import slice_rows
from .qwen_moe import _experts
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        qkv = t[p + "attn_qkv.weight"]
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                    p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "out_norm": load_vector(t[p + "attn_output_norm.weight"]),
            "router": linear(t[p + "ffn_gate_inp.weight"]),
            "w_gate_exps": _experts(t[p + "ffn_gate_exps.weight"], dtype, mode),
            "w_up_exps": _experts(t[p + "ffn_up_exps.weight"], dtype, mode),
            "w_down_exps": _experts(t[p + "ffn_down_exps.weight"], dtype, mode),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
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
    clamp = hp.clamp_kqv

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)

    for li, layer in enumerate(params["layers"]):
        h = layer_norm(x, layer["attn_norm"], None, hp.rms_eps)
        q = layer["wq"](h)
        k = layer["wk"](h)
        v = layer["wv"](h)
        if clamp > 0:  # fused-qkv clamp (dbrx f_clamp_kqv)
            q = jnp.clip(q, -clamp, clamp)
            k = jnp.clip(k, -clamp, clamp)
            v = jnp.clip(v, -clamp, clamp)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        x = x + layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = layer_norm(x, layer["out_norm"], None, hp.rms_eps)
        hs = h.reshape(B * T, -1)
        router_logits = layer["router"](hs).astype(jnp.float32)
        weights, idx = route(router_logits, hp.n_expert_used,
                             gating="softmax", norm_weights=True)
        ffn = moe_ffn(
            hs, weights, idx,
            layer["w_gate_exps"], layer["w_up_exps"], layer["w_down_exps"],
        )
        x = x + ffn.reshape(B, T, -1)

    x = layer_norm(x, params["output_norm"], None, hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
