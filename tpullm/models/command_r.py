"""Command-R decoder (reference graph: llm_build_command_r,
src/models/command-r.cpp).

Distinctives: LayerNorm (no bias) instead of RMSNorm, PARALLEL attention+FFN
from the same normed input (x + attn(norm(x)) + ffn(norm(x))), optional
per-head q/k LayerNorm, neox rope, logit_scale on the output head, tied
embeddings.
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
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_vec(name):
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
            "q_norm": maybe_vec(p + "attn_q_norm.weight"),  # per-head LN
            "k_norm": maybe_vec(p + "attn_k_norm.weight"),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
        "logit_scale": float(
            r.metadata.get(f"{hp.arch}.logit_scale", 1.0) or 1.0
        ),
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
        h = layer_norm(x, layer["attn_norm"], None, hp.rms_eps)

        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if layer["q_norm"] is not None:  # per-head LayerNorm (c4ai-r-plus)
            q = layer_norm(q, layer["q_norm"].reshape(hp.n_head, hp.head_dim),
                           None, hp.rms_eps)
            k = layer_norm(k, layer["k_norm"].reshape(hp.n_head_kv, hp.head_dim),
                           None, hp.rms_eps)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        # parallel FFN from the SAME normed input
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = x + attn_out + ffn

    x = layer_norm(x, params["output_norm"], None, hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32) * params["logit_scale"], cache
