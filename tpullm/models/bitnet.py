"""BitNet b1.58 decoder (ternary-weight llama variant).

Reference graph: llm_build_bitnet (src/models/bitnet.cpp). The llama graph
plus: optional per-projection scalar weight scales (blk.N.*.scale — the
ternary TQ1_0/TQ2_0 codecs in tpullm.quant store the magnitudes there),
attn_sub_norm between the attention context and wo, ffn_sub_norm between
the swiglu activation and ffn_down, tied output head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import rms_norm
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

    def scale(name):
        return (float(t[name].to_numpy().reshape(-1)[0])
                if name in t else 1.0)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wq_s": scale(p + "attn_q.scale"),
            "wk": linear(p + "attn_k.weight"),
            "wk_s": scale(p + "attn_k.scale"),
            "wv": linear(p + "attn_v.weight"),
            "wv_s": scale(p + "attn_v.scale"),
            "attn_sub_norm": load_vector(t[p + "attn_sub_norm.weight"]),
            "wo": linear(p + "attn_output.weight"),
            "wo_s": scale(p + "attn_output.scale"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(p + "ffn_gate.weight"),
            "gate_s": scale(p + "ffn_gate.scale"),
            "w_up": linear(p + "ffn_up.weight"),
            "up_s": scale(p + "ffn_up.scale"),
            "ffn_sub_norm": load_vector(t[p + "ffn_sub_norm.weight"]),
            "w_down": linear(p + "ffn_down.weight"),
            "down_s": scale(p + "ffn_down.scale"),
        })

    params = {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        # tied head unless the checkpoint ships a separate lm_head
        "output": linear("output.weight") if "output.weight" in t else None,
    }
    # microsoft BitNet-b1.58-2B (transformers `bitnet`) swaps the gated silu
    # for gated ReLU²; the 1bitLLM variant (reference BitnetForCausalLM)
    # keeps silu. Leafless marker: key presence is static under jit.
    if str(r.metadata.get("bitnet.activation", "silu")) == "relu2":
        params["relu2"] = ()
    return params


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
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h) * layer["wq_s"]
        k = layer["wk"](h) * layer["wk_s"]
        v = layer["wv"](h) * layer["wv_s"]
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        ctx = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        ctx = ctx.reshape(B, T, hp.n_head * hp.head_dim_v)
        ctx = rms_norm(ctx, layer["attn_sub_norm"], hp.rms_eps)
        attn_out = layer["wo"](ctx) * layer["wo_s"]
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h) * layer["gate_s"]
        up = layer["w_up"](h) * layer["up_s"]
        g32 = gate.astype(jnp.float32)
        if "relu2" in params:
            g32 = jnp.square(jax.nn.relu(g32))
        else:
            g32 = jax.nn.silu(g32)
        act = g32.astype(up.dtype) * up
        act = rms_norm(act, layer["ffn_sub_norm"], hp.rms_eps)
        x = x + layer["w_down"](act) * layer["down_s"]

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        return params["output"](x).astype(jnp.float32), cache
    return jnp.dot(x, params["tok_embd"].T.astype(x.dtype)).astype(jnp.float32), cache
