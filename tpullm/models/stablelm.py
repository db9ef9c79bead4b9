"""StableLM decoder (reference graph: llm_build_stablelm,
src/models/stablelm.cpp).

Distinctives: LayerNorm(+bias) pre-norms, optional biased q/k/v, optional
per-head LayerNorm (not RMS) on q/k, PARTIAL neox rope (rope_pct of
head_dim), gated SiLU FFN; when ffn_norm is absent the FFN runs in parallel
off the attention-norm output.
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

    def maybe(name):
        return load_vector(t[name]) if name in t else None

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "bq": maybe(p + "attn_q.bias"),
            "bk": maybe(p + "attn_k.bias"),
            "bv": maybe(p + "attn_v.bias"),
            "q_norm": maybe(p + "attn_q_norm.weight"),  # per-head LN
            "k_norm": maybe(p + "attn_k_norm.weight"),
            "ffn_norm": maybe(p + "ffn_norm.weight"),
            "ffn_norm_b": maybe(p + "ffn_norm.bias"),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output_norm_b": maybe("output_norm.bias"),
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
    x = params["tok_embd"][tokens]
    scale = hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)

    for li, layer in enumerate(params["layers"]):
        h = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], hp.rms_eps)
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
        if layer["q_norm"] is not None:  # per-head LayerNorm, no bias
            q = layer_norm(q, layer["q_norm"].reshape(hp.n_head, hp.head_dim),
                           None, hp.rms_eps)
        if layer["k_norm"] is not None:
            k = layer_norm(k, layer["k_norm"].reshape(hp.n_head_kv, hp.head_dim),
                           None, hp.rms_eps)
        q = apply_rope(q, positions, hp.rope)  # partial: rope.dims of head_dim
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        ffn_inp = x + attn_out

        if layer["ffn_norm"] is not None:
            hf = layer_norm(ffn_inp, layer["ffn_norm"], layer["ffn_norm_b"],
                            hp.rms_eps)
        else:  # parallel residual: FFN reads the attention-norm output
            hf = h
        gate = layer["w_gate"](hf)
        up = layer["w_up"](hf)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = ffn_inp + ffn

    x = layer_norm(x, params["output_norm"], params["output_norm_b"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
