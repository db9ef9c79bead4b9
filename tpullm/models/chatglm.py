"""ChatGLM / GLM-4 decoders.

Reference graphs: llm_build_chatglm (src/models/chatglm.cpp) and
llm_build_glm4 (src/models/glm4.cpp). Shared skeleton: RMSNorm pre-norms,
split-or-fused qkv (+optional biases), partial NORM-style rope
(rope.dimension_count < head_dim, interleaved pairs), fused gate_up SWIGLU
FFN (ffn_up holds [gate; up] halves, silu(gate)·up), separate output head.

glm4 additionally applies post-norms: attn output → post_attention_norm
before the residual add, FFN output → post_ffw_norm likewise.
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
            "wo": linear(t[p + "attn_output.weight"]),
            "attn_post_norm": maybe(p + "post_attention_norm.weight"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "ffn_post_norm": maybe(p + "post_ffw_norm.weight"),
            "w_down": linear(t[p + "ffn_down.weight"]),
        }
        if p + "attn_qkv.weight" in t:  # fused (chatglm GGUFs)
            qkv = t[p + "attn_qkv.weight"]
            layer["wq"] = linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight"))
            layer["wk"] = linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight"))
            layer["wv"] = linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                            p + "attn_v.weight"))
            if p + "attn_qkv.bias" in t:
                import numpy as np  # noqa: F401

                bqkv = t[p + "attn_qkv.bias"].to_numpy()
                layer["bq"] = jnp.asarray(bqkv[:n_q], jnp.float32)
                layer["bk"] = jnp.asarray(bqkv[n_q:n_q + n_kv], jnp.float32)
                layer["bv"] = jnp.asarray(bqkv[n_q + n_kv:n_q + 2 * n_kv], jnp.float32)
            else:
                layer["bq"] = layer["bk"] = layer["bv"] = None
        else:  # split (glm4 GGUFs)
            layer["wq"] = linear(t[p + "attn_q.weight"])
            layer["wk"] = linear(t[p + "attn_k.weight"])
            layer["wv"] = linear(t[p + "attn_v.weight"])
            layer["bq"] = maybe(p + "attn_q.bias")
            layer["bk"] = maybe(p + "attn_k.bias")
            layer["bv"] = maybe(p + "attn_v.bias")
        # fused [gate; up] halves (build_ffn LLM_FFN_SWIGLU over ffn_up)
        up = t[p + "ffn_up.weight"]
        n_ff = up.shape[1] // 2
        layer["w_gate"] = linear(slice_rows(up, 0, n_ff, p + "ffn_gate.weight"))
        layer["w_up"] = linear(slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight"))
        layers.append(layer)

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

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
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
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["attn_post_norm"] is not None:  # glm4
            attn_out = rms_norm(attn_out, layer["attn_post_norm"], hp.rms_eps)
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        if layer["ffn_post_norm"] is not None:  # glm4
            ffn = rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ffn

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
