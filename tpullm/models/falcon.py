"""Falcon / GPT-NeoX decoders.

Reference graphs: llm_build_falcon (src/models/falcon.cpp) and
llm_build_gptneox (src/models/gptneox.cpp). Shared skeleton: LayerNorm(+bias)
norms, fused attn_qkv (Q rows, then K, then V), neox rope (partial for
gptneox via rope.dimension_count), sequential GELU FFN.

Residual layouts differ:
- falcon (always parallel): x = x + attn(norm(x)) + ffn(attn_norm(x)); the
  FFN consumes the FIRST norm's output — Falcon-40B adds attn_norm_2 whose
  output feeds attention instead.
- gptneox: sequential by default; hparams.use_par_res switches to
  x + attn(ln1(x)) + ffn(ln2(x)) with a dedicated ffn_norm.
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
        qkv = t[p + "attn_qkv.weight"]
        layer = {
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "attn_norm_2": maybe(p + "attn_norm_2.weight"),
            "attn_norm_2_b": maybe(p + "attn_norm_2.bias"),
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                    p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "bo": maybe(p + "attn_output.bias"),
            "ffn_norm": maybe(p + "ffn_norm.weight"),
            "ffn_norm_b": maybe(p + "ffn_norm.bias"),
            "w_up": linear(t[p + "ffn_up.weight"]),
            "b_up": maybe(p + "ffn_up.bias"),
            "w_down": linear(t[p + "ffn_down.weight"]),
            "b_down": maybe(p + "ffn_down.bias"),
        }
        if p + "attn_qkv.bias" in t:  # gptneox
            bqkv = t[p + "attn_qkv.bias"].to_numpy()
            layer["bq"] = jnp.asarray(bqkv[:n_q], jnp.float32)
            layer["bk"] = jnp.asarray(bqkv[n_q:n_q + n_kv], jnp.float32)
            layer["bv"] = jnp.asarray(bqkv[n_q + n_kv:n_q + 2 * n_kv], jnp.float32)
        else:
            layer["bq"] = layer["bk"] = layer["bv"] = None
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output_norm_b": maybe("output_norm.bias"),
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
    is_falcon = hp.arch == "falcon"

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    def gelu(z):
        return jax.nn.gelu(z.astype(jnp.float32), approximate=False).astype(z.dtype)

    for li, layer in enumerate(params["layers"]):
        a_norm = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], hp.rms_eps)
        if layer["attn_norm_2"] is not None:  # falcon-40B: norm_2 → attention
            h = layer_norm(x, layer["attn_norm_2"], layer["attn_norm_2_b"], hp.rms_eps)
        else:
            h = a_norm
        q = layer["wq"](h)
        k = layer["wk"](h)
        v = layer["wv"](h)
        if layer["bq"] is not None:
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
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
        if layer["bo"] is not None:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)

        def ffn(z):
            up = layer["w_up"](z)
            if layer["b_up"] is not None:
                up = up + layer["b_up"].astype(up.dtype)
            down = layer["w_down"](gelu(up))
            if layer["b_down"] is not None:
                down = down + layer["b_down"].astype(down.dtype)
            return down

        if is_falcon:  # parallel; FFN eats the first norm's output
            x = x + attn_out + ffn(a_norm)
        elif hp.par_residual:  # gptneox parallel: dedicated ffn_norm over x
            f_norm = layer_norm(x, layer["ffn_norm"], layer["ffn_norm_b"], hp.rms_eps)
            x = x + attn_out + ffn(f_norm)
        else:  # gptneox sequential
            x = x + attn_out
            f_norm = layer_norm(x, layer["ffn_norm"], layer["ffn_norm_b"], hp.rms_eps)
            x = x + ffn(f_norm)

    x = layer_norm(x, params["output_norm"], params["output_norm_b"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
