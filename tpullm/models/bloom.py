"""BLOOM / MPT / JAIS decoders — the ALiBi fused-qkv family.

Reference graphs: llm_build_bloom (src/models/bloom.cpp), llm_build_mpt
(src/models/mpt.cpp), llm_build_jais (src/models/jais.cpp). Shared skeleton:
LayerNorm(+bias) pre-norms, fused attn_qkv, NO rope — position enters as the
per-head ALiBi bias — and a sequential residual chain.

Per-arch distinctives (optional tensors / hparams switches):
- bloom: token_embd_norm applied right after the embedding lookup.
- mpt: optional learned pos_embd, optional full-width q/k LayerNorm,
  f_clamp_kqv clamping, usually bias-free.
- jais: SiLU-gated FFN (ffn_gate), kq scale 1/head_dim instead of rsqrt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import alibi_distances, alibi_slopes, attention, attention_cached, causal_mask
from ..ops.norms import layer_norm
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
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                    p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "bo": maybe(p + "attn_output.bias"),
            # mpt full-width q/k LayerNorm (pre-head-split)
            "q_norm": maybe(p + "attn_q_norm.weight"),
            "q_norm_b": maybe(p + "attn_q_norm.bias"),
            "k_norm": maybe(p + "attn_k_norm.weight"),
            "k_norm_b": maybe(p + "attn_k_norm.bias"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "ffn_norm_b": maybe(p + "ffn_norm.bias"),
            "w_gate": linear(t[p + "ffn_gate.weight"]) if p + "ffn_gate.weight" in t else None,
            "b_gate": maybe(p + "ffn_gate.bias"),
            "w_up": linear(t[p + "ffn_up.weight"]),
            "b_up": maybe(p + "ffn_up.bias"),
            "w_down": linear(t[p + "ffn_down.weight"]),
            "b_down": maybe(p + "ffn_down.bias"),
        }
        if p + "attn_qkv.bias" in t:
            bqkv = t[p + "attn_qkv.bias"].to_numpy()
            layer["bq"] = jnp.asarray(bqkv[:n_q], jnp.float32)
            layer["bk"] = jnp.asarray(bqkv[n_q:n_q + n_kv], jnp.float32)
            layer["bv"] = jnp.asarray(bqkv[n_q + n_kv:n_q + 2 * n_kv], jnp.float32)
        else:
            layer["bq"] = layer["bk"] = layer["bv"] = None
        layers.append(layer)

    params: Params = {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "tok_norm": maybe("token_embd_norm.weight"),
        "tok_norm_b": maybe("token_embd_norm.bias"),
        "pos_embd": (load_embedding(t["position_embd.weight"], dtype=dtype)
                     if "position_embd.weight" in t else None),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output_norm_b": maybe("output_norm.bias"),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
    }
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
    # jais: kq_scale = 1/n_embd_head (llm_build_jais build_attn call)
    scale = (1.0 / hp.head_dim) if hp.arch == "jais" else hp.head_dim ** -0.5
    if params["tok_norm"] is not None:  # bloom inp_norm
        x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], hp.rms_eps)
    if params["pos_embd"] is not None:  # mpt learned positions
        x = x + params["pos_embd"][positions]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)
    alibi = (
        alibi_slopes(hp.n_head, hp.max_alibi_bias),
        alibi_distances(positions, cache.max_len),
    )

    for li, layer in enumerate(params["layers"]):
        h = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], hp.rms_eps)
        q = layer["wq"](h)
        k = layer["wk"](h)
        v = layer["wv"](h)
        if layer["bq"] is not None:
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
            v = v + layer["bv"].astype(v.dtype)
        if hp.clamp_kqv > 0.0:  # mpt
            q = jnp.clip(q, -hp.clamp_kqv, hp.clamp_kqv)
            k = jnp.clip(k, -hp.clamp_kqv, hp.clamp_kqv)
            v = jnp.clip(v, -hp.clamp_kqv, hp.clamp_kqv)
        if layer["q_norm"] is not None:  # mpt: LN over the full q/k width
            q = layer_norm(q, layer["q_norm"], layer["q_norm_b"], hp.rms_eps)
            k = layer_norm(k, layer["k_norm"], layer["k_norm_b"], hp.rms_eps)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets,
                             alibi=alibi)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["bo"] is not None:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)
        x = x + attn_out

        h = layer_norm(x, layer["ffn_norm"], layer["ffn_norm_b"], hp.rms_eps)
        up = layer["w_up"](h)
        if layer["b_up"] is not None:
            up = up + layer["b_up"].astype(up.dtype)
        if layer["w_gate"] is not None:  # jais swiglu
            gate = layer["w_gate"](h)
            if layer["b_gate"] is not None:
                gate = gate + layer["b_gate"].astype(gate.dtype)
            mid = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        else:
            mid = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(up.dtype)
        ffn = layer["w_down"](mid)
        if layer["b_down"] is not None:
            ffn = ffn + layer["b_down"].astype(ffn.dtype)
        x = x + ffn

    x = layer_norm(x, params["output_norm"], params["output_norm_b"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
