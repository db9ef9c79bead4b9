"""Phi-3 decoder (reference graph: llm_build_phi3, src/models/phi3.cpp).

Phi-3 is llama-graph-identical once its fused projections are split:
  blk.N.attn_qkv.weight  [n_embd+2·n_embd_gqa, n_embd] → wq | wk | wv
  blk.N.ffn_up.weight    [2·n_ff, n_embd]              → gate | up
(ggml splits them with views inside the graph — ggml_swiglu's first half is
the gate; here the split happens once at load. Packed quant rows are
self-contained blocks, so row-slicing packed payloads is free.)
Partial rotary (n_rot < head_dim) and SWA come through hparams/rope as usual.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace

import jax.numpy as jnp

from ..gguf.constants import TYPE_TRAITS
from ..gguf.reader import GGUFReader, GGUFTensorInfo
from .hparams import HParams
from .llama import Params, forward as llama_forward  # noqa: F401 (registered with llama.forward)
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)


def slice_rows(info: GGUFTensorInfo, start: int, end: int, name: str) -> GGUFTensorInfo:
    """Row-slice a packed 2-D weight (logical rows = output features)."""
    n_in = info.shape[0]
    tt = TYPE_TRAITS[info.ggml_type]
    row_bytes = n_in // tt.block_size * tt.type_size
    return GGUFTensorInfo(
        name=name,
        ggml_type=info.ggml_type,
        shape=(n_in, end - start),
        offset=0,
        data=info.data[start * row_bytes : end * row_bytes],
    )


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    def maybe_vector(name):
        return load_vector(t[name]) if name in t else None

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        qkv = t[p + "attn_qkv.weight"]
        up = t[p + "ffn_up.weight"]
        n_ff = up.shape[1] // 2
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv, p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(slice_rows(up, 0, n_ff, p + "ffn_gate.weight")),
            "w_up": linear(slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight")),
            "w_down": linear(t[p + "ffn_down.weight"]),
            "bq": None, "bk": None, "bv": None,
            "q_norm": maybe_vector(p + "attn_q_norm.weight"),
            "k_norm": maybe_vector(p + "attn_k_norm.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
    }


def build_params_moe(r: GGUFReader, hp: HParams, mode: str = "auto",
                     dtype=jnp.bfloat16) -> Params:
    """PhiMoE tensor set (llama-model.cpp LLM_ARCH_PHIMOE): RMS norms carry
    biases, q/k/v arrive split with biases (or fused attn_qkv), wo/output
    have biases, FFN slot is a renormalized-softmax MoE."""
    import numpy as np

    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe(name):
        return load_vector(t[name]) if name in t else None

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        if p + "attn_qkv.weight" in t:
            qkv = t[p + "attn_qkv.weight"]
            wq = linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight"))
            wk = linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight"))
            wv = linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                   p + "attn_v.weight"))
        else:
            wq = linear(t[p + "attn_q.weight"])
            wk = linear(t[p + "attn_k.weight"])
            wv = linear(t[p + "attn_v.weight"])
        layers.append({
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "wq": wq, "wk": wk, "wv": wv,
            "bq": maybe(p + "attn_q.bias"),
            "bk": maybe(p + "attn_k.bias"),
            "bv": maybe(p + "attn_v.bias"),
            "wo": linear(t[p + "attn_output.weight"]),
            "bo": maybe(p + "attn_output.bias"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "ffn_norm_b": maybe(p + "ffn_norm.bias"),
            "router": linear(t[p + "ffn_gate_inp.weight"]),
            "w_gate_exps": experts(p + "ffn_gate_exps.weight"),
            "w_up_exps": experts(p + "ffn_up_exps.weight"),
            "w_down_exps": experts(p + "ffn_down_exps.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output_norm_b": (load_vector(t["output_norm.bias"])
                          if "output_norm.bias" in t else None),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
        "output_b": (load_vector(t["output.bias"])
                     if "output.bias" in t else None),
    }


def forward_moe(
    hp: HParams,
    params: Params,
    tokens,
    positions,
    cache,
    cache_offset,
    return_hidden: bool = False,
):
    """PhiMoE forward (llm_build_phi3 MoE branch): phi3 attention with
    RMS+bias norms, softmax renormalized top-k MoE, biased output head."""
    import jax
    from ..ops.attention import attention, attention_cached, causal_mask
    from ..ops.moe import moe_ffn, route, route_sparsemixer
    from ..ops.norms import layer_norm, rms_norm
    from ..ops.rope import apply_rope

    B, T = tokens.shape
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    def norm_b(v, w, b):
        # PhiMoE norms are TRUE LayerNorms (modeling_phimoe nn.LayerNorm,
        # mean-subtracted); a bias-carrying norm marks the phimoe variant.
        # (The reference folds them into the phi3 RMS graph — phi3.cpp:39 —
        # which drifts from HF; we keep exact HF semantics.)
        if b is not None:
            return layer_norm(v, w, b, hp.rms_eps)
        return rms_norm(v, w, hp.rms_eps)

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)

    for li, layer in enumerate(params["layers"]):
        h = norm_b(x, layer["attn_norm"], layer["attn_norm_b"])
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
            q, cache, li, mask, scale, offsets=offsets,
                             sliding_window=hp.sliding_window)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["bo"] is not None:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)
        x = x + attn_out

        h = norm_b(x, layer["ffn_norm"], layer["ffn_norm_b"])
        hs = h.reshape(B * T, -1)
        logits = layer["router"](hs).astype(jnp.float32)
        if hp.n_expert_used == 2:
            # PhiMoE routes with sparsemixer (un-renormalized banded
            # softmax); the reference's softmax+renorm (phi3.cpp:109) is an
            # approximation of it
            weights, idx = route_sparsemixer(logits)
        else:
            weights, idx = route(logits, hp.n_expert_used, gating="softmax",
                                 norm_weights=True)
        ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                      layer["w_up_exps"], layer["w_down_exps"])
        x = x + ffn.reshape(B, T, -1)

    x = norm_b(x, params["output_norm"], params.get("output_norm_b"))
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    if params.get("output_b") is not None:
        logits = logits + params["output_b"].astype(logits.dtype)
    return logits.astype(jnp.float32), cache
