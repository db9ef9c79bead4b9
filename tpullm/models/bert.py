"""BERT-family encoders (reference graph: llm_build_bert, src/models/bert.cpp,
plus llm_build_neo_bert / llm_build_modern_bert).

Variants on the post-norm graph (all bidirectional, no KV cache, hidden
states pooled by the embeddings pipeline ≡ llama_pooling_type):
- bert: learned positions, biased projections, GELU sequential FFN
- nomic-bert: rope (neox), silu parallel FFN, no position embeddings
- nomic-bert-moe: fused biased qkv + GELU up/down-only MoE on every Nth
  layer (hparams.moe_every_n_layers), GELU sequential elsewhere
- jina-bert-v2: optional fused GEGLU FFN, second attention norm
- jina-bert-v3: rope + GELU sequential FFN
neo-bert (pre-norm RMS, fused qkv, NORM rope, fused-swiglu FFN) and
modern-bert (pre-norm LN, fused qkv, symmetric sliding window on local
layers with a local rope base, fused-GEGLU FFN) get their own forwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention_reference
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params
from .phi3 import slice_rows
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)

# archs whose bert-graph attention applies rope (bert.cpp rope branch)
ROPE_BERT_ARCHS = {"nomic-bert", "nomic-bert-moe", "jina-bert-v3"}


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    import numpy as np

    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe_vec(name):
        return load_vector(t[name]) if name in t else None

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        if p + "attn_qkv.weight" in t:  # nomic fused qkv
            qkv = t[p + "attn_qkv.weight"]
            wq = linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight"))
            wk = linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight"))
            wv = linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                   p + "attn_v.weight"))
            bqkv = maybe_vec(p + "attn_qkv.bias")
            bq = bk = bv = None
            if bqkv is not None:
                bq = bqkv[:n_q]
                bk = bqkv[n_q:n_q + n_kv]
                bv = bqkv[n_q + n_kv:]
        else:
            wq = linear(t[p + "attn_q.weight"])
            wk = linear(t[p + "attn_k.weight"])
            wv = linear(t[p + "attn_v.weight"])
            bq = maybe_vec(p + "attn_q.bias")
            bk = maybe_vec(p + "attn_k.bias")
            bv = maybe_vec(p + "attn_v.bias")
        layer = {
            "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
            "wo": linear(t[p + "attn_output.weight"]),
            "bo": maybe_vec(p + "attn_output.bias"),
            "q_norm": maybe_vec(p + "attn_q_norm.weight"),
            "q_norm_b": maybe_vec(p + "attn_q_norm.bias"),
            "k_norm": maybe_vec(p + "attn_k_norm.weight"),
            "k_norm_b": maybe_vec(p + "attn_k_norm.bias"),
            "attn_out_norm": vec(p + "attn_output_norm.weight"),
            "attn_out_norm_b": maybe_vec(p + "attn_output_norm.bias"),
            # jina-v2 second attention norm
            "attn_norm_2": maybe_vec(p + "attn_norm_2.weight"),
            "attn_norm_2_b": maybe_vec(p + "attn_norm_2.bias"),
            "ffn_out_norm": vec(p + "layer_output_norm.weight"),
            "ffn_out_norm_b": maybe_vec(p + "layer_output_norm.bias"),
        }
        if p + "ffn_up_exps.weight" in t:  # nomic-bert-moe MoE layer
            def experts(name):
                return load_expert_stack(t[name], mode=mode, dtype=dtype)

            layer["router"] = linear(t[p + "ffn_gate_inp.weight"])
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
        else:
            layer["w_up"] = linear(t[p + "ffn_up.weight"])
            layer["b_up"] = maybe_vec(p + "ffn_up.bias")
            layer["w_gate"] = (linear(t[p + "ffn_gate.weight"])
                               if p + "ffn_gate.weight" in t else None)
            layer["w_down"] = linear(t[p + "ffn_down.weight"])
            layer["b_down"] = maybe_vec(p + "ffn_down.bias")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "pos_embd": (load_embedding(t["position_embd.weight"], dtype=dtype)
                     if "position_embd.weight" in t else None),
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


def _valid_mask(cache_offset, B, T):
    n_valid = jnp.asarray(cache_offset).reshape(-1, 1, 1)
    valid = jnp.arange(T)[None, None, :] < jnp.maximum(n_valid, 1)
    return jnp.broadcast_to(valid, (B, T, T))


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
    x = params["tok_embd"][tokens]
    if params["type_embd"] is not None:
        x = x + params["type_embd"][0]  # token type 0 (single segment)
    if params["pos_embd"] is not None:  # bert only (nomic/jina-v3 use rope)
        x = x + params["pos_embd"][positions]
    x = layer_norm(x, params["embd_norm"], params["embd_norm_b"], hp.rms_eps)
    scale = hp.head_dim ** -0.5
    use_rope = hp.arch in ROPE_BERT_ARCHS
    mask = _valid_mask(cache_offset, B, T)

    for li, layer in enumerate(params["layers"]):
        q = layer["wq"](x)
        k = layer["wk"](x)
        v = layer["wv"](x)
        if layer["bq"] is not None:
            q = q + layer["bq"].astype(q.dtype)
        if layer["bk"] is not None:
            k = k + layer["bk"].astype(k.dtype)
        if layer["bv"] is not None:
            v = v + layer["bv"].astype(v.dtype)
        # full-width LayerNorm qk norms (jina variants)
        if layer["q_norm"] is not None:
            q = layer_norm(q, layer["q_norm"], layer["q_norm_b"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = layer_norm(k, layer["k_norm"], layer["k_norm_b"], hp.rms_eps)
        q = q.reshape(B, T, hp.n_head, hp.head_dim)
        k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if use_rope:
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
        attn = attention_reference(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask, scale
        )
        attn = layer["wo"](attn.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["bo"] is not None:
            attn = attn + layer["bo"].astype(attn.dtype)
        res = x
        x = layer_norm(res + attn, layer["attn_out_norm"],
                       layer["attn_out_norm_b"], hp.rms_eps)
        if layer["attn_norm_2"] is not None:  # jina-v2 re-add + norm
            x = layer_norm(x + res, layer["attn_norm_2"],
                           layer["attn_norm_2_b"], hp.rms_eps)

        if "router" in layer:
            # nomic-bert-moe: GELU up/down-only experts, plain softmax
            # top-k — the shared MoE ops handle packed QuantExpertStacks
            # (the old direct `stack[idx]` gather crashed on them)
            from ..ops.moe import moe_ffn, route

            hs = x.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            w_sel, idx = route(logits, hp.n_expert_used, gating="softmax",
                               norm_weights=False)
            down = moe_ffn(hs, w_sel, idx, None, layer["w_up_exps"],
                           layer["w_down_exps"],
                           act="gelu").reshape(B, T, -1)
        elif layer["w_gate"] is not None:
            # parallel gated FFN: nomic silu, jina-v2 gelu
            gate = layer["w_gate"](x)
            up = layer["w_up"](x)
            af = (jax.nn.silu if hp.arch == "nomic-bert" else
                  lambda z: jax.nn.gelu(z, approximate=True))
            down = layer["w_down"](
                af(gate.astype(jnp.float32)).astype(up.dtype) * up)
        else:
            up = layer["w_up"](x)
            if layer["b_up"] is not None:
                up = up + layer["b_up"].astype(up.dtype)
            n_out = up.shape[-1]
            if hp.n_ff and n_out == 2 * hp.n_ff:  # jina-v2 fused GEGLU
                gate, u = up[..., :hp.n_ff], up[..., hp.n_ff:]
                act = jax.nn.gelu(gate.astype(jnp.float32),
                                  approximate=True).astype(u.dtype) * u
            else:
                act = jax.nn.gelu(up.astype(jnp.float32),
                                  approximate=True).astype(up.dtype)
            down = layer["w_down"](act)
            if layer["b_down"] is not None:
                down = down + layer["b_down"].astype(down.dtype)
        x = layer_norm(x + down, layer["ffn_out_norm"],
                       layer["ffn_out_norm_b"], hp.rms_eps)

    return x.astype(jnp.float32), cache


# -- neo-bert (llm_build_neo_bert) --------------------------------------------


def build_params_neo(r: GGUFReader, hp: HParams, mode: str = "auto",
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
        up = t[p + "ffn_up.weight"]
        n_ff = up.shape[1] // 2
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                    p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            # fused swiglu: first half gate, second half up
            "w_gate": linear(slice_rows(up, 0, n_ff, p + "ffn_gate.weight")),
            "w_up": linear(slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight")),
            "w_down": linear(t[p + "ffn_down.weight"]),
        })
    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["enc.output_norm.weight"]),
    }


def forward_neo(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    cache_offset,
    return_hidden: bool = True,
) -> tuple[jax.Array, KVCache]:
    B, T = tokens.shape
    x = params["tok_embd"][tokens]
    scale = hp.head_dim ** -0.5
    mask = _valid_mask(cache_offset, B, T)

    for layer in params["layers"]:
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        attn = attention_reference(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask, scale
        )
        x = x + layer["wo"](attn.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        x = x + layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    return x.astype(jnp.float32), cache


# -- modern-bert (llm_build_modern_bert) --------------------------------------


def build_params_modern(r: GGUFReader, hp: HParams, mode: str = "auto",
                        dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    def maybe_vec(name):
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
            # layer 0 has no attention norm (Identity in HF ModernBERT)
            "attn_norm": maybe_vec(p + "attn_norm.weight"),
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                    p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(slice_rows(up, 0, n_ff, p + "ffn_gate.weight")),
            "w_up": linear(slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight")),
            "w_down": linear(t[p + "ffn_down.weight"]),
        })
    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "embd_norm": load_vector(t["token_embd_norm.weight"]),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
    }


def forward_modern(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    cache_offset,
    return_hidden: bool = True,
) -> tuple[jax.Array, KVCache]:
    from dataclasses import replace

    B, T = tokens.shape
    x = params["tok_embd"][tokens]
    x = layer_norm(x, params["embd_norm"], None, hp.rms_eps)
    scale = hp.head_dim ** -0.5
    mask_full = _valid_mask(cache_offset, B, T)
    if hp.sliding_window > 0:
        # LLAMA_SWA_TYPE_SYMMETRIC: |key_pos - q_pos| <= n_swa/2
        half = hp.sliding_window // 2
        diff = positions[:, :, None] - positions[:, None, :]
        mask_swa = mask_full & (jnp.abs(diff) <= half)
    else:
        mask_swa = mask_full
    rope_global = hp.rope
    rope_swa = (replace(hp.rope, freq_base=hp.rope_freq_base_swa)
                if hp.rope_freq_base_swa > 0 else hp.rope)

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        h = x
        if layer["attn_norm"] is not None:
            h = layer_norm(x, layer["attn_norm"], None, hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        rope = rope_swa if swa else rope_global
        q = apply_rope(q, positions, rope)
        k = apply_rope(k, positions, rope)
        attn = attention_reference(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            mask_swa if swa else mask_full, scale,
        )
        x = x + layer["wo"](attn.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = layer_norm(x, layer["ffn_norm"], None, hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        x = x + layer["w_down"](
            jax.nn.gelu(gate.astype(jnp.float32), approximate=True
                        ).astype(up.dtype) * up
        )

    x = layer_norm(x, params["output_norm"], None, hp.rms_eps)
    return x.astype(jnp.float32), cache
