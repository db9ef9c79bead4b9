"""GroveMoE decoder (adjugate-expert MoE).

Reference graph: llm_build_grovemoe (src/models/grovemoe.cpp): qwen3-style
attention (per-head qk norms), then a two-stage MoE — the regular experts run
on the normed input with softmax weights renormalized over top-k experts
SELECTED BY SIGMOID (build_moe_ffn's GROVEMOE override), and the "chunk"
(adjugate) experts run ON THE REGULAR MoE OUTPUT with the same selection
mapped to chunk ids (expert_id // experts_per_group), scaled by
expert_group_scale, both summed into the residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import causal_mask
from ..ops.moe import moe_ffn
from ..ops.norms import rms_norm
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, attn_block, output_head
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_vec(name):
        return load_vector(t[name]) if name in t else None

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "bq": None, "bk": None, "bv": None,
            "bo": maybe_vec(p + "attn_output.bias"),
            "q_norm": load_vector(t[p + "attn_q_norm.weight"]),
            "k_norm": load_vector(t[p + "attn_k_norm.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "router": linear(p + "ffn_gate_inp.weight"),
            "w_gate_exps": experts(p + "ffn_gate_exps.weight"),
            "w_up_exps": experts(p + "ffn_up_exps.weight"),
            "w_down_exps": experts(p + "ffn_down_exps.weight"),
            "w_gate_chexps": experts(p + "ffn_gate_chexps.weight"),
            "w_up_chexps": experts(p + "ffn_up_chexps.weight"),
            "w_down_chexps": experts(p + "ffn_down_chexps.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _renorm(w):
    return w / jnp.clip(w.sum(-1, keepdims=True), 6.103515625e-5)


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
    n_chunk = hp.n_expert // hp.n_group_experts
    k1 = hp.n_expert_used
    k2 = min(k1, n_chunk)
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        x, cache = attn_block(
            hp, layer, x, positions, cache, li, cache_offset, mask, offsets
        )
        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        logits = layer["router"](hs).astype(jnp.float32)
        sel = jax.nn.sigmoid(logits)  # GROVEMOE: selection by sigmoid
        probs = jax.nn.softmax(logits, axis=-1)  # weights from softmax
        _, idx = jax.lax.top_k(sel, k1)
        w1 = _renorm(jnp.take_along_axis(probs, idx, axis=-1))
        moe1 = moe_ffn(hs, w1, idx.astype(jnp.int32), layer["w_gate_exps"],
                       layer["w_up_exps"], layer["w_down_exps"])
        # adjugate experts consume the REGULAR MoE output; ids map to chunks
        idx2 = (idx[:, :k2] // hp.n_group_experts).astype(jnp.int32)
        w2 = _renorm(jnp.take_along_axis(probs, idx2, axis=-1))
        adj = moe_ffn(moe1, w2, idx2, layer["w_gate_chexps"],
                      layer["w_up_chexps"], layer["w_down_chexps"])
        cur = moe1 + (adj.astype(jnp.float32)
                      * hp.expert_group_scale).astype(moe1.dtype)
        x = x + cur.reshape(B, T, -1)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
