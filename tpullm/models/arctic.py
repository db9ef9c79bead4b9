"""Arctic decoder (Snowflake).

Reference graph: llm_build_arctic (src/models/arctic.cpp): llama attention,
then TWO parallel FFN paths per layer — a small dense swiglu over the
post-attention residual (the "lora" path) and a renormalized-softmax MoE
whose input is the PRE-attention residual normed by ffn_norm_exps; outputs
sum. NORM-style rope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import causal_mask
from ..ops.moe import moe_ffn, route
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
            "q_norm": None, "k_norm": None,
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
            "ffn_norm_exps": load_vector(t[p + "ffn_norm_exps.weight"]),
            "router": linear(p + "ffn_gate_inp.weight"),
            "w_gate_exps": experts(p + "ffn_gate_exps.weight"),
            "w_up_exps": experts(p + "ffn_up_exps.weight"),
            "w_down_exps": experts(p + "ffn_down_exps.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
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

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        inp_sa = x
        x, cache = attn_block(
            hp, layer, x, positions, cache, li, cache_offset, mask, offsets
        )  # x = attn + residual (= ffn_inp)
        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        dense = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        ffn_out = x + dense

        h2 = rms_norm(inp_sa, layer["ffn_norm_exps"], hp.rms_eps)
        hs = h2.reshape(B * T, -1)
        logits = layer["router"](hs).astype(jnp.float32)
        weights, idx = route(logits, hp.n_expert_used, gating="softmax",
                             norm_weights=True)
        moe = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                      layer["w_up_exps"], layer["w_down_exps"]).reshape(B, T, -1)
        x = moe + ffn_out

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
