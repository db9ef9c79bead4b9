"""Qwen2-MoE / Qwen3-MoE decoders.

Reference graphs: llm_build_qwen2moe / llm_build_qwen3moe
(src/models/qwen2moe.cpp, qwen3moe.cpp). Same GQA attention as the llama
family (qwen2moe adds attn biases, qwen3moe adds qk-norm — both handled by
the shared attn_block); the FFN is a routed expert mixture
(ops/moe.py), plus — qwen2moe only — a sigmoid-gated shared expert.

Expert weights are stored stacked: blk.N.ffn_{gate,up,down}_exps.weight with
logical shape (n_expert, n_ff_exp, n_embd) / (n_expert, n_embd, n_ff_exp).
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
from .weights import load_embedding, load_linear, load_vector


def _experts(info, dtype) -> jax.Array:
    """Stacked expert tensor (E, a, b) → device array [E, b, a] so each
    expert slice is an x@w-ready [n_in, n_out] matrix."""
    w = info.to_numpy()  # (E, n_out, n_in)
    return jnp.asarray(np.ascontiguousarray(w.transpose(0, 2, 1)), dtype=dtype)


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_vector(name):
        return load_vector(t[name]) if name in t else None

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "bq": maybe_vector(p + "attn_q.bias"),
            "bk": maybe_vector(p + "attn_k.bias"),
            "bv": maybe_vector(p + "attn_v.bias"),
            "q_norm": maybe_vector(p + "attn_q_norm.weight"),
            "k_norm": maybe_vector(p + "attn_k_norm.weight"),
            # MoE: router + stacked experts
            "router": linear(p + "ffn_gate_inp.weight"),
            "w_gate_exps": _experts(t[p + "ffn_gate_exps.weight"], dtype),
            "w_up_exps": _experts(t[p + "ffn_up_exps.weight"], dtype),
            "w_down_exps": _experts(t[p + "ffn_down_exps.weight"], dtype),
        }
        # qwen2moe shared expert (sigmoid-gated, always active)
        if p + "ffn_gate_shexp.weight" in t:
            layer["shexp_gate_inp"] = load_vector(t[p + "ffn_gate_inp_shexp.weight"])
            layer["w_gate_shexp"] = linear(p + "ffn_gate_shexp.weight")
            layer["w_up_shexp"] = linear(p + "ffn_up_shexp.weight")
            layer["w_down_shexp"] = linear(p + "ffn_down_shexp.weight")
        layers.append(layer)

    params: Params = {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
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

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)

    # qwen3moe renormalizes top-k weights; qwen2moe does not
    # (reference: qwen3moe.cpp build_moe_ffn(..., norm_w=true),
    #  qwen2moe.cpp norm_w=false)
    norm_w = hp.expert_weights_norm or hp.arch == "qwen3moe"

    for li, layer in enumerate(params["layers"]):
        x, cache = attn_block(
            hp, layer, x, positions, cache, li, cache_offset, mask, offsets
        )
        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        router_logits = layer["router"](hs).astype(jnp.float32)
        weights, idx = route(
            router_logits, hp.n_expert_used,
            gating=hp.expert_gating_func, norm_weights=norm_w,
            scale=hp.expert_weights_scale,
        )
        ffn = moe_ffn(
            hs, weights, idx,
            layer["w_gate_exps"], layer["w_up_exps"], layer["w_down_exps"],
        )
        if "w_gate_shexp" in layer:
            gate = layer["w_gate_shexp"](hs)
            up = layer["w_up_shexp"](hs)
            sh = layer["w_down_shexp"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )
            # sigmoid gate over the shared expert's contribution
            g = jax.nn.sigmoid(
                (hs.astype(jnp.float32) @ layer["shexp_gate_inp"].astype(jnp.float32))
            )[:, None]
            ffn = ffn + (sh.astype(jnp.float32) * g).astype(ffn.dtype)
        x = x + ffn.reshape(B, T, -1)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
