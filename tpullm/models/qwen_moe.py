"""Qwen2-MoE / Qwen3-MoE / DeepSeek-v1 / Granite-MoE decoders.

Reference graphs: llm_build_qwen2moe / llm_build_qwen3moe
(src/models/qwen2moe.cpp, qwen3moe.cpp), llm_build_deepseek
(src/models/deepseek.cpp), and llm_build_granite's MoE branch
(src/models/granite.cpp:164-197). Same GQA attention as the llama family
(qwen2moe adds attn biases, qwen3moe adds qk-norm — both handled by the
shared attn_block); the FFN is a routed expert mixture (ops/moe.py).

Variants ride optional tensors and hparams:
- deepseek: n_layer_dense_lead leading layers use a plain swiglu FFN
  (per-layer dense tensors), the rest MoE + an UNGATED shared expert and
  expert_weights_scale, un-renormalized softmax routing.
- qwen2moe: sigmoid-GATED shared expert (ffn_gate_inp_shexp), no renorm.
- qwen3moe / granite-moe: renormalized top-k routing; granite-moe adds the
  granite residual/embedding/logit multipliers (from GGUF keys) and an
  optional ungated shared expert.

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
from .weights import (load_embedding, load_expert_stack, load_linear,
                      load_vector)


def norm_weights_policy(hp: HParams) -> bool:
    """Whether top-k routing weights are renormalized for this arch
    (reference: build_moe_ffn's norm_w argument per graph). Shared by this
    forward and the pipeline-serving scan body."""
    return hp.expert_weights_norm or hp.arch in (
        "qwen3moe", "granitemoe", "ernie4_5-moe", "hunyuan-moe",
        "minimax-m2", "dots1", "bailingmoe2")


def _experts(info, dtype, mode: str = "auto"):
    """Stacked expert tensor (E, n_out, n_in) → QuantExpertStack (experts
    stay GGUF-packed in HBM, ≡ MUL_MAT_ID consuming quantized experts in
    place) or a dense x@w-ready [E, n_in, n_out] array when the type/shape
    can't stay packed or mode='dense'."""
    return load_expert_stack(info, mode=mode, dtype=dtype)


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_vector(name):
        return load_vector(t[name]) if name in t else None

    layers = []
    # bailingmoe2/glm4-moe keep trailing NextN/MTP predictor layers out of
    # the autoregressive pass (n_transformer_layers = n_layer - nextn)
    for i in range(hp.n_layer - hp.nextn_layers):
        p = f"blk.{i}."
        layer = {
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            # glm4-moe names its FFN pre-norm post_attention_norm
            # (llm_build_glm4_moe)
            "ffn_norm": load_vector(
                t[p + "ffn_norm.weight"] if p + "ffn_norm.weight" in t
                else t[p + "post_attention_norm.weight"]
            ),
            "bq": maybe_vector(p + "attn_q.bias"),
            "bk": maybe_vector(p + "attn_k.bias"),
            "bv": maybe_vector(p + "attn_v.bias"),
            "q_norm": maybe_vector(p + "attn_q_norm.weight"),
            "k_norm": maybe_vector(p + "attn_k_norm.weight"),
        }
        if p + "ffn_gate_exps.weight" in t:
            # MoE: router + stacked experts
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            layer["w_gate_exps"] = _experts(t[p + "ffn_gate_exps.weight"], dtype, mode)
            layer["w_up_exps"] = _experts(t[p + "ffn_up_exps.weight"], dtype, mode)
            layer["w_down_exps"] = _experts(t[p + "ffn_down_exps.weight"], dtype, mode)
        else:
            # deepseek dense lead layer (hparams.n_layer_dense_lead)
            layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["w_down"] = linear(p + "ffn_down.weight")
        if p + "exp_probs_b.bias" in t:  # ernie4_5-moe selection bias
            layer["exp_probs_b"] = load_vector(t[p + "exp_probs_b.bias"])
        # shared expert; sigmoid-gated when ffn_gate_inp_shexp exists
        # (qwen2moe), otherwise plainly added (deepseek/granite-moe)
        if p + "ffn_gate_shexp.weight" in t:
            if p + "ffn_gate_inp_shexp.weight" in t:
                layer["shexp_gate_inp"] = load_vector(t[p + "ffn_gate_inp_shexp.weight"]).reshape(-1)
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
    if hp.embd_scale != 1.0:  # granite-moe embedding multiplier
        x = x * jnp.asarray(hp.embd_scale, x.dtype)

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)

    # qwen3moe/granite-moe renormalize top-k weights; qwen2moe/deepseek do
    # not (reference: build_moe_ffn norm_w argument per graph)
    norm_w = norm_weights_policy(hp)

    for li, layer in enumerate(params["layers"]):
        x, cache = attn_block(
            hp, layer, x, positions, cache, li, cache_offset, mask, offsets
        )
        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        if "router" not in layer:  # deepseek dense lead layer
            gate = layer["w_gate"](hs)
            up = layer["w_up"](hs)
            ffn = layer["w_down"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )
        else:
            router_logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(
                router_logits, hp.n_expert_used,
                gating=hp.expert_gating_func, norm_weights=norm_w,
                scale=hp.expert_weights_scale,
                select_bias=layer.get("exp_probs_b"),
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
            if "shexp_gate_inp" in layer:  # qwen2moe sigmoid gate
                g = jax.nn.sigmoid(
                    (hs.astype(jnp.float32) @ layer["shexp_gate_inp"].astype(jnp.float32))
                )[:, None]
                sh = (sh.astype(jnp.float32) * g).astype(sh.dtype)
            ffn = ffn + sh.astype(ffn.dtype)
        if hp.residual_scale != 1.0:  # granite-moe
            ffn = ffn * jnp.asarray(hp.residual_scale, ffn.dtype)
        x = x + ffn.reshape(B, T, -1)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
