"""gpt-oss (openai-moe) decoder.

Reference graph: llm_build_openai_moe_iswa (src/models/openai-moe-iswa.cpp).
Distinctives: attention SINKS (per-head scalar folded into the softmax
denominator, blk.N.attn_sinks.weight), alternating SWA (pattern 2), biased
q/k/v/o projections, MoE with biased router + biased expert tensors,
softmax-over-selected-logits routing (SOFTMAX_WEIGHT) and the clamped
swiglu_oai activation (α=1.702, limit=7; ggml_swiglu_oai).

TPU notes: the MoE runs in the all-experts regime (every expert computes
every token; the top-k one-hot mixes) — one big MXU batch instead of gathers.
The sink correction is one extra column in the softmax normalizer, fused by
XLA into the attention epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention_cached, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .weights import load_expert_stack, load_embedding, load_linear, load_vector

SWIGLU_ALPHA = 1.702
SWIGLU_LIMIT = 7.0


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe(name):
        return vec(name) if name in t else None

    def exps(name):
        # weights stay GGUF-packed (MXFP4 in the real checkpoints —
        # ≡ mmid.cu on quantized experts); [E, n_in, n_out] bf16 fallback
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    def exp_bias(name):
        return jnp.asarray(t[name].to_numpy(), dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": vec(p + "attn_norm.weight"),
            "wq": linear(p + "attn_q.weight"), "bq": maybe(p + "attn_q.bias"),
            "wk": linear(p + "attn_k.weight"), "bk": maybe(p + "attn_k.bias"),
            "wv": linear(p + "attn_v.weight"), "bv": maybe(p + "attn_v.bias"),
            "wo": linear(p + "attn_output.weight"),
            "bo": maybe(p + "attn_output.bias"),
            "sinks": vec(p + "attn_sinks.weight"),  # [n_head]
            "post_norm": vec(p + "post_attention_norm.weight"),
            "router": linear(p + "ffn_gate_inp.weight"),
            "router_b": maybe(p + "ffn_gate_inp.bias"),
            "w_gate_exps": exps(p + "ffn_gate_exps.weight"),  # [E, D, F]
            "b_gate_exps": exp_bias(p + "ffn_gate_exps.bias"),  # [E, F]
            "w_up_exps": exps(p + "ffn_up_exps.weight"),
            "b_up_exps": exp_bias(p + "ffn_up_exps.bias"),
            "w_down_exps": exps(p + "ffn_down_exps.weight"),
            "b_down_exps": exp_bias(p + "ffn_down_exps.bias"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _swiglu_oai(gate: jax.Array, up: jax.Array) -> jax.Array:
    g = jnp.minimum(gate.astype(jnp.float32), SWIGLU_LIMIT)
    u = jnp.clip(up.astype(jnp.float32), -SWIGLU_LIMIT, SWIGLU_LIMIT)
    return (g * jax.nn.sigmoid(SWIGLU_ALPHA * g)) * (u + 1.0)


def _moe_oai(hs, layer, n_expert_used):
    """MoE with SOFTMAX_WEIGHT gating: top-k by raw router logits (+bias),
    weights = softmax over the selected logits. Expert compute rides the
    shared stack ops (ops/moe._stack_all / _rows_gather), so packed MXFP4
    stacks stream through the Pallas stack/gather kernels: the decode
    regime reads only the routed experts' packed bytes, prefill runs all
    experts (≡ the reference's mmid path on gpt-oss)."""
    from ..ops.moe import _GATHER_MAX_TOKENS, _n_expert, _rows_gather, \
        _stack_all

    logits = layer["router"](hs).astype(jnp.float32)
    if layer["router_b"] is not None:
        logits = logits + layer["router_b"]
    top_logits, idx = jax.lax.top_k(logits, n_expert_used)  # [N,k]
    weights = jax.nn.softmax(top_logits, axis=-1)
    E = _n_expert(layer["w_gate_exps"])
    N, k = idx.shape

    if N <= _GATHER_MAX_TOKENS:  # decode regime: gather routed experts
        ids = idx.reshape(N * k)
        xk = jnp.broadcast_to(
            hs[:, None, :], (N, k, hs.shape[-1])).reshape(N * k, -1)
        gate = _rows_gather(xk, ids, layer["w_gate_exps"]) \
            + layer["b_gate_exps"][ids].astype(hs.dtype)
        up = _rows_gather(xk, ids, layer["w_up_exps"]) \
            + layer["b_up_exps"][ids].astype(hs.dtype)
        act = _swiglu_oai(gate, up).astype(hs.dtype)
        out = _rows_gather(act, ids, layer["w_down_exps"]) \
            + layer["b_down_exps"][ids].astype(hs.dtype)
        return jnp.einsum("nke,nk->ne",
                          out.reshape(N, k, -1).astype(jnp.float32),
                          weights)

    gate = _stack_all(hs, layer["w_gate_exps"]) \
        + layer["b_gate_exps"][:, None, :].astype(hs.dtype)
    up = _stack_all(hs, layer["w_up_exps"]) \
        + layer["b_up_exps"][:, None, :].astype(hs.dtype)
    act = _swiglu_oai(gate, up).astype(hs.dtype)
    out = _stack_all(act, layer["w_down_exps"]) \
        + layer["b_down_exps"][:, None, :].astype(hs.dtype)  # [E, N, D]
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [N, k, E]
    mix = jnp.einsum("nkx,nk->nx", onehot, weights)
    return jnp.einsum("xne,nx->ne", out.astype(jnp.float32), mix)


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
    mask_full = causal_mask(positions, cache.max_len, kv_len, 0)
    mask_swa = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)

    for li, layer in enumerate(params["layers"]):
        mask = mask_swa if hp.is_swa(li) else mask_full
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
            q, cache, li, mask, scale, offsets=offsets,
            sliding_window=hp.sliding_window if hp.is_swa(li) else 0,
            sinks=layer["sinks"],
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        if layer["bo"] is not None:
            attn_out = attn_out + layer["bo"].astype(attn_out.dtype)
        x = x + attn_out

        h = rms_norm(x, layer["post_norm"], hp.rms_eps)
        hs = h.reshape(B * T, -1)
        ffn = _moe_oai(hs, layer, hp.n_expert_used)
        x = x + ffn.reshape(B, T, -1).astype(x.dtype)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
