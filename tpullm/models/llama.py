"""LLaMA-family decoder (llama/llama2/llama3/mistral/tinyllama + qwen2-style
bias/qk-norm variants).

Graph-equivalent of the reference's llm_build_llama (src/models/llama.cpp) —
re-expressed as a functional JAX program: RMSNorm → GQA attention with RoPE
and KV-cache append → SwiGLU FFN, residual chain, final norm + (possibly
tied) output head. Built once per (batch, seq) bucket and jit-compiled; no
per-step graph rebuild.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import alibi_distances, alibi_slopes, attention, attention_cached, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)

Params = dict[str, Any]


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    """Upload weights from GGUF into device arrays / packed quant planes.

    Tensor names follow the GGUF convention (reference src/llama-arch.cpp
    LLM_TENSOR_NAMES): token_embd, blk.N.{attn_norm,attn_q,attn_k,attn_v,
    attn_output,ffn_norm,ffn_gate,ffn_up,ffn_down}, output_norm, output.
    """
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
            # seed_oss names its FFN pre-norm post_attention_norm
            # (llm_build_seed_oss uses attn_post_norm in the ffn slot)
            "ffn_norm": load_vector(
                t[p + "ffn_norm.weight"] if p + "ffn_norm.weight" in t
                else t[p + "post_attention_norm.weight"]
            ),
            # gateless variants (arcee) have no ffn_gate tensor
            "w_gate": linear(p + "ffn_gate.weight") if p + "ffn_gate.weight" in t else None,
            "w_up": (linear(p + "ffn_up.weight")
                     if p + "ffn_up.weight" in t else None),
            "w_down": (linear(p + "ffn_down.weight")
                       if p + "ffn_down.weight" in t else None),
            # optional extras: qwen2 attn biases, qwen3/olmo2 qk-norm
            "bq": maybe_vector(p + "attn_q.bias"),
            "bk": maybe_vector(p + "attn_k.bias"),
            "bv": maybe_vector(p + "attn_v.bias"),
            "bo": maybe_vector(p + "attn_output.bias"),
            "q_norm": maybe_vector(p + "attn_q_norm.weight"),
            "k_norm": maybe_vector(p + "attn_k_norm.weight"),
        }
        if p + "ffn_gate_inp.weight" in t:
            # mixtral: LLM_ARCH_LLAMA with a renormalized-softmax MoE FFN
            # (llm_build_llama MoE branch, src/models/llama.cpp:125)
            import numpy as np

            def experts(name):
                return load_expert_stack(t[name], mode=mode, dtype=dtype)

            layer["router"] = linear(p + "ffn_gate_inp.weight")
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
        layers.append(layer)

    params: Params = {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
    }
    if "output.weight" in t:
        params["output"] = linear("output.weight")
    else:
        params["output"] = None  # tied to tok_embd
    return params


def attn_block(
    hp: HParams,
    layer: dict,
    x: jax.Array,  # [B, T, E]
    positions: jax.Array,
    cache: KVCache,
    li: int,
    cache_offset,
    mask: jax.Array,
    offsets: jax.Array,
    alibi: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[jax.Array, KVCache]:
    """One pre-norm GQA attention block with residual (shared by the llama
    family and its MoE variants)."""
    B, T = x.shape[:2]
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5
    h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
    fused = layer.get("wqkv")
    if fused is not None:  # one plane stream for q|k|v (FusedLinear)
        q, k, v = fused(h)
    else:
        q = layer["wq"](h)
        k = layer["wk"](h)
        v = layer["wv"](h)
    if layer["bq"] is not None:
        q = q + layer["bq"].astype(q.dtype)
    if layer["bk"] is not None:
        k = k + layer["bk"].astype(k.dtype)
    if layer["bv"] is not None:
        v = v + layer["bv"].astype(v.dtype)
    # full-projection qk norms apply BEFORE the head split (minimax-m2,
    # olmoe-style: weight spans n_head·head_dim, llm_build_minimax_m2)
    full_qk_norm = (
        layer["q_norm"] is not None
        and layer["q_norm"].shape[-1] == hp.n_head * hp.head_dim
        and hp.head_dim != hp.n_head * hp.head_dim
    )
    if full_qk_norm:
        q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        k = rms_norm(k, layer["k_norm"], hp.rms_eps)
    q = q.reshape(B, T, hp.n_head, hp.head_dim)
    k = k.reshape(B, T, hp.n_head_kv, hp.head_dim)
    v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
    use_rope = hp.max_alibi_bias <= 0.0 and (
        hp.no_rope_step == 0 or (li + 1) % hp.no_rope_step != 0
    )
    if not hp.qk_norm_post_rope and not full_qk_norm:
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
    if use_rope:
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
    if hp.qk_norm_post_rope:  # maincoder / hunyuan-dense ordering
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)

    cache = cache.update(
        li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
    )
    # attention_cached dispatches the q8-packed flash path when the cache
    # quantizes (≡ the fork's flash_attn_tile_q8 over a q8_0 cache)
    attn_out = attention_cached(
        q, cache, li, mask, scale,
        offsets=offsets, sliding_window=hp.sliding_window, alibi=alibi,
    )
    attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
    if layer.get("bo") is not None:
        attn_out = attn_out + layer["bo"].astype(attn_out.dtype)
    if hp.residual_scale != 1.0:  # granite
        attn_out = attn_out * jnp.asarray(hp.residual_scale, attn_out.dtype)
    x = x + attn_out
    return x, cache


def output_head(hp: HParams, params: Params, x: jax.Array) -> jax.Array:
    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    logits = logits.astype(jnp.float32)
    if hp.logit_scale != 1.0:  # granite: logits / f_logit_scale
        logits = logits / hp.logit_scale
    return logits


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32
    cache: KVCache,
    cache_offset,  # scalar int: write position in the cache
    return_hidden: bool = False,  # trace-time switch: final-norm hidden states
    last_index=None,  # int32 scalar: compute the head for this row only
    deepstack=None,  # [n_ds, B, T, E]: qwen3vl deepstack visual residuals
) -> tuple[jax.Array, KVCache]:
    """Returns (logits [B, T, n_vocab] f32, updated cache); with
    return_hidden, (hidden [B, T, E] f32, cache) instead (embeddings path,
    ≡ llama_get_embeddings). With last_index=i, logits are [B, 1, n_vocab]
    for position i only — the prefill fast path (≡ llama_batch.logits
    flagging just the final token: the reference skips the lm_head for all
    other rows, and at T=512 the head is ~6% of an 8B model's FLOPs plus a
    [T, n_vocab] f32 buffer).

    `tokens` may be float [B, T, E] — precomputed input embeddings (the
    multimodal path, ≡ llama_batch.embd / mtmd media chunks).

    `positions` may be [S, B, T] — per-section M-RoPE streams (t, h, w,
    extra) for qwen2vl/qwen3vl/glm4v multimodal prefill (≡ ggml mrope with
    the mtmd helper's 4-D positions). `deepstack` adds visual features to
    the hidden states after layers 0..n_ds−1 at image positions
    (≡ Qwen3VLTextModel._deepstack_process; zero rows elsewhere)."""
    if jnp.issubdtype(tokens.dtype, jnp.integer):
        B, T = tokens.shape
        x = params["tok_embd"][tokens]  # [B, T, E]
        if hp.embd_scale != 1.0:  # granite embedding multiplier
            x = x * jnp.asarray(hp.embd_scale, x.dtype)
    else:
        B, T = tokens.shape[:2]
        x = tokens.astype(params["tok_embd"].dtype)

    offsets = jnp.broadcast_to(jnp.asarray(cache_offset).reshape(-1), (B,)).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    # causality is a property of cache SLOTS, not of rope positions — with
    # self-extend (grp-attn) the rope positions are compressed (pos = i//G)
    # while slot ordering stays dense (≡ llama_memory_seq_div semantics)
    slot_pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    mask = causal_mask(slot_pos, cache.max_len, kv_len, hp.sliding_window)
    if not hp.causal:  # llama-embed: bidirectional over the valid prefix
        key_pos = jnp.arange(cache.max_len)[None, None, :]
        mask = key_pos < jnp.asarray(kv_len).reshape(-1, 1, 1)
    alibi = None
    if hp.max_alibi_bias > 0.0:  # refact / baichuan-13B ride the llama graph
        alibi = (
            alibi_slopes(hp.n_head, hp.max_alibi_bias),
            alibi_distances(positions if positions.ndim == 2 else positions[0],
                            cache.max_len),
        )

    cvec = params.get("cvec")  # [n_layer, E] steering vectors (llama-adapter)
    for li, layer in enumerate(params["layers"]):
        x, cache = attn_block(
            hp, layer, x, positions, cache, li, cache_offset, mask, offsets,
            alibi=alibi,
        )
        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:  # mixtral MoE branch
            from ..ops.moe import moe_ffn, route

            hs = h.reshape(B * T, -1)
            router_logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(router_logits, hp.n_expert_used,
                                 gating="softmax", norm_weights=True)
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            ffn = ffn.reshape(B, T, -1)
            if hp.residual_scale != 1.0:
                ffn = ffn * jnp.asarray(hp.residual_scale, ffn.dtype)
            x = x + ffn
            if cvec is not None:
                x = x + cvec[li].astype(x.dtype)
            if deepstack is not None and li < deepstack.shape[0]:
                x = x + deepstack[li].astype(x.dtype)
            continue
        fgu = layer.get("wgu")
        if fgu is not None:  # one plane stream for gate|up
            gate, up = fgu(h)
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        elif layer["w_gate"] is not None:
            up = layer["w_up"](h)
            gate = layer["w_gate"](h)
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        elif hp.xielu is not None:
            # apertus xIELU (ggml_xielu, softplus folding done in hparams):
            # x>0 → αp·x² + β·x; x≤0 → (expm1(min(x,eps)) − x)·αn + β·x
            an, ap, bb, ee = hp.xielu[li]
            up = layer["w_up"](h)
            uf = up.astype(jnp.float32)
            act = jnp.where(
                uf > 0.0,
                ap * uf * uf + bb * uf,
                (jnp.expm1(jnp.minimum(uf, ee)) - uf) * an + bb * uf,
            ).astype(up.dtype)
        else:  # gateless ReLU² FFN (arcee, llm_build_arcee LLM_FFN_RELU_SQR)
            up = layer["w_up"](h)
            act = jnp.square(jax.nn.relu(up.astype(jnp.float32))).astype(up.dtype)
        ffn = layer["w_down"](act)
        if hp.residual_scale != 1.0:  # granite
            ffn = ffn * jnp.asarray(hp.residual_scale, ffn.dtype)
        x = x + ffn
        if cvec is not None:
            x = x + cvec[li].astype(x.dtype)
        if deepstack is not None and li < deepstack.shape[0]:
            x = x + deepstack[li].astype(x.dtype)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    if last_index is not None:
        li = jnp.asarray(last_index, jnp.int32)
        if li.ndim == 0:
            x = jax.lax.dynamic_slice_in_dim(x, li, 1, axis=1)
        else:  # per-row flagged positions (multi-slot batched prefill)
            x = jax.vmap(
                lambda xr, i: jax.lax.dynamic_slice_in_dim(xr, i, 1, axis=0)
            )(x, li)
    return output_head(hp, params, x), cache
