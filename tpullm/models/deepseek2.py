"""DeepSeek-V2/V3 decoder (MLA + MoE).

Reference graph: llm_build_deepseek2 (src/models/deepseek2.cpp). Two MLA
attention forms, matching the reference's is_mla branches:

* **Absorbed (default)** — the is_mla=true branch: the cache stores the
  compressed latent [kv_cmpr | k_pe] (kv_lora_rank + n_rot wide, MQA) and
  wkv_b's two halves are absorbed into the query/output sides
  (q_nope·wk_b scores against the latent directly; values ARE the latent,
  projected by wv_b after attention). Matches the reference's MLA cache
  (llama-kv-cache.cpp:138) and the DKQ=576/DV=512 attention shape
  (ggml-cuda/fattn.cu dkq576 instances). ~71× less KV HBM for DeepSeek-V2.
  Opt out with TPULLM_MLA=0.
* **Decompressed** — the is_mla=false branch: the latent is decompressed
  per token through wkv_b and attention runs as plain MHA over
  [k_nope | k_rope]; kept as the reference oracle and the TPULLM_MLA=0
  fallback. The forward picks the branch from the cache type (MLACache ⇒
  absorbed), so both compile from the same code.

Covers: optional q LoRA compression (wq_a/wq_b + q_a_norm), kv compression
(wkv_a_mqa + kv_a_norm), decoupled rope head (q_pe/k_pe, rope applies to the
trailing n_rot dims only), leading dense layers then MoE with sigmoid-bias
expert selection (exp_probs_b) and always-on shared experts.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .qwen_moe import _experts
from .weights import load_embedding, load_linear, load_vector


def mla_absorbed(hp: HParams) -> bool:
    """Whether this model runs the absorbed-latent MLA path (default on for
    every MLA model; TPULLM_MLA=0 selects the decompressed oracle)."""
    return hp.n_lora_kv > 0 and os.environ.get("TPULLM_MLA", "1") != "0"


def _mla_dims(hp: HParams) -> tuple[int, int, int, int]:
    """(Dk, Dv, n_rot, n_nope) — per-head MLA dims (converted GGUFs carry
    the true per-head dims in *_mla; synthetic fixtures in the plain keys)."""
    Dk = hp.head_dim_k_mla or hp.head_dim
    Dv = hp.head_dim_v_mla or hp.head_dim_v
    n_rot = hp.rope.dims
    return Dk, Dv, n_rot, Dk - n_rot


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_linear(name):
        return linear(name) if name in t else None

    def vec(name):
        return load_vector(t[name])

    def maybe_vec(name):
        return vec(name) if name in t else None

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            # q: either direct (lite) or LoRA-compressed
            "wq": maybe_linear(p + "attn_q.weight"),
            "wq_a": maybe_linear(p + "attn_q_a.weight"),
            "q_a_norm": maybe_vec(p + "attn_q_a_norm.weight"),
            "wq_b": maybe_linear(p + "attn_q_b.weight"),
            # kv compression
            "wkv_a": linear(p + "attn_kv_a_mqa.weight"),
            "kv_a_norm": vec(p + "attn_kv_a_norm.weight"),
            "wkv_b": linear(p + "attn_kv_b.weight"),
            "wo": linear(p + "attn_output.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
        }
        if mla_absorbed(hp):
            # absorb wkv_b's two halves (per-head [k_nope; v] row blocks,
            # ≡ the reference's wk_b/wv_b views of attn_kv_b): wk_b folds
            # into the query side, wv_b projects the latent attention
            # output. Small (H·Dk·kvr ≈ 17 MB bf16 for V2), kept dense.
            import numpy as np

            _, Dv, _, n_nope = _mla_dims(hp)
            kvb = t[p + "attn_kv_b.weight"].to_numpy()  # (H·(n_nope+Dv), kvr)
            kvb = kvb.reshape(hp.n_head, n_nope + Dv, hp.n_lora_kv)
            layer["wk_b"] = jnp.asarray(
                np.ascontiguousarray(kvb[:, :n_nope, :]), dtype)
            layer["wv_b"] = jnp.asarray(
                np.ascontiguousarray(kvb[:, n_nope:, :]), dtype)
            layer["wkv_b"] = None  # decompression matrix unused when absorbed
        if p + "ffn_gate_inp.weight" not in t:
            # dense lead layer; plm is all-dense with a gateless ReLU²
            # sequential FFN (llm_build_plm LLM_FFN_RELU_SQR)
            layer["w_gate"] = maybe_linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["w_down"] = linear(p + "ffn_down.weight")
        else:  # MoE layer
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            layer["exp_probs_b"] = maybe_vec(p + "exp_probs_b.bias")
            layer["w_gate_exps"] = _experts(t[p + "ffn_gate_exps.weight"], dtype, mode)
            layer["w_up_exps"] = _experts(t[p + "ffn_up_exps.weight"], dtype, mode)
            layer["w_down_exps"] = _experts(t[p + "ffn_down_exps.weight"], dtype, mode)
            layer["w_gate_shexp"] = linear(p + "ffn_gate_shexp.weight")
            layer["w_up_shexp"] = linear(p + "ffn_up_shexp.weight")
            layer["w_down_shexp"] = linear(p + "ffn_down_shexp.weight")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
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
    H = hp.n_head
    Dk, Dv, n_rot, n_nope = _mla_dims(hp)
    kvr = hp.n_lora_kv
    # the cache type selects the attention form: MLACache ⇒ absorbed MQA
    # over the latent (reference is_mla=true), plain KVCache ⇒ decompressed
    # MHA (is_mla=false oracle)
    from ..runtime.kvcache import MLACache

    absorbed = isinstance(cache, MLACache)
    x = params["tok_embd"][tokens]
    if hp.embd_scale != 1.0:  # minicpm3 scale_embd
        x = x * jnp.asarray(hp.embd_scale, x.dtype)
    scale = hp.attn_scale if hp.attn_scale is not None else Dk ** -0.5
    res_scale = hp.residual_scale  # minicpm3 scale_depth/sqrt(n_layer)

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)

        if layer["wq"] is not None:  # lite
            q = layer["wq"](h)
        else:
            q = layer["wq_b"](
                rms_norm(layer["wq_a"](h), layer["q_a_norm"], hp.rms_eps)
            )
        q = q.reshape(B, T, H, Dk)
        q_nope, q_pe = q[..., :n_nope], q[..., n_nope:]
        q_pe = apply_rope(q_pe, positions, hp.rope)

        kv_pe = layer["wkv_a"](h)  # [B, T, kvr + n_rot]
        kv_cmpr = rms_norm(kv_pe[..., :kvr], layer["kv_a_norm"], hp.rms_eps)
        k_pe = kv_pe[..., kvr:].reshape(B, T, 1, n_rot)
        k_pe = apply_rope(k_pe, positions, hp.rope)

        if absorbed:
            # q_nope·wk_b scores straight against the cached latent; the
            # per-token wkv_b decompression disappears from the hot loop
            q_abs = jnp.einsum(
                "bthd,hdc->bthc", q_nope, layer["wk_b"].astype(q_nope.dtype))
            qf = jnp.concatenate([q_abs, q_pe], axis=-1)  # [B,T,H,kvr+n_rot]
            latent = jnp.concatenate(
                [kv_cmpr.reshape(B, T, 1, kvr), k_pe], axis=-1)
            cache = cache.update(
                li, latent.transpose(0, 2, 1, 3), None, cache_offset)
            o = attention_cached(
                qf, cache, li, mask, scale, offsets=offsets)  # [B,T,H,kvr]
            attn_out = jnp.einsum(
                "bthc,hec->bthe", o, layer["wv_b"].astype(o.dtype))
            attn_out = layer["wo"](attn_out.reshape(B, T, H * Dv))
        else:
            kv = layer["wkv_b"](kv_cmpr).reshape(B, T, H, n_nope + Dv)
            k_nope = kv[..., :n_nope]
            v = kv[..., n_nope:]

            qf = jnp.concatenate([q_nope, q_pe], axis=-1)  # [B,T,H,Dk]
            kf = jnp.concatenate(
                [k_nope, jnp.broadcast_to(k_pe, (B, T, H, n_rot))], axis=-1
            )

            cache = cache.update(
                li, kf.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                cache_offset
            )
            attn_out = attention_cached(
                qf, cache, li, mask, scale, offsets=offsets)
            attn_out = layer["wo"](attn_out.reshape(B, T, H * Dv))
        if res_scale != 1.0:
            attn_out = attn_out * jnp.asarray(res_scale, attn_out.dtype)
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "w_gate" in layer:  # dense lead
            up = layer["w_up"](h)
            if layer["w_gate"] is not None:
                gate = layer["w_gate"](h)
                act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            else:  # plm: gateless ReLU² (LLM_FFN_RELU_SQR)
                act = jnp.square(
                    jax.nn.relu(up.astype(jnp.float32))
                ).astype(up.dtype)
            ffn = layer["w_down"](act)
            if res_scale != 1.0:
                ffn = ffn * jnp.asarray(res_scale, ffn.dtype)
            x = x + ffn
        else:
            hs = h.reshape(B * T, -1)
            router_logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(
                router_logits, hp.n_expert_used,
                gating=hp.expert_gating_func,
                norm_weights=hp.expert_weights_norm,
                scale=hp.expert_weights_scale,
                select_bias=layer["exp_probs_b"],
            )
            ffn = moe_ffn(
                hs, weights, idx,
                layer["w_gate_exps"], layer["w_up_exps"], layer["w_down_exps"],
            )
            gate = layer["w_gate_shexp"](hs)
            up = layer["w_up_shexp"](hs)
            sh = layer["w_down_shexp"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )
            out = (ffn + sh.astype(ffn.dtype)).reshape(B, T, -1)
            if res_scale != 1.0:
                out = out * jnp.asarray(res_scale, out.dtype)
            x = x + out

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
