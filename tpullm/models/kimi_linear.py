"""Kimi-Linear decoder (KDA — Kimi Delta Attention + rope-free MLA hybrid).

Reference graph: llm_build_kimi_linear (src/models/kimi-linear.cpp).
KDA layers (recurrent): q/k/v projections each pass a per-channel causal
conv + silu; per-CHANNEL decay gk = ssm_a ⊙ softplus(f_b(f_a(x)) + dt_bias)
(per k-dim, unlike qwen3next's per-head scalar); delta rule
  S[v,k] ← S[v,k]·exp(gk[k]) + (sigmoid(β)·k[k])·(v − S·k)[v],
  out[v] = Σ_k S[v,k]·q[k]
with l2-normed q/k and q scaled 1/sqrt(head_dim); output passes a per-head
RMS norm gated by sigmoid(g_b(g_a(x))) before wo.
MLA layers: deepseek2-style latent attention WITHOUT rope — the "pe" slice
is used raw (rotary_emb=None upstream); k/v decompress from wk_b/wv_b (or
fused wkv_b). FFN: dense lead then renormalized MoE (selection bias, route
scale, gguf gating func) + gated shared expert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from .hparams import HParams
from .jamba import HybridCache
from .llama import Params, output_head
from .mamba import _causal_conv
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)


def make_cache(hp: HParams, batch: int, max_len: int = 2048,
               dtype=jnp.bfloat16) -> HybridCache:
    if isinstance(dtype, str):
        dtype = jnp.bfloat16
    hd = hp.head_dim_kda
    d_inner = hp.n_head * hd
    return HybridCache(
        jnp.zeros((hp.n_layer, batch, hp.n_head_kv, max_len,
                   hp.head_dim_k_mla), dtype),
        jnp.zeros((hp.n_layer, batch, hp.n_head_kv, max_len,
                   hp.head_dim_v_mla), dtype),
        # q/k/v carry separate conv tails, stacked channel-wise
        jnp.zeros((hp.n_layer, batch, 3 * d_inner, hp.ssm_d_conv - 1),
                  jnp.float32),
        jnp.zeros((hp.n_layer, batch, d_inner, hd), jnp.float32),
    )


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name, d=jnp.float32):
        return load_vector(t[name], dtype=d)

    def conv_w(name, width):
        return jnp.asarray(t[name].to_numpy(), jnp.float32).reshape(
            width, hp.ssm_d_conv)

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    d_inner = hp.n_head * hp.head_dim_kda
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {"attn_norm": vec(p + "attn_norm.weight"),
                 "ffn_norm": vec(p + "ffn_norm.weight")}
        if p + "ssm_a" in t:  # KDA layer
            layer.update({
                "wq": linear(p + "attn_q.weight"),
                "wk": linear(p + "attn_k.weight"),
                "wv": linear(p + "attn_v.weight"),
                "conv_q": conv_w(p + "ssm_conv1d_q.weight", d_inner),
                "conv_k": conv_w(p + "ssm_conv1d_k.weight", d_inner),
                "conv_v": conv_w(p + "ssm_conv1d_v.weight", d_inner),
                "f_a": linear(p + "ssm_f_a.weight"),
                "f_b": linear(p + "ssm_f_b.weight"),
                "beta": linear(p + "ssm_beta.weight"),
                "A": vec(p + "ssm_a").reshape(-1),  # already -exp(A_log), [H]
                "dt_bias": vec(p + "ssm_dt.bias"),  # [H*hd]
                "g_a": linear(p + "ssm_g_a.weight"),
                "g_b": linear(p + "ssm_g_b.weight"),
                "o_norm": vec(p + "ssm_norm.weight"),  # [hd]
                "wo": linear(p + "attn_output.weight"),
            })
        else:  # MLA layer (rope-free)
            layer.update({
                "wq": (linear(p + "attn_q.weight")
                       if p + "attn_q.weight" in t else None),
                "wq_a": (linear(p + "attn_q_a.weight")
                         if p + "attn_q_a.weight" in t else None),
                "wq_b": (linear(p + "attn_q_b.weight")
                         if p + "attn_q_b.weight" in t else None),
                "q_a_norm": (vec(p + "attn_q_a_norm.weight")
                             if p + "attn_q_a_norm.weight" in t else None),
                "wkv_a": linear(p + "attn_kv_a_mqa.weight"),
                "kv_a_norm": vec(p + "attn_kv_a_norm.weight"),
                "wo": linear(p + "attn_output.weight"),
            })
            if p + "attn_kv_b.weight" in t:
                layer["wkv_b"] = linear(p + "attn_kv_b.weight")
            else:
                # split decompression tensors: wk_b (nope, kv_lora, H) and
                # wv_b (kv_lora, v_mla, H) in ggml ne order
                layer["wk_b"] = jnp.asarray(
                    t[p + "attn_k_b.weight"].to_numpy(), dtype)  # (H, kv_lora, nope)
                layer["wv_b"] = jnp.asarray(
                    t[p + "attn_v_b.weight"].to_numpy(), dtype)  # (H, v_mla, kv_lora)
        if p + "ffn_gate_inp.weight" in t:
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in t:
                layer["exp_probs_b"] = vec(p + "exp_probs_b.bias")
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
            if p + "ffn_gate_shexp.weight" in t:
                layer["w_gate_shexp"] = linear(p + "ffn_gate_shexp.weight")
                layer["w_up_shexp"] = linear(p + "ffn_up_shexp.weight")
                layer["w_down_shexp"] = linear(p + "ffn_down_shexp.weight")
        else:
            layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["w_down"] = linear(p + "ffn_down.weight")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _l2norm(x, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt((xf * xf).sum(-1, keepdims=True) + eps)


def _kda_scan(q, k, v, gk, beta, s0):
    """KDA delta rule with per-channel decay. q,k,v,gk [B,T,H,D] (q/k
    L2-normed, q scaled); beta [B,T,H]; s0 [B,H,Dv,Dk]."""

    def step(s, inp):
        q_t, k_t, v_t, g_t, b_t = inp
        s = s * jnp.exp(g_t)[:, :, None, :]  # decay per k-dim
        kv_mem = jnp.einsum("bhvk,bhk->bhv", s, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        s = s + delta[..., :, None] * k_t[..., None, :]
        out = jnp.einsum("bhvk,bhk->bhv", s, q_t)
        return s, out

    xs = tuple(jnp.moveaxis(z, 1, 0) for z in (q, k, v, gk, beta))
    sT, outs = jax.lax.scan(step, s0, xs)
    return jnp.moveaxis(outs, 0, 1), sT


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: HybridCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, HybridCache]:
    B, T = tokens.shape
    H = hp.n_head
    hd = hp.head_dim_kda
    D = H * hd
    rope_d = hp.rope.dims  # qk_rope_head_dim (used raw: no rotation)
    dk_mla = hp.head_dim_k_mla
    dv_mla = hp.head_dim_v_mla
    nope = dk_mla - rope_d
    kvr = hp.n_lora_kv
    scale_mla = dk_mla ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    k_cache, v_cache = cache.k, cache.v
    conv_cache, ssm_cache = cache.conv, cache.ssm
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if "conv_q" in layer:  # KDA
            outs = []
            for slot, (wname, cname) in enumerate(
                [("wq", "conv_q"), ("wk", "conv_k"), ("wv", "conv_v")]
            ):
                proj = layer[wname](h).astype(jnp.float32)
                state0 = conv_cache[li, :, slot * D:(slot + 1) * D]
                conv_out, conv_state = _causal_conv(
                    proj, state0, layer[cname], jnp.zeros((D,), jnp.float32))
                conv_cache = conv_cache.at[li, :, slot * D:(slot + 1) * D].set(
                    conv_state)
                outs.append(jax.nn.silu(conv_out).reshape(B, T, H, hd))
            q, k, v = outs
            gk = jax.nn.softplus(
                layer["f_b"](layer["f_a"](h).astype(x.dtype)).astype(jnp.float32)
                + layer["dt_bias"]
            ).reshape(B, T, H, hd) * layer["A"][None, None, :, None]
            beta = jax.nn.sigmoid(
                layer["beta"](h).astype(jnp.float32))  # [B,T,H]
            q = _l2norm(q, hp.rms_eps) * (hd ** -0.5)
            k = _l2norm(k, hp.rms_eps)
            s0 = ssm_cache[li].reshape(B, H, hd, hd)
            out, sT = _kda_scan(q, k, v, gk, beta, s0)
            ssm_cache = ssm_cache.at[li].set(sT.reshape(B, D, hd))
            # gated per-head RMS norm: rms(out)·w ⊙ sigmoid(g2)
            g2 = layer["g_b"](layer["g_a"](h).astype(x.dtype)).astype(jnp.float32)
            o = rms_norm(out, layer["o_norm"], hp.rms_eps)
            o = o * jax.nn.sigmoid(g2.reshape(B, T, H, hd))
            cur = layer["wo"](o.reshape(B, T, D).astype(x.dtype))
        else:  # MLA, rope-free
            if layer["wq"] is not None:
                qfull = layer["wq"](h)
            else:
                qa = layer["wq_a"](h)
                if layer["q_a_norm"] is not None:
                    qa = rms_norm(qa, layer["q_a_norm"], hp.rms_eps)
                qfull = layer["wq_b"](qa)
            q = qfull.reshape(B, T, H, dk_mla)  # [q_nope | q_pe], no rope
            kv_pe = layer["wkv_a"](h)
            kv_c = rms_norm(kv_pe[..., :kvr], layer["kv_a_norm"], hp.rms_eps)
            k_pe = kv_pe[..., kvr:]  # [B,T,rope_d] — used RAW
            if "wkv_b" in layer:
                kv = layer["wkv_b"](kv_c.astype(x.dtype)).reshape(
                    B, T, H, nope + dv_mla)
                k_nope = kv[..., :nope]
                v = kv[..., nope:]
            else:
                kv_cf = kv_c.astype(layer["wk_b"].dtype)
                k_nope = jnp.einsum("btl,hln->bthn", kv_cf, layer["wk_b"])
                v = jnp.einsum("btl,hvl->bthv", kv_cf, layer["wv_b"])
            k = jnp.concatenate(
                [k_nope,
                 jnp.broadcast_to(k_pe[:, :, None, :].astype(k_nope.dtype),
                                  (B, T, H, rope_d))], axis=-1)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.transpose(0, 2, 1, 3)[None].astype(k_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.transpose(0, 2, 1, 3)[None].astype(v_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0))
            attn_out = attention(q, k_cache[li], v_cache[li], mask, scale_mla,
                                 offsets=offsets)
            cur = layer["wo"](attn_out.reshape(B, T, H * dv_mla))
        x = x + cur

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:
            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(
                logits, hp.n_expert_used, gating=hp.expert_gating_func,
                norm_weights=True, scale=hp.expert_weights_scale,
                select_bias=layer.get("exp_probs_b"),
            )
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            if "w_gate_shexp" in layer:
                g = layer["w_gate_shexp"](hs)
                u = layer["w_up_shexp"](hs)
                sh = layer["w_down_shexp"](
                    jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u)
                ffn = ffn + sh.astype(ffn.dtype)
            x = x + ffn.reshape(B, T, -1)
        else:
            g = layer["w_gate"](h)
            u = layer["w_up"](h)
            x = x + layer["w_down"](
                jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u)

    new_cache = HybridCache(k_cache, v_cache, conv_cache, ssm_cache)
    if return_hidden:
        return (rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32),
                new_cache)
    return output_head(hp, params, x), new_cache
