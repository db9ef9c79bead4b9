"""Qwen3-Next decoder — gated DeltaNet linear attention + full-attention
hybrid.

Reference graph: llm_build_qwen3next (src/models/qwen3next.cpp). Layer
pattern (gguf head_count_kv array): linear-attention layers carry a gated
delta-rule recurrence
  S ← S·exp(g) + k ⊗ (β·(v − S·k)),   out = S·q
with g = −exp(A_log)·softplus(α + dt_bias), β = sigmoid(β_raw), q/k
L2-normalized post causal-conv; every 4th layer is standard GQA attention
whose query projection carries a fused per-head output gate. FFN slot is
renormalized-softmax MoE + sigmoid-gated shared expert (or dense), pre-
normed by post_attention_norm. Tensors follow the converter layout
(attn_qkv = flat [Q|K|V], attn_gate = z, ssm_a already −exp(A_log),
zero-centered norms stored +1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
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


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name, d=jnp.float32):
        return load_vector(t[name], dtype=d)

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {"attn_norm": vec(p + "attn_norm.weight"),
                 "post_norm": vec(p + "post_attention_norm.weight")}
        if p + "ssm_in.weight" in t or p + "attn_qkv.weight" in t:  # linear
            layer.update({
                "wqkv": linear(p + "attn_qkv.weight"),
                "wz": linear(p + "attn_gate.weight"),
                "ba": linear(p + "ssm_ba.weight"),
                "conv_w": jnp.asarray(
                    t[p + "ssm_conv1d.weight"].to_numpy(), jnp.float32
                ).reshape(conv_w, hp.ssm_d_conv),
                "dt_bias": vec(p + "ssm_dt.bias"),  # [Hv]
                "A": vec(p + "ssm_a"),  # already -exp(A_log)
                "ssm_norm": vec(p + "ssm_norm.weight"),  # [head_v]
                "ssm_out": linear(p + "ssm_out.weight"),
            })
        else:  # full attention with fused query gate
            layer.update({
                "wq": linear(p + "attn_q.weight"),  # per head [q|gate]
                "wk": linear(p + "attn_k.weight"),
                "wv": linear(p + "attn_v.weight"),
                "wo": linear(p + "attn_output.weight"),
                "q_norm": vec(p + "attn_q_norm.weight"),
                "k_norm": vec(p + "attn_k_norm.weight"),
            })
        if p + "ffn_gate_inp.weight" in t:
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
            if p + "ffn_gate_shexp.weight" in t:
                layer["shexp_gate_inp"] = vec(
                    p + "ffn_gate_inp_shexp.weight").reshape(-1)
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
        "output_norm": vec("output_norm.weight"),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _l2norm(x, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt((xf * xf).sum(-1, keepdims=True) + eps)


def _delta_scan(q, k, v, g, beta, s0):
    """Gated delta rule. q,k [B,T,H,Dk] (L2-normed); v [B,T,H,Dv];
    g,beta [B,T,H]; s0 [B,H,Dv,Dk]. Returns (out [B,T,H,Dv], sT)."""

    def step(s, inp):
        q_t, k_t, v_t, g_t, b_t = inp
        s = s * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bhvk,bhk->bhv", s, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        s = s + delta[..., :, None] * k_t[..., None, :]
        out = jnp.einsum("bhvk,bhk->bhv", s, q_t)
        return s, out

    xs = tuple(jnp.moveaxis(z, 1, 0) for z in (q, k, v, g, beta))
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
    Dk = hp.ssm_d_state  # linear-attn key head dim
    Hk = hp.ssm_n_group  # linear key heads
    Hv = hp.ssm_dt_rank  # linear value heads
    Dv = hp.ssm_d_inner // Hv  # linear value head dim
    rep = Hv // Hk
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5
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
        if "wqkv" in layer:  # gated DeltaNet linear attention
            qkv = layer["wqkv"](h).astype(jnp.float32)  # [B,T,2*Hk*Dk+Hv*Dv]
            z = layer["wz"](h).astype(jnp.float32)  # [B,T,Hv*Dv]
            ba = layer["ba"](h).astype(jnp.float32).reshape(B, T, Hk, 2 * rep)
            beta = jax.nn.sigmoid(ba[..., :rep].reshape(B, T, Hv))
            alpha = ba[..., rep:].reshape(B, T, Hv)
            g = layer["A"] * jax.nn.softplus(alpha + layer["dt_bias"])

            conv_out, conv_state = _causal_conv(
                qkv, conv_cache[li], layer["conv_w"],
                jnp.zeros((qkv.shape[-1],), jnp.float32),
            )
            conv_cache = conv_cache.at[li].set(conv_state)
            mix = jax.nn.silu(conv_out)
            nqk = Hk * Dk
            q = mix[..., :nqk].reshape(B, T, Hk, Dk)
            k = mix[..., nqk:2 * nqk].reshape(B, T, Hk, Dk)
            v = mix[..., 2 * nqk:].reshape(B, T, Hv, Dv)
            q = jnp.repeat(q, rep, axis=2)  # [B,T,Hv,Dk]
            k = jnp.repeat(k, rep, axis=2)
            q = _l2norm(q, hp.rms_eps) * (Dv ** -0.5)
            k = _l2norm(k, hp.rms_eps)
            s0 = ssm_cache[li].reshape(B, Hv, Dv, Dk)
            out, sT = _delta_scan(q, k, v, g, beta, s0)
            ssm_cache = ssm_cache.at[li].set(
                sT.reshape(B, hp.ssm_d_inner, Dk))
            # gated RMS norm per value head, silu(z) gate
            o = out.reshape(B, T, Hv, Dv)
            o = rms_norm(o, layer["ssm_norm"], hp.rms_eps)
            o = o * jax.nn.silu(z.reshape(B, T, Hv, Dv))
            cur = layer["ssm_out"](o.reshape(B, T, Hv * Dv).astype(x.dtype))
        else:  # full attention with fused per-head output gate
            n_kv = hp.n_head_kv_l(li)
            qg = layer["wq"](h).reshape(B, T, hp.n_head, 2 * hp.head_dim)
            q = qg[..., :hp.head_dim]
            gate = qg[..., hp.head_dim:]
            k = layer["wk"](h).reshape(B, T, n_kv, hp.head_dim)
            v = layer["wv"](h).reshape(B, T, n_kv, hp.head_dim_v)
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if n_kv < hp.n_head_kv:
                pad = ((0, 0), (0, hp.n_head_kv - n_kv), (0, 0), (0, 0))
                kt = jnp.pad(kt, pad)
                vt = jnp.pad(vt, pad)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kt[None].astype(k_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vt[None].astype(v_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0))
            attn_out = attention(
                q, k_cache[li, :, :n_kv], v_cache[li, :, :n_kv], mask, scale,
                offsets=offsets,
            )
            attn_out = attn_out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(attn_out.dtype)
            cur = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        x = x + cur

        h = rms_norm(x, layer["post_norm"], hp.rms_eps)
        if "router" in layer:
            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(logits, hp.n_expert_used, gating="softmax",
                                 norm_weights=True)
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            if "w_gate_shexp" in layer:
                gate = layer["w_gate_shexp"](hs)
                up = layer["w_up_shexp"](hs)
                sh = layer["w_down_shexp"](
                    jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
                )
                gsc = jax.nn.sigmoid(
                    hs.astype(jnp.float32) @ layer["shexp_gate_inp"].astype(jnp.float32)
                )[:, None]
                ffn = ffn + (sh.astype(jnp.float32) * gsc).astype(ffn.dtype)
            x = x + ffn.reshape(B, T, -1)
        else:
            gate = layer["w_gate"](h)
            up = layer["w_up"](h)
            x = x + layer["w_down"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )

    new_cache = HybridCache(k_cache, v_cache, conv_cache, ssm_cache)
    if return_hidden:
        return (rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32),
                new_cache)
    return output_head(hp, params, x), new_cache
