"""Hybrid attention+SSM decoders: Jamba, Nemotron-H, Granite-Hybrid.

Reference graphs: llm_build_jamba (src/models/jamba.cpp),
llm_build_nemotron_h (nemotron-h.cpp), llm_build_granite_hybrid
(granite-hybrid.cpp) over llama-memory-hybrid (KV cache for attention
layers + recurrent state for Mamba layers).

Per-layer dispatch is tensor-presence driven: ssm_in marks a Mamba layer
(Mamba-1 selective scan for jamba incl. its dt/B/C RMS norms; Mamba-2 SSD
when ssm.group_count > 0), attn_q marks attention (GQA, rope-free except
granite-hybrid's rope_finetuned), neither marks nemotron-h's FFN-only
sandwich layers. The FFN slot per layer is swiglu / ReLU² sequential
(nemotron-h) / softmax MoE (+ungated shared expert); granite-hybrid applies
the granite residual/embedding/logit multipliers.

The HybridCache carries both stores full-depth (unused slices stay zero) —
the TPU analog of llama_memory_hybrid's split layer lists.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models.hparams import HParams
from ..ops.attention import attention, causal_mask
from ..ops.moe import moe_ffn, route
from ..ops.norms import rms_norm
from .llama import Params
from .mamba import _causal_conv, _selective_scan, _ssd_scan
from .weights import (
    load_embedding,
    load_expert_stack,
    load_linear,
    load_vector,
)


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridCache:
    """Attention KV ring + Mamba conv/ssm state, both full-depth."""

    k: jax.Array  # [L, B, Hkv, S, D]
    v: jax.Array
    conv: jax.Array  # [L, B, d_inner, K-1]
    ssm: jax.Array  # [L, B, d_inner, d_state]

    def tree_flatten(self):
        return (self.k, self.v, self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int = 2048, dtype=jnp.bfloat16):
        if isinstance(dtype, str):
            dtype = jnp.bfloat16
        # mamba2 hybrids convolve the concatenated xBC stream
        conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state \
            if hp.ssm_n_group else hp.ssm_d_inner
        return cls(
            jnp.zeros((hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim), dtype),
            jnp.zeros((hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim_v), dtype),
            jnp.zeros((hp.n_layer, batch, conv_w, hp.ssm_d_conv - 1), jnp.float32),
            jnp.zeros((hp.n_layer, batch, hp.ssm_d_inner, hp.ssm_d_state), jnp.float32),
        )


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name, d=jnp.float32):
        return load_vector(t[name], dtype=d)

    def maybe(name):
        return vec(name) if name in t else None

    def experts(name):
        return load_expert_stack(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {"attn_norm": vec(p + "attn_norm.weight"),
                 "ffn_norm": maybe(p + "ffn_norm.weight")}
        if p + "ssm_in.weight" in t and hp.ssm_n_group:  # mamba2 (SSD)
            conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
            layer.update({
                "ssm_in": linear(p + "ssm_in.weight"),
                "conv_w": jnp.asarray(
                    t[p + "ssm_conv1d.weight"].to_numpy(), jnp.float32
                ).reshape(conv_w, hp.ssm_d_conv),
                "conv_b": vec(p + "ssm_conv1d.bias"),
                "dt_bias": vec(p + "ssm_dt.bias"),
                "A_log": vec(p + "ssm_a" if p + "ssm_a" in t
                             else p + "ssm_a.weight"),
                "D": vec(p + "ssm_d" if p + "ssm_d" in t
                         else p + "ssm_d.weight"),
                "ssm_norm": maybe(p + "ssm_norm.weight"),
                "ssm_out": linear(p + "ssm_out.weight"),
            })
        elif p + "ssm_in.weight" in t:  # mamba1 layer (jamba)
            layer.update({
                "ssm_in": linear(p + "ssm_in.weight"),
                "conv_w": jnp.asarray(
                    t[p + "ssm_conv1d.weight"].to_numpy(), jnp.float32
                ).reshape(hp.ssm_d_inner, hp.ssm_d_conv),
                "conv_b": vec(p + "ssm_conv1d.bias"),
                "ssm_x": linear(p + "ssm_x.weight"),
                "ssm_dt": linear(p + "ssm_dt.weight"),
                "dt_bias": vec(p + "ssm_dt.bias"),
                "dt_norm": maybe(p + "ssm_dt_norm.weight"),
                "b_norm": maybe(p + "ssm_b_norm.weight"),
                "c_norm": maybe(p + "ssm_c_norm.weight"),
                "A_log": jnp.asarray(
                    t[p + "ssm_a" if p + "ssm_a" in t else p + "ssm_a.weight"]
                    .to_numpy(), jnp.float32).reshape(hp.ssm_d_inner, hp.ssm_d_state),
                "D": vec(p + "ssm_d" if p + "ssm_d" in t else p + "ssm_d.weight"),
                "ssm_out": linear(p + "ssm_out.weight"),
            })
        # NOT elif: falcon-h1 layers carry BOTH a mamba2 mixer and attention
        # (parallel sum, llm_build_falcon_h1)
        if p + "attn_q.weight" in t:
            layer.update({
                "wq": linear(p + "attn_q.weight"),
                "wk": linear(p + "attn_k.weight"),
                "wv": linear(p + "attn_v.weight"),
                "wo": linear(p + "attn_output.weight"),
            })
        # else: nemotron-h FFN-only sandwich layer
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            if p + "ffn_gate_exps.weight" in t:
                layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
            if p + "exp_probs_b.bias" in t:  # nemotron-h-moe selection bias
                layer["exp_probs_b"] = vec(p + "exp_probs_b.bias")
            if p + "ffn_up_shexp.weight" in t:
                # granite-hybrid gated / nemotron-h-moe gateless ReLU² shexp
                if p + "ffn_gate_shexp.weight" in t:
                    layer["w_gate_shexp"] = linear(p + "ffn_gate_shexp.weight")
                layer["w_up_shexp"] = linear(p + "ffn_up_shexp.weight")
                layer["w_down_shexp"] = linear(p + "ffn_down_shexp.weight")
        elif p + "ffn_up.weight" in t:
            if p + "ffn_gate.weight" in t:
                layer["w_gate"] = linear(p + "ffn_gate.weight")
            layer["w_up"] = linear(p + "ffn_up.weight")
            layer["b_up"] = maybe(p + "ffn_up.bias")
            layer["w_down"] = linear(p + "ffn_down.weight")
            layer["b_down"] = maybe(p + "ffn_down.bias")
        # else: jamba-style mixer-only layer never happens, but nemotron-h
        # mixer layers carry no FFN of their own
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _mamba2_mixer(hp, layer, h, conv_state0, ssm_state0):
    """Mamba-2 SSD mixer over fused z|xBC|dt (shared by nemotron-h,
    granite-hybrid and falcon-h1 ≡ llm_graph_context_mamba::
    build_mamba2_layer). Returns (out, conv_state, ssm_state)."""
    from .mamba import _ssd_scan

    B, T = h.shape[:2]
    D = hp.ssm_d_inner
    H = hp.ssm_dt_rank  # SSD head count
    S = hp.ssm_d_state
    G = hp.ssm_n_group
    hd = D // H
    zxBCdt = layer["ssm_in"](h).astype(jnp.float32)
    z = zxBCdt[..., :D]
    xBC = zxBCdt[..., D: 2 * D + 2 * G * S]
    dt_raw = zxBCdt[..., 2 * D + 2 * G * S:]
    conv_out, conv_state = _causal_conv(
        xBC, conv_state0, layer["conv_w"], layer["conv_b"]
    )
    xBC = jax.nn.silu(conv_out)
    xin = xBC[..., :D].reshape(B, T, H, hd)
    Bm = xBC[..., D: D + G * S].reshape(B, T, G, S)
    Cm = xBC[..., D + G * S:].reshape(B, T, G, S)
    dt = jax.nn.softplus(dt_raw + layer["dt_bias"][None, None])
    A = layer["A_log"]  # stored as -exp(A_log) by the converter
    h0 = ssm_state0.reshape(B, H, hd, S)
    y, ssm_state = _ssd_scan(xin, dt, A, Bm, Cm, h0, G)
    y = y + xin * layer["D"][None, None, :, None]
    y = y.reshape(B, T, D) * jax.nn.silu(z)
    if layer["ssm_norm"] is not None:
        yg = y.reshape(B, T, G, D // G)
        wg = layer["ssm_norm"].reshape(G, D // G)
        yg = yg / jnp.sqrt(
            (yg * yg).mean(-1, keepdims=True) + hp.rms_eps
        ) * wg[None, None]
        y = yg.reshape(B, T, D)
    out = layer["ssm_out"](y.astype(h.dtype))
    return out, conv_state, ssm_state.reshape(B, D, S)


def _ffn_block(hp, layer, h):
    """Per-layer FFN slot: MoE (+ungated shexp) / swiglu / nemotron-h ReLU²
    sequential with biases."""
    B, T = h.shape[:2]
    if "router" in layer:
        hs = h.reshape(B * T, -1)
        logits = layer["router"](hs).astype(jnp.float32)
        gateless = "w_gate_exps" not in layer  # nemotron-h-moe ReLU² experts
        weights, idx = route(
            logits, hp.n_expert_used,
            gating=hp.expert_gating_func if gateless else "softmax",
            norm_weights=hp.expert_weights_norm,
            scale=hp.expert_weights_scale if gateless else 1.0,
            select_bias=layer.get("exp_probs_b"),
        )
        ffn = moe_ffn(hs, weights, idx, layer.get("w_gate_exps"),
                      layer["w_up_exps"], layer["w_down_exps"],
                      act="relu_sqr" if gateless else "silu")
        if "w_up_shexp" in layer:
            up = layer["w_up_shexp"](hs)
            if "w_gate_shexp" in layer:  # granite-hybrid gated shexp
                gate = layer["w_gate_shexp"](hs)
                mid = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            else:  # nemotron-h-moe gateless ReLU² shexp
                mid = jnp.square(
                    jax.nn.relu(up.astype(jnp.float32))).astype(up.dtype)
            sh = layer["w_down_shexp"](mid)
            ffn = ffn + sh.astype(ffn.dtype)
        return ffn.reshape(B, T, -1)
    up = layer["w_up"](h)
    if layer.get("b_up") is not None:
        up = up + layer["b_up"].astype(up.dtype)
    if "w_gate" in layer:
        gate = layer["w_gate"](h)
        mid = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    else:  # nemotron-h ReLU²
        mid = jnp.square(jax.nn.relu(up.astype(jnp.float32))).astype(up.dtype)
    down = layer["w_down"](mid)
    if layer.get("b_down") is not None:
        down = down + layer["b_down"].astype(down.dtype)
    return down


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: HybridCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, HybridCache]:
    from .mamba import _ssd_scan

    B, T = tokens.shape
    D = hp.ssm_d_inner
    R = hp.ssm_dt_rank
    S = hp.ssm_d_state
    G = hp.ssm_n_group
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5
    res_scale = hp.residual_scale  # granite-hybrid multiplier
    x = params["tok_embd"][tokens]
    if hp.embd_scale != 1.0:
        x = x * jnp.asarray(hp.embd_scale, x.dtype)

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    k_cache, v_cache = cache.k, cache.v
    conv_cache, ssm_cache = cache.conv, cache.ssm
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        has_mixer = "ssm_in" in layer or "wq" in layer
        if "ssm_in" in layer and "ssm_x" in layer:
            # mamba1 (jamba) with optional dt/B/C norms
            xz = layer["ssm_in"](h).astype(jnp.float32)
            xin, z = xz[..., :D], xz[..., D:]
            conv_out, conv_state = _causal_conv(
                xin, conv_cache[li], layer["conv_w"], layer["conv_b"]
            )
            xc = jax.nn.silu(conv_out)
            x_db = layer["ssm_x"](xc.astype(x.dtype)).astype(jnp.float32)
            dt_raw = x_db[..., :R]
            Bm = x_db[..., R: R + S]
            Cm = x_db[..., R + S:]
            if layer["dt_norm"] is not None:
                dt_raw = rms_norm(dt_raw, layer["dt_norm"], hp.rms_eps)
                Bm = rms_norm(Bm, layer["b_norm"], hp.rms_eps)
                Cm = rms_norm(Cm, layer["c_norm"], hp.rms_eps)
            dt = jax.nn.softplus(
                layer["ssm_dt"](dt_raw.astype(x.dtype)).astype(jnp.float32)
                + layer["dt_bias"]
            )
            A = layer["A_log"]  # stored as -exp(A_log) by the converter
            y, ssm_state = _selective_scan(xc, dt, A, Bm, Cm, ssm_cache[li])
            y = y + xc * layer["D"][None, None]
            y = y * jax.nn.silu(z)
            conv_cache = conv_cache.at[li].set(conv_state)
            ssm_cache = ssm_cache.at[li].set(ssm_state)
            out = layer["ssm_out"](y.astype(x.dtype))
        elif "ssm_in" in layer:
            out, conv_state, ssm_state = _mamba2_mixer(
                hp, layer, h, conv_cache[li], ssm_cache[li]
            )
            conv_cache = conv_cache.at[li].set(conv_state)
            ssm_cache = ssm_cache.at[li].set(ssm_state)
        elif "wq" in layer:
            n_kv = hp.n_head_kv_l(li) or hp.n_head_kv
            q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
            k = layer["wk"](h).reshape(B, T, n_kv, hp.head_dim)
            v = layer["wv"](h).reshape(B, T, n_kv, hp.head_dim_v)
            if hp.rope_finetuned:  # granite-hybrid optional rope
                from ..ops.rope import apply_rope

                q = apply_rope(q, positions, hp.rope)
                k = apply_rope(k, positions, hp.rope)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if n_kv < hp.n_head_kv:
                pad = ((0, 0), (0, hp.n_head_kv - n_kv), (0, 0), (0, 0))
                kt = jnp.pad(kt, pad)
                vt = jnp.pad(vt, pad)
            # per-row write offsets (BatchEngine slots decode at different
            # depths; idle rows are restored wholesale by the recurrent
            # step's keep_idle, so unmasked writes here are safe)
            start = jnp.maximum(offsets, 0)
            k_cache = k_cache.at[li].set(jax.vmap(
                lambda buf, kn, st: jax.lax.dynamic_update_slice(
                    buf, kn.astype(buf.dtype), (0, st, 0))
            )(k_cache[li], kt, start))
            v_cache = v_cache.at[li].set(jax.vmap(
                lambda buf, vn, st: jax.lax.dynamic_update_slice(
                    buf, vn.astype(buf.dtype), (0, st, 0))
            )(v_cache[li], vt, start))
            attn_out = attention(
                q, k_cache[li, :, :n_kv], v_cache[li, :, :n_kv], mask, scale,
                offsets=offsets,
            )
            out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        else:  # nemotron-h FFN-only sandwich layer
            out = _ffn_block(hp, layer, h)

        if res_scale != 1.0:
            out = out * jnp.asarray(res_scale, out.dtype)
        x = x + out

        # jamba / granite-hybrid pair the mixer with a second FFN sub-block
        if has_mixer and ("w_up" in layer or "router" in layer):
            h2 = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
            out2 = _ffn_block(hp, layer, h2)
            if res_scale != 1.0:
                out2 = out2 * jnp.asarray(res_scale, out2.dtype)
            x = x + out2

    cache = HybridCache(k_cache, v_cache, conv_cache, ssm_cache)
    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    logits = logits.astype(jnp.float32)
    if hp.logit_scale != 1.0:  # granite-hybrid
        logits = logits / hp.logit_scale
    return logits, cache


def forward_falcon_h1(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: HybridCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, HybridCache]:
    """Falcon-H1 (llm_build_falcon_h1): EVERY layer runs attention and a
    mamba2 mixer in PARALLEL over the same attn_norm output; their sum joins
    the residual, then a swiglu FFN."""
    from ..ops.rope import apply_rope

    B, T = tokens.shape
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

        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        start = jnp.maximum(offsets, 0)  # per-row slot depths (see forward)
        k_cache = k_cache.at[li].set(jax.vmap(
            lambda buf, kn, st: jax.lax.dynamic_update_slice(
                buf, kn.astype(buf.dtype), (0, st, 0))
        )(k_cache[li], k.transpose(0, 2, 1, 3), start))
        v_cache = v_cache.at[li].set(jax.vmap(
            lambda buf, vn, st: jax.lax.dynamic_update_slice(
                buf, vn.astype(buf.dtype), (0, st, 0))
        )(v_cache[li], v.transpose(0, 2, 1, 3), start))
        attn_out = attention(q, k_cache[li], v_cache[li], mask, scale,
                             offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        ssm_out, conv_state, ssm_state = _mamba2_mixer(
            hp, layer, h, conv_cache[li], ssm_cache[li]
        )
        conv_cache = conv_cache.at[li].set(conv_state)
        ssm_cache = ssm_cache.at[li].set(ssm_state)

        x = x + attn_out + ssm_out

        h2 = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        x = x + _ffn_block(hp, layer, h2)

    cache = HybridCache(k_cache, v_cache, conv_cache, ssm_cache)
    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
