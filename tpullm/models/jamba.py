"""Jamba hybrid decoder (interleaved attention + Mamba layers, optional MoE).

Reference graph: llm_build_jamba (src/models/jamba.cpp) over the hybrid
memory (llama-memory-hybrid: KV cache for attention layers + recurrent
state for Mamba layers). Per-layer dispatch: hparams.n_head_kv(il) == 0
marks a Mamba layer; attention layers use GQA with NO positional encoding
(Jamba has no rope); FFN is dense swiglu or softmax-routed MoE per layer.
Jamba's Mamba layers add RMS norms on dt/B/C (ssm_dt_norm/b_norm/c_norm).

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
from .mamba import _causal_conv, _selective_scan
from .weights import load_embedding, load_linear, load_vector


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
        return cls(
            jnp.zeros((hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim), dtype),
            jnp.zeros((hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim_v), dtype),
            jnp.zeros((hp.n_layer, batch, hp.ssm_d_inner, hp.ssm_d_conv - 1), jnp.float32),
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
        w = t[name].to_numpy()  # (E, n_out, n_in)
        return jnp.asarray(np.ascontiguousarray(w.transpose(0, 2, 1)), dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {"attn_norm": vec(p + "attn_norm.weight"),
                 "ffn_norm": vec(p + "ffn_norm.weight")}
        if p + "ssm_in.weight" in t:  # mamba layer
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
        else:
            layer.update({
                "wq": linear(p + "attn_q.weight"),
                "wk": linear(p + "attn_k.weight"),
                "wv": linear(p + "attn_v.weight"),
                "wo": linear(p + "attn_output.weight"),
            })
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            layer["router"] = linear(p + "ffn_gate_inp.weight")
            layer["w_gate_exps"] = experts(p + "ffn_gate_exps.weight")
            layer["w_up_exps"] = experts(p + "ffn_up_exps.weight")
            layer["w_down_exps"] = experts(p + "ffn_down_exps.weight")
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
    D = hp.ssm_d_inner
    R = hp.ssm_dt_rank
    S = hp.ssm_d_state
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    k_cache, v_cache = cache.k, cache.v
    conv_cache, ssm_cache = cache.conv, cache.ssm
    for li, layer in enumerate(params["layers"]):
        n_kv = hp.n_head_kv_l(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if n_kv == 0:  # mamba layer (build_mamba_layer, jamba dt/B/C norms)
            hf = h
            xz = layer["ssm_in"](hf).astype(jnp.float32)
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
            A = -jnp.exp(layer["A_log"])
            y, ssm_state = _selective_scan(xc, dt, A, Bm, Cm, ssm_cache[li])
            y = y + xc * layer["D"][None, None]
            y = y * jax.nn.silu(z)
            conv_cache = conv_cache.at[li].set(conv_state)
            ssm_cache = ssm_cache.at[li].set(ssm_state)
            out = layer["ssm_out"](y.astype(x.dtype))
        else:  # attention layer — no rope (jamba)
            q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
            k = layer["wk"](h).reshape(B, T, n_kv, hp.head_dim)
            v = layer["wv"](h).reshape(B, T, n_kv, hp.head_dim_v)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if n_kv < hp.n_head_kv:
                pad = ((0, 0), (0, hp.n_head_kv - n_kv), (0, 0), (0, 0))
                kt = jnp.pad(kt, pad)
                vt = jnp.pad(vt, pad)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kt[None].astype(k_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0),
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vt[None].astype(v_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0),
            )
            attn_out = attention(
                q, k_cache[li, :, :n_kv], v_cache[li, :, :n_kv], mask, scale,
                offsets=offsets,
            )
            out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        x = x + out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "router" in layer:  # MoE (softmax, un-renormalized)
            hs = h.reshape(B * T, -1)
            logits = layer["router"](hs).astype(jnp.float32)
            weights, idx = route(logits, hp.n_expert_used, gating="softmax",
                                 norm_weights=False)
            ffn = moe_ffn(hs, weights, idx, layer["w_gate_exps"],
                          layer["w_up_exps"], layer["w_down_exps"])
            ffn = ffn.reshape(B, T, -1)
        else:
            gate = layer["w_gate"](h)
            up = layer["w_up"](h)
            ffn = layer["w_down"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )
        x = x + ffn

    cache = HybridCache(k_cache, v_cache, conv_cache, ssm_cache)
    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
