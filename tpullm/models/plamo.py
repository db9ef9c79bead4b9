"""PLaMo family decoders (Preferred Networks).

Reference graphs:
- llm_build_plamo (src/models/plamo.cpp): parallel-residual — attention and
  swiglu FFN both consume the same attn_norm output and their outputs join
  one residual add; full-head neox rope.
- llm_build_plamo2 (plamo2.cpp): hybrid of mamba(-2-style, per-head scalar
  A/dt, single B/C group, RMS-normed B/C/dt from a post-conv projection,
  swiglu-split z gating) and fused-qkv attention layers, each wrapped in
  pre+post norms, with a fused-swiglu sequential FFN sub-block per layer.
- llm_build_plamo3 (plamo3.cpp): dense fused-qkv attention with per-head qk
  norms, pre+post norm sandwich, fused-swiglu FFN; optional iSWA (local
  layers use the SWA rope base).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .jamba import HybridCache
from .llama import Params, output_head
from .mamba import _causal_conv, _ssd_scan
from .phi3 import slice_rows
from .weights import load_embedding, load_linear, load_vector


# -- plamo v1 ------------------------------------------------------------------


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
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
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        # parallel FFN over the SAME normed input (llm_build_plamo)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = x + attn_out + ffn

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache


# -- plamo2 (hybrid) -----------------------------------------------------------


def build_params2(r: GGUFReader, hp: HParams, mode: str = "auto",
                  dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name, d=jnp.float32):
        return load_vector(t[name], dtype=d)

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_post_norm": vec(p + "post_attention_norm.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "ffn_post_norm": vec(p + "post_ffw_norm.weight"),
        }
        if p + "ssm_in.weight" in t:  # mamba layer
            layer.update({
                "ssm_in": linear(p + "ssm_in.weight"),
                "conv_w": jnp.asarray(
                    t[p + "ssm_conv1d.weight"].to_numpy(), jnp.float32
                ).reshape(hp.ssm_d_inner, hp.ssm_d_conv),
                "ssm_x": linear(p + "ssm_x.weight"),
                "b_norm": vec(p + "ssm_b_norm.weight"),
                "c_norm": vec(p + "ssm_c_norm.weight"),
                "dt_norm": vec(p + "ssm_dt_norm.weight"),
                "ssm_dt": linear(p + "ssm_dt.weight"),
                "dt_bias": vec(p + "ssm_dt.bias"),
                "A": vec(p + "ssm_a"),  # converter stores -exp(A_log), [H]
                "D": vec(p + "ssm_d"),  # [H]
                "ssm_out": linear(p + "ssm_out.weight"),
            })
        else:
            qkv = t[p + "attn_qkv.weight"]
            layer.update({
                "wq": load_linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight"),
                                  mode=mode, dtype=dtype),
                "wk": load_linear(
                    slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight"),
                    mode=mode, dtype=dtype),
                "wv": load_linear(
                    slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                               p + "attn_v.weight"),
                    mode=mode, dtype=dtype),
                "wo": linear(p + "attn_output.weight"),
                "q_norm": vec(p + "attn_q_norm.weight"),
                "k_norm": vec(p + "attn_k_norm.weight"),
            })
        up = t[p + "ffn_up.weight"]
        n_ff = up.shape[1] // 2
        layer["w_gate"] = load_linear(
            slice_rows(up, 0, n_ff, p + "ffn_gate.weight"), mode=mode, dtype=dtype)
        layer["w_up"] = load_linear(
            slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight"), mode=mode, dtype=dtype)
        layer["w_down"] = linear(p + "ffn_down.weight")
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def forward2(
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
    H = hp.ssm_dt_rank  # mamba head count
    hd = D // H
    S = hp.ssm_d_state
    scale = hp.head_dim_v ** -0.5
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
        if "ssm_in" in layer:
            zx = layer["ssm_in"](h).astype(jnp.float32)  # [B,T,2D]
            # per-head interleave: [z(hd) | x(hd)] × H
            zx = zx.reshape(B, T, H, 2 * hd)
            z = zx[..., :hd].reshape(B, T, D)
            xin = zx[..., hd:].reshape(B, T, D)
            conv_out, conv_state = _causal_conv(
                xin, conv_cache[li], layer["conv_w"],
                jnp.zeros((D,), jnp.float32),
            )
            conv_cache = conv_cache.at[li].set(conv_state)
            xc = jax.nn.silu(conv_out)
            bcdt = layer["ssm_x"](xc.astype(x.dtype)).astype(jnp.float32)
            Bm = rms_norm(bcdt[..., :S], layer["b_norm"], hp.rms_eps)
            Cm = rms_norm(bcdt[..., S:2 * S], layer["c_norm"], hp.rms_eps)
            dt_raw = rms_norm(bcdt[..., 2 * S:], layer["dt_norm"], hp.rms_eps)
            dt = jax.nn.softplus(
                layer["ssm_dt"](dt_raw.astype(x.dtype)).astype(jnp.float32)
                + layer["dt_bias"]
            )  # [B,T,H]
            A = layer["A"]  # already -exp(A_log), per head
            h0 = ssm_cache[li].reshape(B, H, hd, S)
            y, ssm_state = _ssd_scan(
                xc.reshape(B, T, H, hd), dt, A,
                Bm[:, :, None, :], Cm[:, :, None, :], h0, 1,
            )
            ssm_cache = ssm_cache.at[li].set(ssm_state.reshape(B, D, S))
            y = y + xc.reshape(B, T, H, hd) * layer["D"][None, None, :, None]
            y = y.reshape(B, T, D) * jax.nn.silu(z)
            cur = layer["ssm_out"](y.astype(x.dtype))
        else:
            q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
            k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
            v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.transpose(0, 2, 1, 3)[None].astype(k_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.transpose(0, 2, 1, 3)[None].astype(v_cache.dtype),
                (li, 0, 0, jnp.asarray(cache_offset), 0))
            attn_out = attention(q, k_cache[li], v_cache[li], mask, scale,
                                 offsets=offsets)
            cur = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        cur = rms_norm(cur, layer["attn_post_norm"], hp.rms_eps)
        x = x + cur

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        ffn = rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ffn

    new_cache = HybridCache(k_cache, v_cache, conv_cache, ssm_cache)
    if return_hidden:
        return (rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32),
                new_cache)
    return output_head(hp, params, x), new_cache


# -- plamo3 --------------------------------------------------------------------


def build_params3(r: GGUFReader, hp: HParams, mode: str = "auto",
                  dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        qkv = t[p + "attn_qkv.weight"]
        up = t[p + "ffn_up.weight"]
        n_ff = up.shape[1] // 2
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "attn_post_norm": load_vector(t[p + "post_attention_norm.weight"]),
            "wq": load_linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight"),
                              mode=mode, dtype=dtype),
            "wk": load_linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight"),
                              mode=mode, dtype=dtype),
            "wv": load_linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                         p + "attn_v.weight"),
                              mode=mode, dtype=dtype),
            "wo": linear(p + "attn_output.weight"),
            "q_norm": load_vector(t[p + "attn_q_norm.weight"]),
            "k_norm": load_vector(t[p + "attn_k_norm.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "ffn_post_norm": load_vector(t[p + "post_ffw_norm.weight"]),
            "w_gate": load_linear(slice_rows(up, 0, n_ff, p + "ffn_gate.weight"),
                                  mode=mode, dtype=dtype),
            "w_up": load_linear(slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight"),
                                mode=mode, dtype=dtype),
            "w_down": linear(p + "ffn_down.weight"),
        })
    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def forward3(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, KVCache]:
    B, T = tokens.shape
    scale = hp.head_dim ** -0.5
    x = params["tok_embd"][tokens]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len, 0)
    mask_swa = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)
    rope_global = hp.rope
    rope_swa = (replace(hp.rope, freq_base=hp.rope_freq_base_swa)
                if hp.rope_freq_base_swa > 0 else hp.rope)

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        rope = rope_swa if swa else rope_global
        q = apply_rope(q, positions, rope)
        k = apply_rope(k, positions, rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask_swa if swa else mask_full, scale,
            offsets=offsets, sliding_window=hp.sliding_window if swa else 0,
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        x = x + rms_norm(attn_out, layer["attn_post_norm"], hp.rms_eps)

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = x + rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
