"""RWKV7 (Goose) decoder — delta-rule linear attention.

Reference: llm_build_rwkv7 / llm_build_rwkv7_base
(src/models/rwkv7.cpp, rwkv7-base.cpp) and the ggml RWKV_WKV7 op
(ggml-cpu/ops.cpp:10302):

  sa_i       = Σ_j a[t,j]·S[i,j]
  S[i,j]    ← S[i,j]·w[t,j] + v[t,i]·k[t,j] + sa_i·b[t,j]
  out[t,i]   = Σ_j S[i,j]·r[t,j]

with a = −k̂ (L2-normalized keys) and b = k̂·a_gate — a rank-one
state-dependent (delta-rule) update, so unlike rwkv6/mamba it is NOT an
elementwise-decay recurrence; it runs as a `lax.scan` over time (the state
matmuls still batch over heads on the MXU). Token-shift and WKV state reuse
the Rwkv6Cache layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..models.hparams import HParams
from ..ops.norms import layer_norm
from .llama import Params
from .rwkv6 import GROUP_NORM_EPS, Rwkv6Cache
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe(name):
        return vec(name) if name in t else None

    def raw(name):
        return jnp.asarray(t[name].to_numpy(), dtype=jnp.float32)

    def maybe_raw(name):
        return raw(name) if name in t else None

    D = hp.ssm_d_state
    H = hp.n_embd // D
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        n_fused = t[p + "time_mix_lerp_fused.weight"].to_numpy().size // hp.n_embd
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "attn_norm_2": vec(p + "attn_norm_2.weight"),
            "attn_norm_2_b": maybe(p + "attn_norm_2.bias"),
            # fused lerp biases in r,w,k,v,a[,g] order (rwkv7-base.cpp views)
            "lerp_fused": raw(p + "time_mix_lerp_fused.weight").reshape(n_fused, -1),
            "w0": raw(p + "time_mix_w0.weight").reshape(-1),
            "w1": raw(p + "time_mix_w1.weight"),  # (rank_w, E)
            "w2": raw(p + "time_mix_w2.weight"),  # (E, rank_w)
            "a0": raw(p + "time_mix_a0.weight").reshape(-1),
            "a1": raw(p + "time_mix_a1.weight"),
            "a2": raw(p + "time_mix_a2.weight"),
            "v0": maybe_raw(p + "time_mix_v0.weight"),
            "v1": maybe_raw(p + "time_mix_v1.weight"),
            "v2": maybe_raw(p + "time_mix_v2.weight"),
            "g1": maybe_raw(p + "time_mix_g1.weight"),
            "g2": maybe_raw(p + "time_mix_g2.weight"),
            "k_k": raw(p + "time_mix_k_k.weight").reshape(-1),
            "k_a": raw(p + "time_mix_k_a.weight").reshape(-1),
            "r_k": raw(p + "time_mix_r_k.weight").reshape(H, D),
            "wr": linear(p + "time_mix_receptance.weight"),
            "wk": linear(p + "time_mix_key.weight"),
            "wv": linear(p + "time_mix_value.weight"),
            "ln_x": maybe(p + "time_mix_ln.weight"),
            "ln_x_b": maybe(p + "time_mix_ln.bias"),
            "wo": linear(p + "time_mix_output.weight"),
            "cm_lerp_k": raw(p + "channel_mix_lerp_k.weight").reshape(-1),
            "cm_key": linear(p + "channel_mix_key.weight"),
            "cm_value": linear(p + "channel_mix_value.weight"),
        }
        if layer["v0"] is not None:
            layer["v0"] = layer["v0"].reshape(-1)
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "tok_norm": vec("token_embd_norm.weight"),
        "tok_norm_b": maybe("token_embd_norm.bias"),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
        "output_norm_b": maybe("output_norm.bias"),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _wkv7(r, w, k, v, a, b, s0):
    """Delta-rule scan. r,w,k,v,a,b: [B,T,H,D]; s0: [B,H,D,D]
    (state[i=value-dim, j=key-dim]). Returns (out [B,T,H,D], sT)."""

    def step(s, inp):
        r_t, w_t, k_t, v_t, a_t, b_t = inp  # each [B,H,D]
        sa = jnp.einsum("bhij,bhj->bhi", s, a_t)
        s = (
            s * w_t[:, :, None, :]
            + v_t[..., :, None] * k_t[..., None, :]
            + sa[..., :, None] * b_t[..., None, :]
        )
        out = jnp.einsum("bhij,bhj->bhi", s, r_t)
        return s, out

    xs = tuple(jnp.moveaxis(z, 1, 0) for z in (r, w, k, v, a, b))
    sT, outs = jax.lax.scan(step, s0, xs)
    return jnp.moveaxis(outs, 0, 1), sT


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,  # unused
    cache: Rwkv6Cache,
    cache_offset,  # unused
    return_hidden: bool = False,
) -> tuple[jax.Array, Rwkv6Cache]:
    B, T = tokens.shape
    E = hp.n_embd
    D = hp.ssm_d_state
    H = E // D
    eps = hp.rms_eps

    x = params["tok_embd"][tokens].astype(jnp.float32)
    x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], eps)

    new_shift = cache.shift
    new_wkv = cache.wkv
    v_first = None
    for li, lyr in enumerate(params["layers"]):
        att_norm = layer_norm(x, lyr["attn_norm"], lyr["attn_norm_b"], eps)
        att_shift = cache.shift[li, :, 0][:, None]
        x_prev = jnp.concatenate([att_shift, att_norm[:, :-1]], axis=1)

        # -- time mix (build_rwkv7_time_mix) -------------------------------
        cur = att_norm.astype(jnp.float32)
        sx = x_prev.astype(jnp.float32) - cur
        mixed = cur[:, :, None] + sx[:, :, None] * lyr["lerp_fused"][None, None]
        xr, xw, xk, xv, xa = [mixed[:, :, i] for i in range(5)]
        xg = mixed[:, :, 5] if lyr["g1"] is not None else None

        rr = lyr["wr"](xr.astype(x.dtype)).astype(jnp.float32)
        w = lyr["w0"] + jnp.einsum(
            "btr,er->bte",
            jnp.tanh(jnp.einsum("bte,re->btr", xw, lyr["w1"])),
            lyr["w2"],
        )
        w = jnp.exp(-0.606531 * jax.nn.sigmoid(w))
        kk_ = lyr["wk"](xk.astype(x.dtype)).astype(jnp.float32)
        vv = lyr["wv"](xv.astype(x.dtype)).astype(jnp.float32)
        if v_first is None:
            v_first = vv
        else:
            gate = jax.nn.sigmoid(
                lyr["v0"] + jnp.einsum(
                    "btr,er->bte",
                    jnp.einsum("bte,re->btr", xv, lyr["v1"]),
                    lyr["v2"],
                )
            )
            vv = vv + (v_first - vv) * gate
        a = jax.nn.sigmoid(
            lyr["a0"] + jnp.einsum(
                "btr,er->bte",
                jnp.einsum("bte,re->btr", xa, lyr["a1"]),
                lyr["a2"],
            )
        )
        g = None
        if xg is not None:
            g = jnp.einsum(
                "btr,er->bte",
                jax.nn.sigmoid(jnp.einsum("bte,re->btr", xg, lyr["g1"])),
                lyr["g2"],
            )

        kk_n = (kk_ * lyr["k_k"]).reshape(B, T, H, D)
        kk_n = kk_n / jnp.maximum(
            jnp.linalg.norm(kk_n, axis=-1, keepdims=True), 1e-12
        )
        ka = kk_ * lyr["k_a"]
        k_final = kk_ + a * ka - ka

        rh = rr.reshape(B, T, H, D)
        wh = w.reshape(B, T, H, D)
        kh = k_final.reshape(B, T, H, D)
        vh = vv.reshape(B, T, H, D)
        ah = a.reshape(B, T, H, D)
        out, s_last = _wkv7(rh, wh, kh, vh, -kk_n, kk_n * ah, cache.wkv[li])
        new_wkv = new_wkv.at[li].set(s_last)

        if lyr["ln_x"] is not None:  # per-head group norm
            mu = out.mean(axis=-1, keepdims=True)
            var = ((out - mu) ** 2).mean(axis=-1, keepdims=True)
            out = (out - mu) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
            out = out.reshape(B, T, E) * lyr["ln_x"] + lyr["ln_x_b"]
        else:
            out = out.reshape(B, T, E)
        # rk residual: out += v · Σ_d(k·r·r_k) per head
        rk = (kh * rh * lyr["r_k"][None, None]).sum(-1)  # [B,T,H]
        out = out + (vh * rk[..., None]).reshape(B, T, E)
        if g is not None:
            out = out * g
        x = x + lyr["wo"](out.astype(x.dtype)).astype(jnp.float32)

        # -- channel mix (build_rwkv7_channel_mix) -------------------------
        ffn_norm = layer_norm(x, lyr["attn_norm_2"], lyr["attn_norm_2_b"], eps)
        ffn_shift = cache.shift[li, :, 1][:, None]
        x_prev = jnp.concatenate([ffn_shift, ffn_norm[:, :-1]], axis=1)
        cur = ffn_norm.astype(jnp.float32)
        sx = x_prev.astype(jnp.float32) - cur
        xk_c = cur + sx * lyr["cm_lerp_k"]
        key = jnp.square(jax.nn.relu(
            lyr["cm_key"](xk_c.astype(x.dtype)).astype(jnp.float32)
        ))
        x = x + lyr["cm_value"](key.astype(x.dtype)).astype(jnp.float32)

        new_shift = new_shift.at[li, :, 0].set(att_norm[:, -1].astype(jnp.float32))
        new_shift = new_shift.at[li, :, 1].set(ffn_norm[:, -1].astype(jnp.float32))

    cache = Rwkv6Cache(new_shift, new_wkv)
    x = layer_norm(x, params["output_norm"], params["output_norm_b"], eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x.astype(params["tok_embd"].dtype))
    else:
        logits = jnp.dot(x.astype(params["tok_embd"].dtype), params["tok_embd"].T)
    return logits.astype(jnp.float32), cache


# ---------------------------------------------------------------------------
# ARWKV7 (llm_build_arwkv7): RWKV7 time-mix grafted onto a llama-style body —
# RMS norms, single token-shift, swiglu FFN, no channel-mix / tok_norm.
# ---------------------------------------------------------------------------


def build_params_arwkv(r: GGUFReader, hp: HParams, mode: str = "auto",
                       dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe(name):
        return vec(name) if name in t else None

    def raw(name):
        return jnp.asarray(t[name].to_numpy(), dtype=jnp.float32)

    def maybe_raw(name):
        return raw(name) if name in t else None

    D = hp.ssm_d_state
    H = hp.n_embd // D
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        n_fused = t[p + "time_mix_lerp_fused.weight"].to_numpy().size // hp.n_embd
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "lerp_fused": raw(p + "time_mix_lerp_fused.weight").reshape(n_fused, -1),
            "w0": raw(p + "time_mix_w0.weight").reshape(-1),
            "w1": raw(p + "time_mix_w1.weight"),
            "w2": raw(p + "time_mix_w2.weight"),
            "a0": raw(p + "time_mix_a0.weight").reshape(-1),
            "a1": raw(p + "time_mix_a1.weight"),
            "a2": raw(p + "time_mix_a2.weight"),
            "v0": maybe_raw(p + "time_mix_v0.weight"),
            "v1": maybe_raw(p + "time_mix_v1.weight"),
            "v2": maybe_raw(p + "time_mix_v2.weight"),
            "g1": maybe_raw(p + "time_mix_g1.weight"),
            "g2": maybe_raw(p + "time_mix_g2.weight"),
            "k_k": raw(p + "time_mix_k_k.weight").reshape(-1),
            "k_a": raw(p + "time_mix_k_a.weight").reshape(-1),
            "r_k": raw(p + "time_mix_r_k.weight").reshape(H, D),
            "wr": linear(p + "time_mix_receptance.weight"),
            "wk": linear(p + "time_mix_key.weight"),
            "wv": linear(p + "time_mix_value.weight"),
            "ln_x": maybe(p + "time_mix_ln.weight"),
            "ln_x_b": maybe(p + "time_mix_ln.bias"),
            "wo": linear(p + "time_mix_output.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
        }
        if layer["v0"] is not None:
            layer["v0"] = layer["v0"].reshape(-1)
        layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
        "output_norm_b": maybe("output_norm.bias"),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _time_mix(hp, lyr, att_norm, x_prev, v_first, wkv_state, x_dtype):
    """Shared RWKV7 time-mix (build_rwkv7_time_mix). Returns
    (out [B,T,E] f32, v_first, new_state)."""
    B, T, E = att_norm.shape
    D = hp.ssm_d_state
    H = E // D
    cur = att_norm.astype(jnp.float32)
    sx = x_prev.astype(jnp.float32) - cur
    mixed = cur[:, :, None] + sx[:, :, None] * lyr["lerp_fused"][None, None]
    xr, xw, xk, xv, xa = [mixed[:, :, i] for i in range(5)]
    xg = mixed[:, :, 5] if lyr["g1"] is not None else None

    rr = lyr["wr"](xr.astype(x_dtype)).astype(jnp.float32)
    w = lyr["w0"] + jnp.einsum(
        "btr,er->bte", jnp.tanh(jnp.einsum("bte,re->btr", xw, lyr["w1"])),
        lyr["w2"])
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(w))
    kk_ = lyr["wk"](xk.astype(x_dtype)).astype(jnp.float32)
    vv = lyr["wv"](xv.astype(x_dtype)).astype(jnp.float32)
    if v_first is None:
        v_first = vv
    else:
        gate = jax.nn.sigmoid(
            lyr["v0"] + jnp.einsum(
                "btr,er->bte", jnp.einsum("bte,re->btr", xv, lyr["v1"]),
                lyr["v2"]))
        vv = vv + (v_first - vv) * gate
    a = jax.nn.sigmoid(
        lyr["a0"] + jnp.einsum(
            "btr,er->bte", jnp.einsum("bte,re->btr", xa, lyr["a1"]),
            lyr["a2"]))
    g = None
    if xg is not None:
        g = jnp.einsum(
            "btr,er->bte",
            jax.nn.sigmoid(jnp.einsum("bte,re->btr", xg, lyr["g1"])),
            lyr["g2"])

    kk_n = (kk_ * lyr["k_k"]).reshape(B, T, H, D)
    kk_n = kk_n / jnp.maximum(jnp.linalg.norm(kk_n, axis=-1, keepdims=True), 1e-12)
    ka = kk_ * lyr["k_a"]
    k_final = kk_ + a * ka - ka

    rh = rr.reshape(B, T, H, D)
    wh = w.reshape(B, T, H, D)
    kh = k_final.reshape(B, T, H, D)
    vh = vv.reshape(B, T, H, D)
    ah = a.reshape(B, T, H, D)
    out, s_last = _wkv7(rh, wh, kh, vh, -kk_n, kk_n * ah, wkv_state)

    if lyr["ln_x"] is not None:
        mu = out.mean(axis=-1, keepdims=True)
        var = ((out - mu) ** 2).mean(axis=-1, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
        out = out.reshape(B, T, E) * lyr["ln_x"] + lyr["ln_x_b"]
    else:
        out = out.reshape(B, T, E)
    rk = (kh * rh * lyr["r_k"][None, None]).sum(-1)
    out = out + (vh * rk[..., None]).reshape(B, T, E)
    if g is not None:
        out = out * g
    return out, v_first, s_last


def forward_arwkv(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,  # unused
    cache: Rwkv6Cache,
    cache_offset,  # unused
    return_hidden: bool = False,
) -> tuple[jax.Array, Rwkv6Cache]:
    from ..ops.norms import rms_norm

    B, T = tokens.shape
    eps = hp.rms_eps
    x = params["tok_embd"][tokens].astype(jnp.float32)

    new_shift = cache.shift
    new_wkv = cache.wkv
    v_first = None
    for li, lyr in enumerate(params["layers"]):
        att_norm = rms_norm(x, lyr["attn_norm"], eps)
        att_shift = cache.shift[li, :, 0][:, None]
        x_prev = jnp.concatenate([att_shift, att_norm[:, :-1]], axis=1)
        out, v_first, s_last = _time_mix(
            hp, lyr, att_norm, x_prev, v_first, cache.wkv[li], x.dtype
        )
        new_wkv = new_wkv.at[li].set(s_last)
        new_shift = new_shift.at[li, :, 0].set(att_norm[:, -1].astype(jnp.float32))
        x = x + lyr["wo"](out.astype(x.dtype)).astype(jnp.float32)

        h = rms_norm(x, lyr["ffn_norm"], eps)
        gate = lyr["w_gate"](h)
        up = lyr["w_up"](h)
        x = x + lyr["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        ).astype(jnp.float32)

    cache = Rwkv6Cache(new_shift, new_wkv)
    x = rms_norm(x, params["output_norm"], eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x.astype(params["tok_embd"].dtype))
    else:
        logits = jnp.dot(x.astype(params["tok_embd"].dtype), params["tok_embd"].T)
    return logits.astype(jnp.float32), cache
