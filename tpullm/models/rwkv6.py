"""RWKV6 (Finch) decoder.

Reference: llm_build_rwkv6 / llm_build_rwkv6_base (src/models/rwkv6*.cpp)
and the ggml RWKV_WKV6 op (ggml-cpu/ops.cpp):

  out[t,h,j] = Σ_i r[t,h,i]·(first[h,i]·k[t,h,i]·v[t,h,j] + S[h,i,j])
  S[h,i,j]  ← S[h,i,j]·decay[t,h,i] + k[t,h,i]·v[t,h,j]

TPU-first: the per-head matrix-state recurrence is a linear recurrence in
S ∈ R^{D×D} with elementwise decay, so it runs as one
`jax.lax.associative_scan` over (decay, k⊗v) pairs — O(log T) depth like the
mamba path. Token-shift states (attn + ffn) and the WKV state live in a
dedicated recurrent cache; prefills are exact-length (ArchSpec.recurrent).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models.hparams import HParams
from ..ops.norms import layer_norm
from .llama import Params
from .weights import load_embedding, load_linear, load_vector

GROUP_NORM_EPS = 64e-5  # ggml_norm eps used after wkv (rwkv6-base.cpp)


@jax.tree_util.register_pytree_node_class
@dataclass
class Rwkv6Cache:
    shift: jax.Array  # [L, B, 2, E]  (attn-shift, ffn-shift)
    wkv: jax.Array  # [L, B, H, D, D] f32

    def tree_flatten(self):
        return (self.shift, self.wkv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return 1 << 30

    @property
    def batch(self) -> int:
        return self.shift.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int = 0, dtype=None):
        D = hp.ssm_d_state  # wkv head size (reused hparam slot)
        H = hp.n_embd // D
        return cls(
            jnp.zeros((hp.n_layer, batch, 2, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, batch, H, D, D), jnp.float32),
        )


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

    D = hp.ssm_d_state
    H = hp.n_embd // D
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        w1 = raw(p + "time_mix_w1.weight")  # (5*rank, E)
        rank = w1.shape[0] // 5
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_norm_b": maybe(p + "attn_norm.bias"),
            "attn_norm_2": vec(p + "attn_norm_2.weight"),
            "attn_norm_2_b": maybe(p + "attn_norm_2.bias"),
            "lerp_x": raw(p + "time_mix_lerp_x.weight").reshape(-1),
            # (5, 1, E) fused lerp biases in w,k,v,r,g order
            "lerp_fused": raw(p + "time_mix_lerp_fused.weight").reshape(5, -1),
            "w1": w1.reshape(5, rank, hp.n_embd),  # group-major rows
            "w2": raw(p + "time_mix_w2.weight").reshape(5, hp.n_embd, rank),
            "first": raw(p + "time_mix_first.weight").reshape(H, D),
            "decay": raw(p + "time_mix_decay.weight").reshape(-1),
            "decay_w1": raw(p + "time_mix_decay_w1.weight"),  # (rank_w, E)
            "decay_w2": raw(p + "time_mix_decay_w2.weight"),  # (E, rank_w)
            "wk": linear(p + "time_mix_key.weight"),
            "wv": linear(p + "time_mix_value.weight"),
            "wr": linear(p + "time_mix_receptance.weight"),
            "wg": linear(p + "time_mix_gate.weight"),
            "ln_x": vec(p + "time_mix_ln.weight"),
            "ln_x_b": vec(p + "time_mix_ln.bias"),
            "wo": linear(p + "time_mix_output.weight"),
            "cm_lerp_k": raw(p + "channel_mix_lerp_k.weight").reshape(-1),
            "cm_lerp_r": raw(p + "channel_mix_lerp_r.weight").reshape(-1),
            "cm_key": linear(p + "channel_mix_key.weight"),
            "cm_recep": linear(p + "channel_mix_receptance.weight"),
            "cm_value": linear(p + "channel_mix_value.weight"),
        }
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


def _wkv6(r, k, v, w, first, s0):
    """r,k,v,w: [B,T,H,D]; first: [H,D]; s0: [B,H,D,D] →
    (out [B,T,H,D], sT). Associative scan over S = diag(w)·S + k⊗v."""
    kv = k[..., :, None] * v[..., None, :]  # [B,T,H,D,D] (i=key idx, j=val idx)
    a = jnp.broadcast_to(w[..., :, None], kv.shape)  # decay over i, bcast j

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    a_acc, b_acc = jax.lax.associative_scan(combine, (a, kv), axis=1)
    s_after = a_acc * s0[:, None] + b_acc  # [B,T,H,D,D]
    s_before = jnp.concatenate([s0[:, None], s_after[:, :-1]], axis=1)
    # out_j = Σ_i r_i (first_i kv_ij + S_before_ij)
    out = jnp.einsum("bthi,bthij->bthj", r,
                     first[None, None, :, :, None] * kv + s_before)
    return out, s_after[:, -1]


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
    rescale_every = hp.rescale_every

    x = params["tok_embd"][tokens].astype(jnp.float32)
    x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], eps)

    new_shift = cache.shift
    new_wkv = cache.wkv
    for li, lyr in enumerate(params["layers"]):
        att_norm = layer_norm(x, lyr["attn_norm"], lyr["attn_norm_b"], eps)
        att_shift = cache.shift[li, :, 0][:, None]  # [B,1,E]
        x_prev = jnp.concatenate([att_shift, att_norm[:, :-1]], axis=1)

        # -- time mix -------------------------------------------------------
        cur = att_norm.astype(jnp.float32)
        sx = x_prev.astype(jnp.float32) - cur
        xxx = cur + sx * lyr["lerp_x"]
        five = jnp.tanh(jnp.einsum("bte,gre->btgr", xxx, lyr["w1"]))
        deltas = jnp.einsum("btgr,ger->btge", five, lyr["w2"])  # [B,T,5,E]
        mixed = cur[:, :, None] + sx[:, :, None] * (
            deltas + lyr["lerp_fused"][None, None]
        )  # order: w,k,v,r,g
        xw, xk, xv, xr, xg = [mixed[:, :, i] for i in range(5)]

        rr = lyr["wr"](xr.astype(x.dtype)).astype(jnp.float32)
        kk = lyr["wk"](xk.astype(x.dtype)).astype(jnp.float32)
        vv = lyr["wv"](xv.astype(x.dtype)).astype(jnp.float32)
        g = jax.nn.silu(lyr["wg"](xg.astype(x.dtype)).astype(jnp.float32))

        w = jnp.einsum(
            "btr,er->bte",
            jnp.tanh(jnp.einsum("bte,re->btr", xw, lyr["decay_w1"])),
            lyr["decay_w2"],
        ) + lyr["decay"]
        w = jnp.exp(-jnp.exp(w))

        rh = rr.reshape(B, T, H, D)
        kh = kk.reshape(B, T, H, D)
        vh = vv.reshape(B, T, H, D)
        wh = w.reshape(B, T, H, D)
        out, s_last = _wkv6(rh, kh, vh, wh, lyr["first"], cache.wkv[li])
        new_wkv = new_wkv.at[li].set(s_last)

        # per-head group norm (ggml_norm over head_size, eps 64e-5)
        mu = out.mean(axis=-1, keepdims=True)
        var = ((out - mu) ** 2).mean(axis=-1, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
        out = out.reshape(B, T, E) * lyr["ln_x"] + lyr["ln_x_b"]
        out = out * g
        x = x + lyr["wo"](out.astype(x.dtype)).astype(jnp.float32)

        # -- channel mix ----------------------------------------------------
        ffn_norm = layer_norm(x, lyr["attn_norm_2"], lyr["attn_norm_2_b"], eps)
        ffn_shift = cache.shift[li, :, 1][:, None]
        x_prev = jnp.concatenate([ffn_shift, ffn_norm[:, :-1]], axis=1)
        cur = ffn_norm.astype(jnp.float32)
        sx = x_prev.astype(jnp.float32) - cur
        xk_c = cur + sx * lyr["cm_lerp_k"]
        xr_c = cur + sx * lyr["cm_lerp_r"]
        rcv = jax.nn.sigmoid(lyr["cm_recep"](xr_c.astype(x.dtype)).astype(jnp.float32))
        key = jnp.square(jax.nn.relu(lyr["cm_key"](xk_c.astype(x.dtype)).astype(jnp.float32)))
        x = x + rcv * lyr["cm_value"](key.astype(x.dtype)).astype(jnp.float32)

        new_shift = new_shift.at[li, :, 0].set(att_norm[:, -1].astype(jnp.float32))
        new_shift = new_shift.at[li, :, 1].set(ffn_norm[:, -1].astype(jnp.float32))

        if rescale_every and (li + 1) % rescale_every == 0:
            x = x * 0.5

    cache = Rwkv6Cache(new_shift, new_wkv)
    x = layer_norm(x, params["output_norm"], params["output_norm_b"], eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x.astype(params["tok_embd"].dtype))
    else:
        logits = jnp.dot(x.astype(params["tok_embd"].dtype), params["tok_embd"].T)
    return logits.astype(jnp.float32), cache


def build_params_qwen2(r: GGUFReader, hp: HParams, mode: str = "auto",
                       dtype=jnp.bfloat16) -> Params:
    """rwkv6qwen2 (qrwkv): rwkv6 time-mix on a qwen2 body — RMS norms,
    swiglu FFN, GQA-sized k/v with optional biases, no bonus ("first") term,
    no post-wkv group norm (llm_build_rwkv6qwen2 + rwkv6-base is_qrwkv)."""
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    def maybe(name):
        return vec(name) if name in t else None

    def raw(name):
        return jnp.asarray(t[name].to_numpy(), dtype=jnp.float32)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        w1 = raw(p + "time_mix_w1.weight")
        rank = w1.shape[0] // 5
        layers.append({
            "attn_norm": vec(p + "attn_norm.weight"),
            "lerp_x": raw(p + "time_mix_lerp_x.weight").reshape(-1),
            "lerp_fused": raw(p + "time_mix_lerp_fused.weight").reshape(5, -1),
            "w1": w1.reshape(5, rank, hp.n_embd),
            "w2": raw(p + "time_mix_w2.weight").reshape(5, hp.n_embd, rank),
            "decay": raw(p + "time_mix_decay.weight").reshape(-1),
            "decay_w1": raw(p + "time_mix_decay_w1.weight"),
            "decay_w2": raw(p + "time_mix_decay_w2.weight"),
            "wk": linear(p + "time_mix_key.weight"),
            "bk": maybe(p + "time_mix_key.bias"),
            "wv": linear(p + "time_mix_value.weight"),
            "bv": maybe(p + "time_mix_value.bias"),
            "wr": linear(p + "time_mix_receptance.weight"),
            "br": maybe(p + "time_mix_receptance.bias"),
            "wg": linear(p + "time_mix_gate.weight"),
            "wo": linear(p + "time_mix_output.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": vec("output_norm.weight"),
        "output_norm_b": maybe("output_norm.bias"),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _gla(r, k, v, w, s0, scale):
    """ggml_gated_linear_attn: S ← S·diag(w) + k⊗v, out = (r·scale)·S_after.
    r,k,v,w: [B,T,H,D]; s0: [B,H,D,D] → (out [B,T,H,D], sT)."""
    kv = k[..., :, None] * v[..., None, :]
    a = jnp.broadcast_to(w[..., :, None], kv.shape)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    a_acc, b_acc = jax.lax.associative_scan(combine, (a, kv), axis=1)
    s_after = a_acc * s0[:, None] + b_acc
    out = jnp.einsum("bthi,bthij->bthj", r * scale, s_after)
    return out, s_after[:, -1]


def forward_qwen2(
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
    E = hp.n_embd
    D = hp.ssm_d_state  # wkv head size
    H = E // D
    Hkv = hp.n_head_kv if hp.n_head_kv else H
    eps = hp.rms_eps

    x = params["tok_embd"][tokens].astype(jnp.float32)

    new_shift = cache.shift
    new_wkv = cache.wkv
    for li, lyr in enumerate(params["layers"]):
        att_norm = rms_norm(x, lyr["attn_norm"], eps)
        att_shift = cache.shift[li, :, 0][:, None]
        x_prev = jnp.concatenate([att_shift, att_norm[:, :-1]], axis=1)

        cur = att_norm.astype(jnp.float32)
        sx = x_prev.astype(jnp.float32) - cur
        xxx = cur + sx * lyr["lerp_x"]
        five = jnp.tanh(jnp.einsum("bte,gre->btgr", xxx, lyr["w1"]))
        deltas = jnp.einsum("btgr,ger->btge", five, lyr["w2"])
        mixed = cur[:, :, None] + sx[:, :, None] * (
            deltas + lyr["lerp_fused"][None, None]
        )
        xw, xk, xv, xr, xg = [mixed[:, :, i] for i in range(5)]

        rr = lyr["wr"](xr.astype(x.dtype)).astype(jnp.float32)
        kk = lyr["wk"](xk.astype(x.dtype)).astype(jnp.float32)
        vv = lyr["wv"](xv.astype(x.dtype)).astype(jnp.float32)
        if lyr["br"] is not None:
            rr = rr + lyr["br"]
        if lyr["bk"] is not None:
            kk = kk + lyr["bk"]
        if lyr["bv"] is not None:
            vv = vv + lyr["bv"]
        g = jax.nn.sigmoid(lyr["wg"](xg.astype(x.dtype)).astype(jnp.float32))

        w = jnp.einsum(
            "btr,er->bte",
            jnp.tanh(jnp.einsum("bte,re->btr", xw, lyr["decay_w1"])),
            lyr["decay_w2"],
        ) + lyr["decay"]
        w = jnp.exp(-jnp.exp(w))

        # GQA: repeat kv heads up to the full head count
        kh = kk.reshape(B, T, Hkv, D)
        vh = vv.reshape(B, T, Hkv, D)
        if Hkv != H:
            kh = jnp.repeat(kh, H // Hkv, axis=2)
            vh = jnp.repeat(vh, H // Hkv, axis=2)
        rh = rr.reshape(B, T, H, D)
        wh = w.reshape(B, T, H, D)
        kh = kh - kh * wh  # k·(1−w): qrwkv decay-compensated keys
        out, s_last = _gla(rh, kh, vh, wh, cache.wkv[li], D ** -0.5)
        new_wkv = new_wkv.at[li].set(s_last)

        out = out.reshape(B, T, E) * g
        x = x + lyr["wo"](out.astype(x.dtype)).astype(jnp.float32)
        new_shift = new_shift.at[li, :, 0].set(att_norm[:, -1].astype(jnp.float32))

        h = rms_norm(x, lyr["ffn_norm"], eps)
        gate = lyr["w_gate"](h.astype(x.dtype))
        up = lyr["w_up"](h.astype(x.dtype))
        ffn = lyr["w_down"](
            (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
             ).astype(x.dtype)
        )
        x = x + ffn.astype(jnp.float32)

    x = rms_norm(x, params["output_norm"], eps)
    if params["output_norm_b"] is not None:
        x = x + params["output_norm_b"]
    cache = Rwkv6Cache(new_shift, new_wkv)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x.astype(params["tok_embd"].dtype))
    else:
        logits = jnp.dot(x.astype(params["tok_embd"].dtype), params["tok_embd"].T)
    return logits.astype(jnp.float32), cache
