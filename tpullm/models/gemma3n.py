"""Gemma-3n decoder (AltUp + Laurel + per-layer embeddings + KV sharing).

Reference graph: llm_build_gemma3n_iswa (src/models/gemma3n-iswa.cpp).
Hidden state is a STACK of n_altup copies [A, B, T, E]; each layer:
  predictions = altup_predict(X)            (router-mixed altup blend)
  active → attn (per-head q/k norms + WEIGHTLESS v norm, per-layer rope
  base, iSWA; trailing "shared-KV" layers reuse the cache of the last
  swa/full layer) and laurel (low-rank residual), combined /√2
  → gelu FFN with gaussian-top-k activation sparsity on the first 10
  layers (std multiplier 1.6448533535003662, models.h:198)
  → altup_correct + per-layer-embedding injection into slices 1..A-1.
Final: altups merged by magnitude-matched unembedding, mean, softcapped
logits. Attention scale is 1.0 (queries are normalized).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, causal_mask
from ..ops.norms import rms_norm
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params
from .weights import load_embedding, load_linear, load_vector

N_LAYER_SPARSITY = 10  # models.h:198
SPARSITY_STD_MUL = 1.6448533535003662  # icdf(0.95)


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name):
        return load_vector(t[name])

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layer = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "attn_post_norm": vec(p + "post_attention_norm.weight"),
            "wq": linear(p + "attn_q.weight"),
            "wo": linear(p + "attn_output.weight"),
            "q_norm": vec(p + "attn_q_norm.weight"),
            "k_norm": vec(p + "attn_k_norm.weight"),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
            "ffn_post_norm": vec(p + "post_ffw_norm.weight"),
            "inp_gate": linear(p + "inp_gate.weight"),
            "pl_proj": linear(p + "proj.weight"),
            "pl_post_norm": vec(p + "post_norm.weight"),
            "altup_correct_coef": linear(p + "altup_correct_coef.weight"),
            "altup_correct_scale": vec(p + "altup_correct_scale.weight"),
            "altup_predict_coef": linear(p + "altup_predict_coef.weight"),
            "altup_router": linear(p + "altup_router.weight"),
            "altup_router_norm": vec(p + "altup_router_norm.weight"),
            "laurel_l": linear(p + "laurel_l.weight"),
            "laurel_r": linear(p + "laurel_r.weight"),
            "laurel_post_norm": vec(p + "laurel_post_norm.weight"),
        }
        if p + "attn_k.weight" in t:  # shared-KV layers carry no k/v
            layer["wk"] = linear(p + "attn_k.weight")
            layer["wv"] = linear(p + "attn_v.weight")
        layers.append(layer)

    # altup_proj / altup_unembd_proj: ggml ne {n_embd, n_embd, n_altup-1}
    # → numpy (n_altup-1, n_embd_out, n_embd_in)
    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "tok_embd_per_layer": load_embedding(
            t["per_layer_token_embd.weight"], dtype=dtype),
        "altup_proj": jnp.asarray(t["altup_proj.weight"].to_numpy(), dtype),
        "altup_unembd_proj": jnp.asarray(
            t["altup_unembd_proj.weight"].to_numpy(), dtype),
        "per_layer_model_proj": linear("per_layer_model_proj.weight"),
        "per_layer_proj_norm": vec("per_layer_proj_norm.weight"),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _magnitude(x):
    return jnp.sqrt(jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))


def _router_modalities(hp, layer, x):
    h = rms_norm(x, layer["altup_router_norm"], hp.rms_eps)
    h = h * (1.0 / hp.n_embd)
    return jnp.tanh(layer["altup_router"](h).astype(jnp.float32))  # [B,T,A]


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
    A = hp.n_altup
    act = hp.i_altup_act
    E = hp.n_embd
    pl = hp.n_embd_altup
    L = hp.n_layer
    kv_from_start = L - hp.n_kv_shared if hp.n_kv_shared else L
    scale = hp.attn_scale if hp.attn_scale is not None else 1.0
    eps = hp.rms_eps

    emb = params["tok_embd"][tokens] * jnp.asarray(
        float(np.sqrt(E)), params["tok_embd"].dtype)

    # per-layer inputs [L, B, T, pl] (project_per_layer_inputs)
    plm = params["per_layer_model_proj"](emb).astype(jnp.float32)  # [B,T,pl*L]
    plm = plm * (E ** -0.5)
    plm = plm.reshape(B, T, L, pl)
    plm = rms_norm(plm, params["per_layer_proj_norm"], eps)
    tok_pl = params["tok_embd_per_layer"][tokens].astype(jnp.float32)
    tok_pl = tok_pl.reshape(B, T, L, pl) * float(np.sqrt(pl))
    inp_per_layer = ((plm + tok_pl) * (2.0 ** -0.5)).transpose(2, 0, 1, 3)

    # stack altups: [A, B, T, E]
    emb_f = emb.astype(jnp.float32)
    target_mag = _magnitude(emb_f)  # [B,T,1]
    # altup_proj numpy (A-1, E_out, E_in): added_i = emb @ proj_i^T
    added = jnp.einsum("bte,aoe->abto", emb_f,
                       params["altup_proj"].astype(jnp.float32))
    added = added * target_mag[None] / jnp.maximum(_magnitude(added), 1e-30)
    x = jnp.concatenate([emb_f[None], added], axis=0)  # [A,B,T,E]

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask_full = causal_mask(positions, cache.max_len, kv_len, 0)
    mask_swa = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)
    rope_global = hp.rope
    rope_swa = (replace(hp.rope, freq_base=hp.rope_freq_base_swa)
                if hp.rope_freq_base_swa > 0 else hp.rope)

    # KV layer a shared layer reuses: last swa / full layer before the share
    # boundary (llama-model.cpp gemma3n layer_reuse_cb)
    def kv_layer(li):
        if li < kv_from_start:
            return li
        return kv_from_start - (2 if hp.is_swa(li) else 1)

    for li, layer in enumerate(params["layers"]):
        swa = hp.is_swa(li)
        rope = rope_swa if swa else rope_global
        mask = mask_swa if swa else mask_full

        # altup predict
        mod = _router_modalities(hp, layer, x[act])  # [B,T,A]
        coefs = layer["altup_predict_coef"](mod.astype(x.dtype)).astype(
            jnp.float32).reshape(B, T, A, A)  # [B,T,j,i]
        predictions = jnp.einsum("btji,ibte->jbte", coefs, x) + x

        active = predictions[act]  # [B,T,E]
        h = rms_norm(active, layer["attn_norm"], eps)

        # laurel
        lau = layer["laurel_r"](layer["laurel_l"](h.astype(emb.dtype)))
        lau = rms_norm(lau, layer["laurel_post_norm"], eps) + h

        # attention (shared-KV layers project only q)
        hq = h.astype(emb.dtype)
        q = layer["wq"](hq).reshape(B, T, hp.n_head, hp.head_dim)
        q = rms_norm(q, layer["q_norm"], eps)
        q = apply_rope_f32(q, positions, rope)
        if "wk" in layer:
            k = layer["wk"](hq).reshape(B, T, hp.n_head_kv, hp.head_dim)
            v = layer["wv"](hq).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
            k = rms_norm(k, layer["k_norm"], eps)
            # weightless v RMS norm (ggml_rms_norm on Vcur)
            vf = v.astype(jnp.float32)
            v = vf * jax.lax.rsqrt(
                jnp.mean(vf * vf, axis=-1, keepdims=True) + eps)
            k = apply_rope_f32(k, positions, rope)
            cache = cache.update(
                li, k.transpose(0, 2, 1, 3).astype(emb.dtype),
                v.transpose(0, 2, 1, 3).astype(emb.dtype), cache_offset)
        k_all, v_all = cache.kv(kv_layer(li))
        attn_out = attention(
            q.astype(emb.dtype), k_all, v_all, mask, scale,
            offsets=offsets, sliding_window=hp.sliding_window if swa else 0,
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        attn_out = rms_norm(attn_out, layer["attn_post_norm"], eps)
        attn_out = attn_out.astype(jnp.float32) + active

        attn_laurel = (attn_out + lau.astype(jnp.float32)) * (2.0 ** -0.5)

        # gelu FFN with gaussian-top-k sparsity on early layers
        hf = rms_norm(attn_laurel, layer["ffn_norm"], eps)
        gate = layer["w_gate"](hf.astype(emb.dtype)).astype(jnp.float32)
        up = layer["w_up"](hf.astype(emb.dtype)).astype(jnp.float32)
        if hp.sparsity_scale is not None:  # converter-provided per-layer
            std_mul = hp.sparsity_scale[li] if li < len(hp.sparsity_scale) else 0.0
        else:  # llama.cpp defaults (models.h:198)
            std_mul = SPARSITY_STD_MUL if li < N_LAYER_SPARSITY else 0.0
        if std_mul > 0.0:
            mean = gate.mean(axis=-1, keepdims=True)
            std = jnp.sqrt(
                jnp.sum(jnp.square(gate - mean), axis=-1, keepdims=True)
                / (gate.shape[-1] - 1))
            gate = jax.nn.relu(gate - (mean + std_mul * std))
        ffn = layer["w_down"](
            (jax.nn.gelu(gate, approximate=True) * up).astype(emb.dtype))
        ffn = rms_norm(ffn, layer["ffn_post_norm"], eps).astype(jnp.float32)
        gated = ffn + attn_laurel  # attn_ffw_laurel_gated

        # altup correct
        mod2 = _router_modalities(hp, layer, gated)
        ccoef = layer["altup_correct_coef"](mod2.astype(emb.dtype)).astype(
            jnp.float32) + 1.0  # [B,T,A]
        innovation = gated - predictions[act]
        corrected = predictions + innovation[None] * ccoef.transpose(2, 0, 1)[
            :, :, :, None]

        # per-layer embedding injection into slices 1..A-1
        fp = corrected[act] * layer["altup_correct_scale"]
        fp = jax.nn.gelu(
            layer["inp_gate"](fp.astype(emb.dtype)).astype(jnp.float32),
            approximate=True)
        fp = fp * inp_per_layer[li]
        fp = layer["pl_proj"](fp.astype(emb.dtype))
        fp = rms_norm(fp, layer["pl_post_norm"], eps).astype(jnp.float32)
        x = jnp.concatenate([corrected[:1], corrected[1:] + fp[None]], axis=0)

    # merge altups (magnitude-matched unembedding + mean)
    target_mag = _magnitude(x[act])
    unembd = jnp.einsum("abte,aoe->abto", x[1:],
                        params["altup_unembd_proj"].astype(jnp.float32))
    unembd = unembd * target_mag[None] / jnp.maximum(_magnitude(unembd), 1e-30)
    merged = (x[0] + unembd.sum(axis=0)) / A

    merged = rms_norm(merged, params["output_norm"], eps)
    if return_hidden:
        return merged.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](merged.astype(emb.dtype))
    else:
        logits = jnp.dot(merged.astype(emb.dtype), params["tok_embd"].T)
    logits = logits.astype(jnp.float32)
    if hp.softcap_final:
        logits = jnp.tanh(logits / hp.softcap_final) * hp.softcap_final
    return logits, cache


def apply_rope_f32(x, positions, rope):
    from ..ops.rope import apply_rope

    return apply_rope(x.astype(jnp.float32), positions, rope)
