"""OLMo-2 decoder (reference graph: llm_build_olmo2, src/models/olmo2.cpp).

Distinctives vs llama: NO pre-norms — RMSNorm is applied to the attention and
FFN OUTPUTS before the residual add (post-norm), q/k RMSNorm over the full
projection (not per head), neox rope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, attention_cached, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "wq": linear(p + "attn_q.weight"),
            "wk": linear(p + "attn_k.weight"),
            "wv": linear(p + "attn_v.weight"),
            "wo": linear(p + "attn_output.weight"),
            "q_norm": load_vector(t[p + "attn_q_norm.weight"]),
            "k_norm": load_vector(t[p + "attn_k_norm.weight"]),
            "attn_post_norm": load_vector(t[p + "post_attention_norm.weight"]),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
            "ffn_post_norm": load_vector(t[p + "post_ffw_norm.weight"]),
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
    x = params["tok_embd"][tokens]
    scale = hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, 0)
    # exaone4 iSWA: most layers are sliding-window + rope, every
    # swa_pattern-th layer is full-attention WITHOUT rope
    # (llm_build_exaone4 use_rope = is_swa(il)); olmo3 ships an explicit
    # per-layer bool pattern and ropes every layer (ref convert
    # Olmo3ForCausalLM → OLMO2 arch + sliding_window_pattern)
    use_swa_layers = hp.sliding_window > 0 and (
        hp.arch == "exaone4" or hp.swa_layers is not None)
    mask_swa = (
        causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)
        if use_swa_layers else None
    )

    for li, layer in enumerate(params["layers"]):
        is_swa = hp.is_swa(li) if use_swa_layers else False
        use_rope = (hp.arch != "exaone4") or (not use_swa_layers) or is_swa
        mask_l = mask_swa if is_swa else mask
        window_l = hp.sliding_window if is_swa else 0
        # attention on the RAW residual stream (no pre-norm); olmo2 norms
        # the FULL projection, exaone4 norms per head (weight = head_dim)
        qf = layer["wq"](x)
        kf = layer["wk"](x)
        v = layer["wv"](x)
        if layer["q_norm"].shape[-1] == qf.shape[-1]:
            q = rms_norm(qf, layer["q_norm"], hp.rms_eps).reshape(
                B, T, hp.n_head, hp.head_dim)
            k = rms_norm(kf, layer["k_norm"], hp.rms_eps).reshape(
                B, T, hp.n_head_kv, hp.head_dim)
        else:
            q = rms_norm(qf.reshape(B, T, hp.n_head, hp.head_dim),
                         layer["q_norm"], hp.rms_eps)
            k = rms_norm(kf.reshape(B, T, hp.n_head_kv, hp.head_dim),
                         layer["k_norm"], hp.rms_eps)
        v = v.reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if use_rope:
            q = apply_rope(q, positions, hp.rope)
            k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask_l, scale, offsets=offsets,
                             sliding_window=window_l)
        attn_out = layer["wo"](attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))
        x = x + rms_norm(attn_out, layer["attn_post_norm"], hp.rms_eps)

        gate = layer["w_gate"](x)
        up = layer["w_up"](x)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = x + rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
