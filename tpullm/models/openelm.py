"""OpenELM decoders (Apple, layer-wise scaled shapes).

Reference graph: llm_build_openelm (src/models/openelm.cpp). RMSNorm
pre-norms, per-layer n_head/n_head_kv (hparams arrays), fused attn_qkv laid
out [Q-heads | K-heads | V-heads]·head_dim, per-head-dim RMS q/k norms, neox
rope, SiLU-gated FFN with per-layer widths, tied output head.

The KV cache is sized for the per-layer maximum head count (same padding
scheme as deci.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.attention import attention, causal_mask
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..runtime.kvcache import KVCache
from .hparams import HParams
from .llama import Params, output_head
from .phi3 import slice_rows
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        nh, nkv = hp.n_head_l(i), hp.n_head_kv_l(i)
        hd = hp.head_dim
        qkv = t[p + "attn_qkv.weight"]
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(slice_rows(qkv, 0, nh * hd, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, nh * hd, (nh + nkv) * hd,
                                    p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, (nh + nkv) * hd, (nh + 2 * nkv) * hd,
                                    p + "attn_v.weight")),
            "q_norm": load_vector(t[p + "attn_q_norm.weight"]),
            "k_norm": load_vector(t[p + "attn_k_norm.weight"]),
            "wo": linear(t[p + "attn_output.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(t[p + "ffn_gate.weight"]),
            "w_up": linear(t[p + "ffn_up.weight"]),
            "w_down": linear(t[p + "ffn_down.weight"]),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
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
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        nh, nkv = hp.n_head_l(li), hp.n_head_kv_l(li)
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, nh, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, nkv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, nkv, hp.head_dim_v)
        q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        if nkv < hp.n_head_kv:
            pad = ((0, 0), (0, hp.n_head_kv - nkv), (0, 0), (0, 0))
            kt = jnp.pad(kt, pad)
            vt = jnp.pad(vt, pad)
        cache = cache.update(li, kt, vt, cache_offset)
        k_all, v_all = cache.kv(li)
        attn_out = attention(
            q, k_all[:, :nkv], v_all[:, :nkv], mask, scale, offsets=offsets
        )
        attn_out = layer["wo"](attn_out.reshape(B, T, nh * hp.head_dim_v))
        x = x + attn_out

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = x + ffn

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
