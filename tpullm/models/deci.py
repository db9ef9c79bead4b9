"""Deci / Nemotron-NAS decoders (DeciLM-7B, Llama-3_1-Nemotron-51B).

Reference graph: llm_build_deci (src/models/deci.cpp). The llama graph with
NAS'd per-layer shapes (hparams.n_head/n_head_kv/n_ff arrays):
- n_head == 0: attention-free layer (input passes straight to the FFN, no
  attention residual add);
- n_head > 0 and n_head_kv == 0: "linear attention" — wo applied directly
  to the normed input;
- n_ff == 0: the layer contributes nothing to the residual stream (the
  reference `continue`s before the layer output is committed).

The KV cache is sized for the per-layer maximum head count; thinner layers
zero-pad their K/V writes and slice their reads.
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
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe(name):
        return linear(name) if name in t else None

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": (load_vector(t[p + "attn_norm.weight"])
                          if p + "attn_norm.weight" in t else None),
            "wq": maybe(p + "attn_q.weight"),
            "wk": maybe(p + "attn_k.weight"),
            "wv": maybe(p + "attn_v.weight"),
            "wo": maybe(p + "attn_output.weight"),
            "ffn_norm": (load_vector(t[p + "ffn_norm.weight"])
                         if p + "ffn_norm.weight" in t else None),
            "w_gate": maybe(p + "ffn_gate.weight"),
            "w_up": maybe(p + "ffn_up.weight"),
            "w_down": maybe(p + "ffn_down.weight"),
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
    scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    for li, layer in enumerate(params["layers"]):
        n_head = hp.n_head_l(li)
        n_kv = hp.n_head_kv_l(li)
        n_ff = hp.n_ff_l(li)

        if n_head == 0:  # attention-free layer
            attn_out = None
            h = x
        else:
            h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
            if n_kv == 0:  # linear attention: wo over the normed input
                attn_out = layer["wo"](h)
            else:
                q = layer["wq"](h).reshape(B, T, n_head, hp.head_dim)
                k = layer["wk"](h).reshape(B, T, n_kv, hp.head_dim)
                v = layer["wv"](h).reshape(B, T, n_kv, hp.head_dim_v)
                q = apply_rope(q, positions, hp.rope)
                k = apply_rope(k, positions, hp.rope)
                kt = k.transpose(0, 2, 1, 3)
                vt = v.transpose(0, 2, 1, 3)
                if n_kv < hp.n_head_kv:  # zero-pad into the max-width cache
                    pad = ((0, 0), (0, hp.n_head_kv - n_kv), (0, 0), (0, 0))
                    kt = jnp.pad(kt, pad)
                    vt = jnp.pad(vt, pad)
                cache = cache.update(li, kt, vt, cache_offset)
                k_all, v_all = cache.kv(li)
                attn_out = attention(
                    q, k_all[:, :n_kv], v_all[:, :n_kv], mask, scale,
                    offsets=offsets,
                )
                attn_out = layer["wo"](
                    attn_out.reshape(B, T, n_head * hp.head_dim_v)
                )

        if n_ff == 0:
            # reference: `continue` — the layer output never reaches the
            # residual stream (deci.cpp n_ff==0 branch)
            continue

        cur = attn_out if attn_out is not None else h
        ffn_inp = cur + x if n_head > 0 else cur
        h2 = rms_norm(ffn_inp, layer["ffn_norm"], hp.rms_eps)
        gate = layer["w_gate"](h2)
        up = layer["w_up"](h2)
        ffn = layer["w_down"](
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )
        x = ffn + ffn_inp

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
