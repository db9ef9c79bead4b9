"""CogVLM text decoder (visual-expert dual weights).

Reference graph: llm_build_cogvlm (src/models/cogvlm.cpp): fused-qkv llama
body (full-head neox rope, swiglu FFN) with a PARALLEL set of visual-expert
weights (blk.N.vis_attn_qkv / vis_attn_output / vis_gate / vis_up /
vis_down) selected per ubatch — text tokens use the text weights, image
embedding inputs use the visual-expert weights. The switch here is
trace-time on the input dtype (int tokens = text, float embeddings =
image), mirroring `ubatch.token`.
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
from .phi3 import slice_rows
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def split_qkv(name, prefix):
        qkv = t[name]
        n_q = hp.n_head * hp.head_dim
        n_kv = hp.n_head_kv * hp.head_dim
        return (
            load_linear(slice_rows(qkv, 0, n_q, prefix + "q"), mode=mode, dtype=dtype),
            load_linear(slice_rows(qkv, n_q, n_q + n_kv, prefix + "k"),
                        mode=mode, dtype=dtype),
            load_linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv, prefix + "v"),
                        mode=mode, dtype=dtype),
        )

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        wq, wk, wv = split_qkv(p + "attn_qkv.weight", p + "t")
        layer = {
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": wq, "wk": wk, "wv": wv,
            "wo": linear(p + "attn_output.weight"),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(p + "ffn_gate.weight"),
            "w_up": linear(p + "ffn_up.weight"),
            "w_down": linear(p + "ffn_down.weight"),
        }
        if p + "vis_attn_qkv.weight" in t:
            vq, vk, vv = split_qkv(p + "vis_attn_qkv.weight", p + "v")
            layer.update({
                "vis_wq": vq, "vis_wk": vk, "vis_wv": vv,
                "vis_wo": linear(p + "vis_attn_output.weight"),
                "vis_gate": linear(p + "vis_gate.weight"),
                "vis_up": linear(p + "vis_up.weight"),
                "vis_down": linear(p + "vis_down.weight"),
            })
        layers.append(layer)

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
    # text tokens vs precomputed image embeddings (≡ ubatch.token check)
    is_text = jnp.issubdtype(tokens.dtype, jnp.integer)
    if is_text:
        B, T = tokens.shape
        x = params["tok_embd"][tokens]
    else:
        B, T = tokens.shape[:2]
        x = tokens.astype(params["tok_embd"].dtype)
    scale = hp.head_dim ** -0.5

    offsets = jnp.broadcast_to(
        jnp.asarray(cache_offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(cache_offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len)

    def pick(layer, text_key, vis_key):
        if is_text or vis_key not in layer:
            return layer[text_key]
        return layer[vis_key]

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = pick(layer, "wq", "vis_wq")(h).reshape(B, T, hp.n_head, hp.head_dim)
        k = pick(layer, "wk", "vis_wk")(h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = pick(layer, "wv", "vis_wv")(h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), cache_offset
        )
        attn_out = attention_cached(
            q, cache, li, mask, scale, offsets=offsets)
        x = x + pick(layer, "wo", "vis_wo")(
            attn_out.reshape(B, T, hp.n_head * hp.head_dim_v))

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = pick(layer, "w_gate", "vis_gate")(h)
        up = pick(layer, "w_up", "vis_up")(h)
        x = x + pick(layer, "w_down", "vis_down")(
            jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        )

    if return_hidden:
        return rms_norm(x, params["output_norm"], hp.rms_eps).astype(jnp.float32), cache
    return output_head(hp, params, x), cache
