"""Phi-3 decoder (reference graph: llm_build_phi3, src/models/phi3.cpp).

Phi-3 is llama-graph-identical once its fused projections are split:
  blk.N.attn_qkv.weight  [n_embd+2·n_embd_gqa, n_embd] → wq | wk | wv
  blk.N.ffn_up.weight    [2·n_ff, n_embd]              → gate | up
(ggml splits them with views inside the graph — ggml_swiglu's first half is
the gate; here the split happens once at load. Packed quant rows are
self-contained blocks, so row-slicing packed payloads is free.)
Partial rotary (n_rot < head_dim) and SWA come through hparams/rope as usual.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace

import jax.numpy as jnp

from ..gguf.constants import TYPE_TRAITS
from ..gguf.reader import GGUFReader, GGUFTensorInfo
from .hparams import HParams
from .llama import Params, forward as llama_forward  # noqa: F401 (registered with llama.forward)
from .weights import load_embedding, load_linear, load_vector


def slice_rows(info: GGUFTensorInfo, start: int, end: int, name: str) -> GGUFTensorInfo:
    """Row-slice a packed 2-D weight (logical rows = output features)."""
    n_in = info.shape[0]
    tt = TYPE_TRAITS[info.ggml_type]
    row_bytes = n_in // tt.block_size * tt.type_size
    return GGUFTensorInfo(
        name=name,
        ggml_type=info.ggml_type,
        shape=(n_in, end - start),
        offset=0,
        data=info.data[start * row_bytes : end * row_bytes],
    )


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    def maybe_vector(name):
        return load_vector(t[name]) if name in t else None

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
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv, p + "attn_v.weight")),
            "wo": linear(t[p + "attn_output.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(slice_rows(up, 0, n_ff, p + "ffn_gate.weight")),
            "w_up": linear(slice_rows(up, n_ff, 2 * n_ff, p + "ffn_up.weight")),
            "w_down": linear(t[p + "ffn_down.weight"]),
            "bq": None, "bk": None, "bv": None,
            "q_norm": maybe_vector(p + "attn_q_norm.weight"),
            "k_norm": maybe_vector(p + "attn_k_norm.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
    }
