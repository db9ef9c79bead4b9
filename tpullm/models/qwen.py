"""Qwen (v1) decoder.

Reference graph: llm_build_qwen (src/models/qwen.cpp) — exactly the llama
graph except q/k/v live in one fused attn_qkv tensor with a fused bias
(views at offsets 0 / n_embd / 2·n_embd; Qwen v1 is MHA so the three spans
are equal). We split the packed weight by rows at load (rows are
independently quantized, so the split is exact) and reuse llama.forward.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from .hparams import HParams
from .llama import Params
from .phi3 import slice_rows
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(info):
        return load_linear(info, mode=mode, dtype=dtype)

    n_q = hp.n_head * hp.head_dim
    n_kv = hp.n_head_kv * hp.head_dim
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        qkv = t[p + "attn_qkv.weight"]
        bqkv = t[p + "attn_qkv.bias"].to_numpy()
        layers.append({
            "attn_norm": load_vector(t[p + "attn_norm.weight"]),
            "wq": linear(slice_rows(qkv, 0, n_q, p + "attn_q.weight")),
            "wk": linear(slice_rows(qkv, n_q, n_q + n_kv, p + "attn_k.weight")),
            "wv": linear(slice_rows(qkv, n_q + n_kv, n_q + 2 * n_kv,
                                    p + "attn_v.weight")),
            "bq": jnp.asarray(bqkv[:n_q], jnp.float32),
            "bk": jnp.asarray(bqkv[n_q:n_q + n_kv], jnp.float32),
            "bv": jnp.asarray(bqkv[n_q + n_kv:n_q + 2 * n_kv], jnp.float32),
            "wo": linear(t[p + "attn_output.weight"]),
            "ffn_norm": load_vector(t[p + "ffn_norm.weight"]),
            "w_gate": linear(t[p + "ffn_gate.weight"]),
            "w_up": linear(t[p + "ffn_up.weight"]),
            "w_down": linear(t[p + "ffn_down.weight"]),
            "q_norm": None,
            "k_norm": None,
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear(t["output.weight"]) if "output.weight" in t else None,
    }
