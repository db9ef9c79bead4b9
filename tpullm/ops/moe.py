"""Mixture-of-experts routed FFN.

Reference: llm_graph_context::build_moe_ffn (src/llama-graph.cpp:785-960) +
the CUDA MUL_MAT_ID / topk-moe kernels (ggml-cuda/mmid.cu, topk-moe.cu).

TPU-first design — two execution regimes instead of an expert-indexed GEMM
kernel:
  * few tokens (decode): gather the k selected experts' weights from HBM and
    batch the per-token GEMVs — reads only k/E of the expert bytes, which is
    the decode bandwidth optimum (≡ MMVQ's role).
  * many tokens (prefill): run ALL experts as one big batched einsum on the
    MXU and combine with the routing weights. When B*T >> E every expert's
    weights are touched anyway, so streaming them once through dense matmuls
    beats scatter/gather bookkeeping under XLA's static shapes.
The switch is static (trace-time) on the token count, so each jitted program
contains exactly one regime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# tokens-per-program at or below which the gather path is used
_GATHER_MAX_TOKENS = 16


def route(
    router_logits: jax.Array,  # [N, n_expert] f32
    n_expert_used: int,
    gating: str = "softmax",  # softmax | sigmoid
    norm_weights: bool = False,
    scale: float = 1.0,
    select_bias: jax.Array | None = None,  # [n_expert] added for SELECTION only
) -> tuple[jax.Array, jax.Array]:
    """Top-k expert routing (≡ fused topk-moe.cu: softmax → top-k → renorm).

    select_bias (deepseek-v3 exp_probs_b): experts are RANKED by probs+bias
    but weighted by the unbiased probs (llama-graph.cpp build_moe_ffn).
    Returns (weights [N, k] f32, idx [N, k] int32).
    """
    if gating == "sigmoid":
        probs = jax.nn.sigmoid(router_logits)
    else:
        probs = jax.nn.softmax(router_logits, axis=-1)
    if select_bias is not None:
        _, idx = jax.lax.top_k(probs + select_bias[None, :], n_expert_used)
        weights = jnp.take_along_axis(probs, idx, axis=-1)
    else:
        weights, idx = jax.lax.top_k(probs, n_expert_used)
    if norm_weights:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    if scale != 1.0:
        weights = weights * scale
    return weights, idx.astype(jnp.int32)


def moe_ffn(
    x: jax.Array,  # [N, n_embd]
    weights: jax.Array,  # [N, k] routing weights
    idx: jax.Array,  # [N, k] expert ids
    w_gate: jax.Array | None,  # [E, n_embd, n_ff]; None = gateless experts
    w_up: jax.Array,  # [E, n_embd, n_ff]
    w_down: jax.Array,  # [E, n_ff, n_embd]
    act: str = "silu",  # silu | gelu (grok) | relu | relu_sqr (nemotron-h-moe)
) -> jax.Array:
    """Gated (or gateless up/down-only) expert FFN, combining the k routed
    experts per token."""
    n_tokens = x.shape[0]
    if n_tokens <= _GATHER_MAX_TOKENS:
        return _moe_gather(x, weights, idx, w_gate, w_up, w_down, act)
    return _moe_dense(x, weights, idx, w_gate, w_up, w_down, act)


def _glu(gate: jax.Array | None, up: jax.Array, act: str) -> jax.Array:
    if gate is None:  # gateless experts: activation applied to up directly
        uf = up.astype(jnp.float32)
        if act == "relu_sqr":  # nemotron-h-moe ReLU²
            return jnp.square(jax.nn.relu(uf)).astype(up.dtype)
        if act == "gelu":
            return jax.nn.gelu(uf, approximate=True).astype(up.dtype)
        return jax.nn.relu(uf).astype(up.dtype)
    gf = gate.astype(jnp.float32)
    if act == "gelu":
        a = jax.nn.gelu(gf, approximate=False)
    elif act == "relu":  # smallthinker
        a = jax.nn.relu(gf)
    else:
        a = jax.nn.silu(gf)
    return a.astype(up.dtype) * up


def _swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return _glu(gate, up, "silu")


def _moe_gather(x, weights, idx, w_gate, w_up, w_down, act="silu"):
    """Decode regime: gather k experts' weights per token."""
    # [N, k, n_embd, n_ff] weight gathers ride XLA's dynamic-gather; with
    # N*k small this is k expert-reads from HBM
    wu = w_up[idx]
    wd = w_down[idx]  # [N, k, F, E_in]
    up = jnp.einsum("ne,nkef->nkf", x, wu)
    gate = (jnp.einsum("ne,nkef->nkf", x, w_gate[idx])
            if w_gate is not None else None)
    mid = _glu(gate, up, act)
    out = jnp.einsum("nkf,nkfe->nke", mid, wd)
    return jnp.einsum("nke,nk->ne", out.astype(jnp.float32),
                      weights.astype(jnp.float32)).astype(x.dtype)


def _moe_dense(x, weights, idx, w_gate, w_up, w_down, act="silu"):
    """Prefill regime: every expert computes every token on the MXU, then the
    routing weights (zero for unselected experts) combine them."""
    E = w_up.shape[0]
    up = jnp.einsum("ne,xef->xnf", x, w_up)  # [E, N, F]
    gate = (jnp.einsum("ne,xef->xnf", x, w_gate)
            if w_gate is not None else None)
    mid = _glu(gate, up, act)
    out = jnp.einsum("xnf,xfe->xne", mid, w_down)  # [E, N, n_embd]
    # dense per-(token, expert) weight matrix from the top-k selection
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [N, k, E]
    dense_w = jnp.einsum("nkx,nk->nx", onehot, weights.astype(jnp.float32))
    return jnp.einsum("xne,nx->ne", out.astype(jnp.float32),
                      dense_w).astype(x.dtype)
