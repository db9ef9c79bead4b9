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


def route_sparsemixer(router_logits: jax.Array,
                      jitter_eps: float = 0.01) -> tuple[jax.Array, jax.Array]:
    """PhiMoE sparsemixer top-2 routing, inference path (modeling_phimoe
    sparsemixer with training=False): expert i = argmax of the (masked)
    logits; its weight = softmax over the logits that sit within a
    2·jitter_eps relative band of the max — NOT renormalized over the pair.
    The reference approximates this with softmax+renorm (phi3.cpp:109
    build_moe_ffn norm_w=true); we follow the exact HF semantics."""
    s = router_logits.astype(jnp.float32)  # [N, E]
    neg_inf = jnp.float32(-1e30)

    def one_round(scores_masked):
        m = scores_masked.max(axis=-1, keepdims=True)
        sel = jnp.argmax(scores_masked, axis=-1)
        factor = jnp.maximum(jnp.abs(s), m)
        drop = ((m - s) / factor) > (2.0 * jitter_eps)
        gates = jax.nn.softmax(jnp.where(drop, neg_inf, scores_masked), axis=-1)
        w = jnp.take_along_axis(gates, sel[:, None], axis=-1)[:, 0]
        return w, sel

    w1, sel1 = one_round(s)
    s2 = jnp.where(jax.nn.one_hot(sel1, s.shape[-1], dtype=bool), neg_inf, s)
    w2, sel2 = one_round(s2)
    weights = jnp.stack([w1, w2], axis=-1)
    idx = jnp.stack([sel1, sel2], axis=-1).astype(jnp.int32)
    return weights, idx


def moe_ffn(
    x: jax.Array,  # [N, n_embd]
    weights: jax.Array,  # [N, k] routing weights
    idx: jax.Array,  # [N, k] expert ids
    w_gate: jax.Array | None,  # [E, n_embd, n_ff]; None = gateless experts
    w_up: jax.Array,  # [E, n_embd, n_ff]
    w_down: jax.Array,  # [E, n_ff, n_embd]
    act: str = "silu",  # silu | gelu (grok) | relu | relu_sqr (nemotron-h-moe)
    weight_before_ffn: bool = False,  # llama4: scale the expert INPUT
) -> jax.Array:
    """Gated (or gateless up/down-only) expert FFN, combining the k routed
    experts per token.

    weight_before_ffn applies the routing weight to the expert input (so the
    nonlinearity sees the scaled activations) instead of the output —
    llama.cpp build_moe_ffn weight_before_ffn, set for LLM_ARCH_LLAMA4
    (llama-graph.cpp:1181)."""
    n_tokens = x.shape[0]
    if n_tokens <= _GATHER_MAX_TOKENS:
        return _moe_gather(x, weights, idx, w_gate, w_up, w_down, act,
                           weight_before_ffn)
    return _moe_dense(x, weights, idx, w_gate, w_up, w_down, act,
                      weight_before_ffn)


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


def _is_packed(w) -> bool:
    from ..models.weights import QuantExpertStack

    return isinstance(w, QuantExpertStack)


def _n_expert(w) -> int:
    return w.n_expert if _is_packed(w) else w.shape[0]


def _stack_all(x: jax.Array, w) -> jax.Array:
    """All-experts matmul: x [M, K] (shared) or [E, M, K] (per-expert) →
    [E, M, F]. Packed stacks stream through the Pallas stack kernel
    (weights never widen); dense bf16 stacks ride einsum."""
    if _is_packed(w):
        from . import qmatmul

        return qmatmul.stack_matmul(x, w)
    if x.ndim == 3:
        return jnp.einsum("xne,xef->xnf", x, w)
    return jnp.einsum("ne,xef->xnf", x, w)


def _rows_gather(x: jax.Array, ids: jax.Array, w) -> jax.Array:
    """Per-row expert-indexed matmul: row t of x [T, K] through expert
    ids[t] → [T, F]. Packed stacks read only the routed experts' packed
    bytes (≡ mmid.cu); dense stacks gather bf16 slices."""
    if _is_packed(w):
        from . import qmatmul

        return qmatmul.gather_matmul(x, ids, w)
    return jnp.einsum("tk,tkf->tf", x, w[ids])


def _moe_gather(x, weights, idx, w_gate, w_up, w_down, act="silu",
                weight_before_ffn=False):
    """Decode regime: gather the k routed experts' weights per token —
    reads k/E of the expert bytes from HBM (packed bytes when the stack is
    a QuantExpertStack)."""
    N, k = idx.shape
    ids = idx.reshape(N * k)
    if weight_before_ffn:
        xk = (x[:, None, :] * weights[..., None].astype(x.dtype)
              ).reshape(N * k, -1)
    else:
        xk = jnp.broadcast_to(
            x[:, None, :], (N, k, x.shape[-1])).reshape(N * k, -1)
    up = _rows_gather(xk, ids, w_up)
    gate = _rows_gather(xk, ids, w_gate) if w_gate is not None else None
    mid = _glu(gate, up, act)
    out = _rows_gather(mid, ids, w_down).reshape(N, k, -1)
    if weight_before_ffn:
        return jnp.sum(out.astype(jnp.float32), axis=1).astype(x.dtype)
    return jnp.einsum("nke,nk->ne", out.astype(jnp.float32),
                      weights.astype(jnp.float32)).astype(x.dtype)


def _moe_dense(x, weights, idx, w_gate, w_up, w_down, act="silu",
               weight_before_ffn=False):
    """Prefill regime: every expert computes every token on the MXU, then the
    routing weights (zero for unselected experts) combine them."""
    E = _n_expert(w_up)
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [N, k, E]
    dense_w = jnp.einsum("nkx,nk->nx", onehot, weights.astype(jnp.float32))
    if weight_before_ffn:
        # per-(expert, token) scaled inputs: nonlinearity sees w·x
        xs = x[None, :, :] * dense_w.T[:, :, None].astype(x.dtype)  # [E,N,e]
        up = _stack_all(xs, w_up)
        gate = _stack_all(xs, w_gate) if w_gate is not None else None
        mid = _glu(gate, up, act)
        out = _stack_all(mid, w_down)  # [E, N, n_embd]
        sel = (dense_w.T != 0.0)[:, :, None]  # combine selected experts only
        return jnp.sum(jnp.where(sel, out.astype(jnp.float32), 0.0),
                       axis=0).astype(x.dtype)
    up = _stack_all(x, w_up)  # [E, N, F]
    gate = _stack_all(x, w_gate) if w_gate is not None else None
    mid = _glu(gate, up, act)
    out = _stack_all(mid, w_down)  # [E, N, n_embd]
    # dense per-(token, expert) weight matrix from the top-k selection
    return jnp.einsum("xne,nx->ne", out.astype(jnp.float32),
                      dense_w).astype(x.dtype)
