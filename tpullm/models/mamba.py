"""Mamba (S6 selective state-space) decoder.

Reference graph: llm_graph_context_mamba::build_mamba_layer
(src/models/graph-context-mamba.cpp) over llama_memory_recurrent state slots;
ggml ops SSM_CONV + SSM_SCAN (ggml.h).

TPU-first re-design: the sequential selective scan becomes a
`jax.lax.associative_scan` over (decay, drive) pairs —
  h_t = a_t ⊙ h_{t-1} + b_t,  a_t = exp(Δ_t A),  b_t = Δ_t B_t x_t
which the combine (a₁a₂, a₂b₁ + b₂) evaluates in O(log T) depth on the VPU
instead of a length-T dependency chain. The depthwise causal conv runs as a
k-tap shifted sum seeded from the cached (d_conv−1)-sample tail.

Recurrent models take exact-length (unpadded) prefills: trailing pad tokens
would pollute the carried state (the engine disables prompt bucketing via
ArchSpec.recurrent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.norms import rms_norm
from ..runtime.recurrent import RecurrentCache
from .hparams import HParams
from .llama import Params
from .weights import load_embedding, load_linear, load_vector


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name, d=jnp.float32):
        return load_vector(t[name], dtype=d)

    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": vec(p + "attn_norm.weight"),
            "ssm_in": linear(p + "ssm_in.weight"),  # [E] -> [2*d_inner]
            # conv kernel logical (d_inner, d_conv)
            "conv_w": jnp.asarray(
                t[p + "ssm_conv1d.weight"].to_numpy(), dtype=jnp.float32
            ).reshape(hp.ssm_d_inner, hp.ssm_d_conv),
            "conv_b": vec(p + "ssm_conv1d.bias"),
            "ssm_x": linear(p + "ssm_x.weight"),  # [d_inner] -> [dt_rank+2*d_state]
            "ssm_dt": linear(p + "ssm_dt.weight"),  # [dt_rank] -> [d_inner]
            "dt_bias": vec(p + "ssm_dt.bias"),
            "A_log": jnp.asarray(
                t[p + "ssm_a.weight" if p + "ssm_a.weight" in t else p + "ssm_a"]
                .to_numpy(), dtype=jnp.float32
            ).reshape(hp.ssm_d_inner, hp.ssm_d_state),
            "D": vec(p + "ssm_d.weight" if p + "ssm_d.weight" in t else p + "ssm_d"),
            "ssm_out": linear(p + "ssm_out.weight"),  # [d_inner] -> [E]
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _causal_conv(x, conv_state, w, b):
    """Depthwise causal conv: x [B,T,D], state [B,D,K-1], w [D,K] →
    (y [B,T,D], new_state [B,D,K-1])."""
    B, T, D = x.shape
    K = w.shape[1]
    xt = x.astype(jnp.float32).transpose(0, 2, 1)  # [B, D, T]
    full = jnp.concatenate([conv_state.astype(jnp.float32), xt], axis=2)  # [B,D,K-1+T]
    y = jnp.zeros((B, D, T), jnp.float32)
    for k in range(K):  # k-tap shifted sum (K is 4; unrolled at trace time)
        y = y + full[:, :, k : k + T] * w[:, k][None, :, None]
    y = y + b.astype(jnp.float32)[None, :, None]
    new_state = full[:, :, T:]  # last K-1 samples
    return y.transpose(0, 2, 1), new_state


def _selective_scan(x, dt, A, Bm, Cm, h0):
    """S6 scan. x,dt [B,T,D]; A [D,S]; Bm,Cm [B,T,S]; h0 [B,D,S].
    Returns (y [B,T,D], hT [B,D,S])."""
    a = jnp.exp(dt[..., None] * A[None, None])  # [B,T,D,S]
    b = (dt * x)[..., None] * Bm[:, :, None, :]  # [B,T,D,S]

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    a_acc, b_acc = jax.lax.associative_scan(combine, (a, b), axis=1)
    h = a_acc * h0[:, None] + b_acc  # [B,T,D,S]
    y = jnp.einsum("btds,bts->btd", h, Cm)
    return y, h[:, -1]


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,  # unused (no positional encoding)
    cache: RecurrentCache,
    cache_offset,  # unused (state is carried, not indexed)
    return_hidden: bool = False,
) -> tuple[jax.Array, RecurrentCache]:
    B, T = tokens.shape
    D = hp.ssm_d_inner
    R = hp.ssm_dt_rank
    S = hp.ssm_d_state
    x = params["tok_embd"][tokens]

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        xz = layer["ssm_in"](h).astype(jnp.float32)  # [B,T,2D]
        xin, z = xz[..., :D], xz[..., D:]

        conv_out, conv_state = _causal_conv(
            xin, cache.conv[li], layer["conv_w"], layer["conv_b"]
        )
        xc = jax.nn.silu(conv_out)  # [B,T,D]

        x_db = layer["ssm_x"](xc.astype(x.dtype)).astype(jnp.float32)
        dt_raw = x_db[..., :R]
        Bm = x_db[..., R : R + S]
        Cm = x_db[..., R + S :]
        if hp.ssm_dt_b_c_rms:
            # falcon-mamba: weightless RMS on dt/B/C
            # (graph-context-mamba.cpp:94 ssm_dt_b_c_rms branch)
            def _wrms(v):
                return v * jax.lax.rsqrt(
                    (v * v).mean(-1, keepdims=True) + hp.rms_eps)

            dt_raw, Bm, Cm = _wrms(dt_raw), _wrms(Bm), _wrms(Cm)
        dt = jax.nn.softplus(
            layer["ssm_dt"](dt_raw.astype(x.dtype)).astype(jnp.float32)
            + layer["dt_bias"]
        )  # [B,T,D]
        A = layer["A_log"]  # stored as -exp(A_log) by the converter

        y, ssm_state = _selective_scan(xc, dt, A, Bm, Cm, cache.ssm[li])
        y = y + xc * layer["D"][None, None]
        y = y * jax.nn.silu(z)
        cache = cache.update(li, conv_state, ssm_state)
        x = x + layer["ssm_out"](y.astype(x.dtype))

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache


# ---------------------------------------------------------------------------
# Mamba-2 (SSD): llm_graph_context_mamba::build_mamba2_layer
# (src/models/graph-context-mamba.cpp:146). One fused ssm_in projection
# produces [z | xBC | dt]; the causal conv runs over the concatenated xBC
# stream; A decays are per-head scalars; B/C are shared per group.
# ---------------------------------------------------------------------------


def build_params2(r: GGUFReader, hp: HParams, mode: str = "auto",
                  dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def vec(name, d=jnp.float32):
        return load_vector(t[name], dtype=d)

    conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
    layers = []
    for i in range(hp.n_layer):
        p = f"blk.{i}."
        layers.append({
            "attn_norm": vec(p + "attn_norm.weight"),
            "ssm_in": linear(p + "ssm_in.weight"),  # [E]->[2*d_inner+2GS+H]
            "conv_w": jnp.asarray(
                t[p + "ssm_conv1d.weight"].to_numpy(), dtype=jnp.float32
            ).reshape(conv_w, hp.ssm_d_conv),
            "conv_b": vec(p + "ssm_conv1d.bias"),
            "dt_bias": vec(p + "ssm_dt.bias"),  # [n_head]
            "A_log": vec(p + "ssm_a.weight" if p + "ssm_a.weight" in t
                         else p + "ssm_a"),  # [n_head]
            "D": vec(p + "ssm_d.weight" if p + "ssm_d.weight" in t
                     else p + "ssm_d"),  # [n_head]
            "ssm_norm": (vec(p + "ssm_norm.weight")
                         if p + "ssm_norm.weight" in t else None),
            "ssm_out": linear(p + "ssm_out.weight"),
        })

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "layers": layers,
        "output_norm": load_vector(t["output_norm.weight"]),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _ssd_scan(x, dt, A, Bm, Cm, h0, n_group):
    """Mamba-2 SSD scan. x [B,T,H,hd]; dt [B,T,H]; A [H]; Bm,Cm [B,T,G,S];
    h0 [B,H,hd,S]. Returns (y [B,T,H,hd], hT)."""
    B_, T, H, hd = x.shape
    reps = H // n_group
    Bh = jnp.repeat(Bm, reps, axis=2)  # [B,T,H,S]
    Ch = jnp.repeat(Cm, reps, axis=2)
    a = jnp.exp(dt * A[None, None])  # [B,T,H]
    a4 = a[..., None, None]  # [B,T,H,1,1]
    b = (dt[..., None] * x)[..., None] * Bh[:, :, :, None, :]  # [B,T,H,hd,S]

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    a_acc, b_acc = jax.lax.associative_scan(
        combine, (jnp.broadcast_to(a4, b.shape), b), axis=1
    )
    h = a_acc * h0[:, None] + b_acc  # [B,T,H,hd,S]
    y = jnp.einsum("bthds,bths->bthd", h, Ch)
    return y, h[:, -1]


def forward2(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache: RecurrentCache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, RecurrentCache]:
    B, T = tokens.shape
    D = hp.ssm_d_inner
    H = hp.ssm_dt_rank  # head count (hparams.ssm_dt_rank ≡ n_head)
    S = hp.ssm_d_state
    G = hp.ssm_n_group
    hd = D // H
    x = params["tok_embd"][tokens]

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        zxBCdt = layer["ssm_in"](h).astype(jnp.float32)  # [B,T,2D+2GS+H]
        z = zxBCdt[..., :D]
        xBC = zxBCdt[..., D : 2 * D + 2 * G * S]
        dt_raw = zxBCdt[..., 2 * D + 2 * G * S :]  # [B,T,H]

        conv_out, conv_state = _causal_conv(
            xBC, cache.conv[li], layer["conv_w"], layer["conv_b"]
        )
        xBC = jax.nn.silu(conv_out)  # [B,T,D+2GS]
        xin = xBC[..., :D].reshape(B, T, H, hd)
        Bm = xBC[..., D : D + G * S].reshape(B, T, G, S)
        Cm = xBC[..., D + G * S :].reshape(B, T, G, S)

        dt = jax.nn.softplus(dt_raw + layer["dt_bias"][None, None])  # [B,T,H]
        A = layer["A_log"]  # stored as -exp(A_log) by the converter
        h0 = cache.ssm[li].reshape(B, H, hd, S)
        y, ssm_state = _ssd_scan(xin, dt, A, Bm, Cm, h0, G)
        y = y + xin * layer["D"][None, None, :, None]
        y = y.reshape(B, T, D) * jax.nn.silu(z)
        if layer["ssm_norm"] is not None:  # grouped RMS norm
            yg = y.reshape(B, T, G, D // G)
            wg = layer["ssm_norm"].reshape(G, D // G)
            yg = yg / jnp.sqrt(
                (yg * yg).mean(-1, keepdims=True) + hp.rms_eps
            ) * wg[None, None]
            y = yg.reshape(B, T, D)
        cache = cache.update(li, conv_state, ssm_state.reshape(B, D, S))
        x = x + layer["ssm_out"](y.astype(x.dtype))

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), cache
