"""Pallas flash attention over the head-major ring KV cache.

TPU analog of the reference's fattn kernels (ggml-cuda/fattn-*.cu(h), fork's
flash_attn_tile_q8): online-softmax tiles with causal masking driven by
per-batch cache offsets (continuous batching), GQA handled by mapping each
query head to its kv head in the BlockSpec index maps — no K/V replication.

Layouts: q [B, H, T, D] (transposed by the caller), k/v [B, Hkv, S, D]
(native cache layout). offsets[B] = first cache slot written this step, so a
query row t has absolute position off_b + t and kv_len_b = off_b + T.
Grid: (B, H, T/TQ, S/TK), kv innermost, f32 online-softmax state in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TQ = 256
DEFAULT_TK = 256
NEG_INF = -1e30


def available() -> bool:
    return True


def supports(q_shape, k_shape, sliding_window: int = 0) -> bool:
    """q [B,T,H,D] (pre-transpose), k [B,Hkv,S,D]."""
    B, T, H, D = q_shape
    Hkv, S = k_shape[1], k_shape[2]
    if H % Hkv:
        return False
    if T < 8 or T % 8:
        return False  # decode steps use the dense path (weights dominate)
    tq = min(DEFAULT_TQ, T)
    tk = min(DEFAULT_TK, S)
    return T % tq == 0 and S % tk == 0 and tk % 8 == 0


def _kernel(off_ref, q_ref, k_ref, v_ref, out_ref, m_scr, l_scr, acc_scr,
            *, scale: float, tq: int, tk: int, softcap: float,
            sliding_window: int):
    b = pl.program_id(0)
    it = pl.program_id(2)
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    off = off_ref[b]
    q = q_ref[0, 0].astype(jnp.float32)  # (TQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (TK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, TK)
    if softcap:
        s = jnp.tanh(s / softcap) * softcap

    q_pos = off + it * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    k_pos = jk * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    mask = k_pos <= q_pos
    if sliding_window > 0:
        mask &= k_pos > q_pos - sliding_window
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (TQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # fully-masked rows: exp(NEG_INF - m) == 0
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)  # (TK, Dv)
    acc_scr[:] = acc_scr[:] * corr + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jk == pl.num_programs(3) - 1)
    def _():
        l = l_scr[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        out_ref[0, 0] = (acc_scr[:] / safe).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "sliding_window", "interpret"),
)
def _flash(q, k, v, offsets, scale, softcap, sliding_window, interpret):
    B, H, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    Dv = v.shape[3]
    G = H // Hkv
    tq = min(DEFAULT_TQ, T)
    tk = min(DEFAULT_TK, S)
    grid = (B, H, T // tq, S // tk)

    kernel = functools.partial(
        _kernel, scale=scale, tq=tq, tk=tk, softcap=softcap,
        sliding_window=sliding_window,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, off: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, D), lambda b, h, i, j, off: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, Dv), lambda b, h, i, j, off: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, Dv), lambda b, h, i, j, off: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, Dv), jnp.float32),
        ],
    )
    flops = 4 * B * H * T * S * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(q.size * 2 + k.size * 2 + v.size * 2),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(offsets, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jax.Array,  # [B, T, H, D] — caller layout
    k: jax.Array,  # [B, Hkv, S, D] — cache layout
    v: jax.Array,  # [B, Hkv, S, Dv]
    offsets: jax.Array,  # [B] int32
    scale: float,
    softcap: float = 0.0,
    sliding_window: int = 0,
) -> jax.Array:
    interpret = jax.default_backend() != "tpu"
    qh = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    out = _flash(
        qh, k, v, offsets.astype(jnp.int32), float(scale), float(softcap),
        int(sliding_window), interpret,
    )
    return out.transpose(0, 2, 1, 3)  # [B, T, H, Dv]


def _reference_equiv(q, k, v, offsets, scale, softcap, sliding_window):
    """Differentiable recompute used for the backward pass (training takes
    the dense-math gradient; the Pallas kernel serves the forward)."""
    from ..attention import attention_reference, causal_mask

    B, T = q.shape[0], q.shape[1]
    positions = offsets[:, None] + jnp.arange(T)[None, :]
    mask = causal_mask(positions, k.shape[2], offsets + T, sliding_window)
    return attention_reference(q, k, v, mask, scale, softcap)


def _fa_fwd(q, k, v, offsets, scale, softcap, sliding_window):
    out = flash_attention(q, k, v, offsets, scale, softcap, sliding_window)
    return out, (q, k, v, offsets)


def _fa_bwd(scale, softcap, sliding_window, res, g):
    q, k, v, offsets = res
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_equiv(q, k, v, offsets, scale, softcap, sliding_window),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)

# ---------------------------------------------------------------------------
# int8-KV flash attention (≡ the fork's flash_attn_tile_q8 + q8 gather,
# SURVEY §2.4): K/V tiles stream as int8 + per-vector f32 scales and
# dequantize in VMEM, halving cache bandwidth vs bf16.
# ---------------------------------------------------------------------------


def _kernel_q8(off_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, out_ref,
               m_scr, l_scr, acc_scr, *, scale: float, tq: int, tk: int,
               softcap: float, sliding_window: int):
    b = pl.program_id(0)
    it = pl.program_id(2)
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    off = off_ref[b]
    q = q_ref[0, 0].astype(jnp.float32)  # (TQ, D)
    k = kq_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0]  # (TK, D) dequant
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if softcap:
        s = jnp.tanh(s / softcap) * softcap

    q_pos = off + it * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    k_pos = jk * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    mask = k_pos <= q_pos
    if sliding_window > 0:
        mask &= k_pos > q_pos - sliding_window
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    v = vq_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0]  # (TK, Dv)
    acc_scr[:] = acc_scr[:] * corr + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(jk == pl.num_programs(3) - 1)
    def _():
        l = l_scr[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        out_ref[0, 0] = (acc_scr[:] / safe).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "sliding_window", "interpret"),
)
def _flash_q8(q, k_q, k_s, v_q, v_s, offsets, scale, softcap, sliding_window,
              interpret):
    B, H, T, D = q.shape
    Hkv, S = k_q.shape[1], k_q.shape[2]
    Dv = v_q.shape[3]
    G = H // Hkv
    tq = min(DEFAULT_TQ, T)
    tk = min(DEFAULT_TK, S)
    grid = (B, H, T // tq, S // tk)

    kernel = functools.partial(
        _kernel_q8, scale=scale, tq=tq, tk=tk, softcap=softcap,
        sliding_window=sliding_window,
    )
    ks2 = k_s[..., None]  # [B, Hkv, S, 1] f32
    vs2 = v_s[..., None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, off: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, D), lambda b, h, i, j, off: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 1), lambda b, h, i, j, off: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, Dv), lambda b, h, i, j, off: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 1), lambda b, h, i, j, off: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, Dv), lambda b, h, i, j, off: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, Dv), jnp.float32),
        ],
    )
    flops = 4 * B * H * T * S * D
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(q.size * 2 + k_q.size + v_q.size
                               + k_s.size * 4 + v_s.size * 4),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(offsets, q, k_q, ks2, v_q, vs2)


def flash_attention_q8(
    q: jax.Array,  # [B, T, H, D]
    k_q: jax.Array,  # [B, Hkv, S, D] int8
    k_s: jax.Array,  # [B, Hkv, S] f32
    v_q: jax.Array,  # [B, Hkv, S, Dv] int8
    v_s: jax.Array,  # [B, Hkv, S] f32
    offsets: jax.Array,
    scale: float,
    softcap: float = 0.0,
    sliding_window: int = 0,
) -> jax.Array:
    """Flash attention directly over the q8 KV cache planes."""
    interpret = jax.default_backend() != "tpu"
    qh = q.transpose(0, 2, 1, 3)
    out = _flash_q8(
        qh, k_q, k_s, v_q, v_s, offsets.astype(jnp.int32), float(scale),
        float(softcap), int(sliding_window), interpret,
    )
    return out.transpose(0, 2, 1, 3)
