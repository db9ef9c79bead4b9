"""Pallas flash attention over the head-major ring KV cache.

TPU analog of the reference's fattn kernels (ggml-cuda/fattn-*.cu(h), fork's
flash_attn_tile_q8): online-softmax tiles with causal masking driven by
per-batch cache offsets (continuous batching), GQA handled by mapping each
query head to its kv head in the BlockSpec index maps — no K/V replication.

Layouts: q [B, H, T, D] (transposed by the caller), k/v [B, Hkv, S, D]
(native cache layout). offsets[B] = first cache slot written this step, so a
query row t has absolute position off_b + t and kv_len_b = off_b + T.
Grid: (B, H, T/TQ, S/TK), kv innermost, f32 online-softmax state in VMEM.

Decode regime (T < 8, ≡ the fork's flash_attn_tile_q8 decode tiles +
fattn-common.cuh sinks/ALiBi plumbing):
  * queries pad up to the 8-row sublane tile; pad rows are sliced off.
  * the kv sweep is bounded by kv_len: out-of-range kv tiles clamp their
    block index to the last valid tile — Mosaic elides the DMA when the
    block index repeats — and skip their compute under pl.when, so a short
    context in a long cache pays O(kv_len), not O(S). Sliding windows also
    clamp/skip tiles left of the window.
  * attention sinks (gpt-oss: one learnable logit per head joining the
    softmax normalizer, ≡ ggml_soft_max_add_sinks) fold in at
    finalization: m_f = max(m, sink), l = l·corr + exp(sink − m_f).
  * ALiBi (bloom/mpt/jais) adds slope_h · (k_pos − q_pos) to the scores
    in-tile (≡ soft_max_ext's position bias; equal to −slope·|Δ| under the
    causal mask).
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


def _pick_tk(S: int) -> int:
    """Largest kv tile ≤ DEFAULT_TK that divides S (caches are not always
    sized to ×256 — e.g. max_seq = depth + tg + 64); 0 if none."""
    for tk in (256, 128, 64, 32, 16, 8):
        if tk <= S and S % tk == 0:
            return tk
    return 0


def supports(q_shape, k_shape, sliding_window: int = 0) -> bool:
    """q [B,T,H,D] (pre-transpose), k [B,Hkv,S,D]. T<8 pads to one 8-row
    tile; larger T must stay sublane-aligned."""
    B, T, H, D = q_shape
    Hkv, S = k_shape[1], k_shape[2]
    if H % Hkv:
        return False
    if T >= 8 and T % 8:
        return False
    tq = min(DEFAULT_TQ, max(T, 8))
    return (T < 8 or T % tq == 0) and _pick_tk(S) > 0


def _make_kernel(*, quant: bool, scale: float, tq: int, tk: int, t_real: int,
                 softcap: float, sliding_window: int, has_sinks: bool,
                 has_alibi: bool):
    """One online-softmax kernel body covering the bf16 and q8-plane KV
    paths plus the optional per-head sink / ALiBi-slope columns."""

    def kernel(off_ref, q_ref, *refs):
        refs = list(refs)
        if quant:
            kq_ref, ks_ref, vq_ref, vs_ref = refs[:4]
            del refs[:4]
        else:
            k_ref, v_ref = refs[:2]
            del refs[:2]
        sinks_ref = refs.pop(0) if has_sinks else None
        slope_ref = refs.pop(0) if has_alibi else None
        out_ref, m_scr, l_scr, acc_scr = refs

        b = pl.program_id(0)
        h = pl.program_id(1)
        it = pl.program_id(2)
        jk = pl.program_id(3)

        @pl.when(jk == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        off = off_ref[b]
        kv_len = off + t_real
        valid = jk * tk < kv_len
        if sliding_window > 0:
            # skip tiles entirely left of the earliest row's window
            valid &= (jk + 1) * tk - 1 > off - sliding_window

        @pl.when(valid)
        def _():
            q = q_ref[0, 0].astype(jnp.float32)  # (TQ, D)
            if quant:
                k = kq_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0]
            else:
                k = k_ref[0, 0].astype(jnp.float32)  # (TK, D)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (TQ, TK)
            if softcap:
                s = jnp.tanh(s / softcap) * softcap

            q_pos = off + it * tq + jax.lax.broadcasted_iota(
                jnp.int32, (tq, tk), 0)
            k_pos = jk * tk + jax.lax.broadcasted_iota(
                jnp.int32, (tq, tk), 1)
            if has_alibi:
                s = s + slope_ref[h, 0] * (k_pos - q_pos).astype(jnp.float32)
            mask = k_pos <= q_pos
            if sliding_window > 0:
                mask &= k_pos > q_pos - sliding_window
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_scr[:, :1]  # (TQ, 1)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)  # fully-masked rows: exp(NEG_INF-m) == 0
            corr = jnp.exp(m_prev - m_new)
            l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
            if quant:
                v = vq_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0]
            else:
                v = v_ref[0, 0].astype(jnp.float32)  # (TK, Dv)
            acc_scr[:] = acc_scr[:] * corr + jnp.dot(
                p, v, preferred_element_type=jnp.float32
            )
            m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
            l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

        @pl.when(jk == pl.num_programs(3) - 1)
        def _():
            m = m_scr[:, :1]
            l = l_scr[:, :1]
            acc = acc_scr[:]
            if has_sinks:  # the sink column joins the normalizer only
                sk = sinks_ref[h, 0]
                m_f = jnp.maximum(m, sk)
                corr = jnp.exp(m - m_f)
                acc = acc * corr
                l = l * corr + jnp.exp(sk - m_f)
            safe = jnp.where(l > 0, l, 1.0)
            out_ref[0, 0] = (acc / safe).astype(out_ref.dtype)

    return kernel


def _head_spec(H: int):
    """[H, 1] per-head column (sink logits / ALiBi slopes), whole array
    per grid step in SMEM. A (1, 1) block of an [H, 1] array violates
    Mosaic's minor-dims tiling rule even in SMEM (second-minor 1 neither
    divisible by 8 nor equal to H — confirmed on-chip, conformance r5);
    block == array is always legal, the constant index map elides
    re-fetches, and the kernel picks its head's scalar by program_id."""
    return pl.BlockSpec((H, 1), lambda b, h, i, j, off: (0, 0),
                        memory_space=pltpu.SMEM)


def _run(q, kv_inputs, kv_shapes, offsets, *, quant, scale, softcap,
         sliding_window, t_real, sinks, slopes, interpret):
    """Shared pallas_call assembly. q [B, H, T_pad, D] (T_pad % 8 == 0 or
    == 8); kv_inputs in kernel order; kv_shapes (Hkv, S, Dv)."""
    B, H, T, D = q.shape
    Hkv, S, Dv = kv_shapes
    G = H // Hkv
    tq = min(DEFAULT_TQ, T)
    tk = _pick_tk(S)
    grid = (B, H, T // tq, S // tk)

    def kv_idx(b, h, i, j, off):
        # clamp out-of-range kv tiles to the valid edge: repeated block
        # indices elide the DMA, pl.when skips the compute
        kvl = off[b] + t_real
        hi = jnp.maximum(jax.lax.div(kvl + tk - 1, tk) - 1, 0)
        lo = 0
        if sliding_window > 0:
            lo = jnp.maximum(
                jax.lax.div(off[b] - sliding_window, tk), 0)
        return (b, h // G, jnp.clip(j, lo, hi), 0)

    if quant:
        in_specs = [
            pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, off: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, D), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 1), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, Dv), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, 1), kv_idx, memory_space=pltpu.VMEM),
        ]
        kq = kv_inputs[0]
        bytes_kv = kq.size * 2 + kv_inputs[1].size * 8
    else:
        in_specs = [
            pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, off: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, D), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, Dv), kv_idx, memory_space=pltpu.VMEM),
        ]
        bytes_kv = kv_inputs[0].size * 2 + kv_inputs[1].size * 2
    extra = []
    if sinks is not None:
        in_specs.append(_head_spec(H))
        extra.append(sinks.astype(jnp.float32).reshape(H, 1))
    if slopes is not None:
        in_specs.append(_head_spec(H))
        extra.append(slopes.astype(jnp.float32).reshape(H, 1))

    kernel = _make_kernel(
        quant=quant, scale=scale, tq=tq, tk=tk, t_real=t_real,
        softcap=softcap, sliding_window=sliding_window,
        has_sinks=sinks is not None, has_alibi=slopes is not None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq, Dv),
                               lambda b, h, i, j, off: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, Dv), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=int(q.size * 2 + bytes_kv),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(offsets, q, *kv_inputs, *extra)


def _pad_q(qh):
    """[B, H, T, D] → T padded to a multiple of 8 (decode tiles)."""
    T = qh.shape[2]
    pad = (-T) % 8
    if pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return qh, T


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "sliding_window", "interpret"),
)
def _flash(q, k, v, offsets, sinks, slopes, scale, softcap, sliding_window,
           interpret):
    qh, t_real = _pad_q(q)
    return _run(
        qh, (k, v), (k.shape[1], k.shape[2], v.shape[3]), offsets,
        quant=False, scale=scale, softcap=softcap,
        sliding_window=sliding_window, t_real=t_real, sinks=sinks,
        slopes=slopes, interpret=interpret,
    )[:, :, :t_real]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jax.Array,  # [B, T, H, D] — caller layout
    k: jax.Array,  # [B, Hkv, S, D] — cache layout
    v: jax.Array,  # [B, Hkv, S, Dv]
    offsets: jax.Array,  # [B] int32
    scale: float,
    softcap: float = 0.0,
    sliding_window: int = 0,
    sinks: jax.Array | None = None,  # [H] per-head sink logits
    alibi_slopes: jax.Array | None = None,  # [H] ALiBi slopes
) -> jax.Array:
    interpret = jax.default_backend() != "tpu"
    qh = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    out = _flash(
        qh, k, v, offsets.astype(jnp.int32), sinks, alibi_slopes,
        float(scale), float(softcap), int(sliding_window), interpret,
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


def _fa_fwd(q, k, v, offsets, scale, softcap, sliding_window,
            sinks=None, alibi_slopes=None):
    out = flash_attention(q, k, v, offsets, scale, softcap, sliding_window,
                          sinks, alibi_slopes)
    return out, (q, k, v, offsets)


def _fa_bwd(scale, softcap, sliding_window, res, g):
    q, k, v, offsets = res
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_equiv(q, k, v, offsets, scale, softcap, sliding_window),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# int8-KV flash attention (≡ the fork's flash_attn_tile_q8 + q8 gather,
# SURVEY §2.4): K/V tiles stream as int8 + per-vector scales and
# dequantize in VMEM, halving cache bandwidth vs bf16.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "sliding_window", "interpret"),
)
def _flash_q8(q, k_q, k_s, v_q, v_s, offsets, sinks, slopes, scale, softcap,
              sliding_window, interpret):
    qh, t_real = _pad_q(q)
    ks2 = k_s[..., None]  # [B, Hkv, S, 1] f32
    vs2 = v_s[..., None]
    return _run(
        qh, (k_q, ks2, v_q, vs2),
        (k_q.shape[1], k_q.shape[2], v_q.shape[3]), offsets,
        quant=True, scale=scale, softcap=softcap,
        sliding_window=sliding_window, t_real=t_real, sinks=sinks,
        slopes=slopes, interpret=interpret,
    )[:, :, :t_real]


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
    sinks: jax.Array | None = None,
    alibi_slopes: jax.Array | None = None,
) -> jax.Array:
    """Flash attention directly over the q8 KV cache planes."""
    interpret = jax.default_backend() != "tpu"
    qh = q.transpose(0, 2, 1, 3)
    out = _flash_q8(
        qh, k_q, k_s, v_q, v_s, offsets.astype(jnp.int32), sinks,
        alibi_slopes, float(scale), float(softcap), int(sliding_window),
        interpret,
    )
    return out.transpose(0, 2, 1, 3)
