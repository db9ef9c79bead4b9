"""Rotary position embeddings with linear/YaRN scaling.

Math follows ggml_rope_ext semantics (reference ggml/src/ggml-cuda/rope.cu,
ggml-cpu rope): "norm" style rotates adjacent element pairs (GGML interleaved
layout — what llama-family GGUF weights are permuted for), "neox" rotates the
two halves. YaRN ramp/mscale per ggml's rope_yarn / ggml_rope_yarn_corr_dims.
Pure jnp: XLA fuses this into surrounding element-wise work; a Pallas kernel
adds nothing for a bandwidth-trivial op.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..models.hparams import RopeParams


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def rope_angles(rp: RopeParams, positions: jax.Array,
                mscale_on: bool = True) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables: positions [...,] -> ([..., n_dims/2], [..., n_dims/2])."""
    half = rp.dims // 2
    freq_scale = 1.0 / rp.scale_factor if rp.scaling_type in ("linear", "yarn") else 1.0
    inv_freq = rp.freq_base ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / rp.dims)
    theta_extrap = positions[..., None].astype(jnp.float32) * inv_freq
    theta = theta_extrap * freq_scale
    mscale = rp.attn_factor if mscale_on else 1.0

    if rp.scaling_type == "yarn" and rp.ext_factor != 0.0:
        n_ctx_orig = rp.orig_ctx or 1
        low = max(0.0, math.floor(_yarn_corr_dim(rp.dims, n_ctx_orig, rp.beta_fast, rp.freq_base)))
        high = min(rp.dims - 1.0, math.ceil(_yarn_corr_dim(rp.dims, n_ctx_orig, rp.beta_slow, rp.freq_base)))
        i0 = jnp.arange(0, rp.dims, 2, dtype=jnp.float32)
        ramp = 1.0 - jnp.clip((i0 / 2.0 - low) / max(0.001, high - low), 0.0, 1.0)
        ramp_mix = ramp * rp.ext_factor
        theta = theta * (1.0 - ramp_mix) + theta_extrap * ramp_mix
        if mscale_on:
            mscale *= 1.0 + 0.1 * math.log(1.0 / freq_scale)

    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def rotate_cached_keys(k: jax.Array, delta: jax.Array, rp: RopeParams) -> jax.Array:
    """Re-rotate already-rope'd keys by a per-row position delta
    (≡ llama_kv_cache seq_add / ggml_rope's in-place K rotation on context
    shift, reference src/llama-kv-cache.cpp:779). Valid because every
    supported scaling keeps theta linear in position, so
    R(pos+delta) = R(delta)·R(pos); the magnitude scale (attn_factor / YaRN
    mscale) is already baked into the stored keys and must not be re-applied.

    k: [..., S, D], delta: [S] int32 (0 = identity)."""
    cos, sin = rope_angles(rp, delta.astype(jnp.float32), mscale_on=False)
    return _apply(k, cos, sin, rp.style)


@partial(jax.jit, static_argnames=("style",))
def _apply(x: jax.Array, cos: jax.Array, sin: jax.Array, style: str) -> jax.Array:
    n_rot = cos.shape[-1] * 2
    rot, rest = x[..., :n_rot], x[..., n_rot:]
    rot = rot.astype(jnp.float32)
    if style == "norm":
        # interleaved pairs: (x0,x1), (x2,x3), ...
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        out = jnp.stack([r0, r1], axis=-1).reshape(rot.shape)
    elif style == "neox":
        half = n_rot // 2
        x0 = rot[..., :half]
        x1 = rot[..., half:]
        out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    else:
        raise ValueError(f"unknown rope style {style}")
    out = out.astype(x.dtype)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out


def apply_rope(
    x: jax.Array, positions: jax.Array, rp: RopeParams
) -> jax.Array:
    """x: [B, T, H, D], positions: [B, T] -> same shape, first rp.dims rotated.

    M-RoPE (qwen2vl/qwen3vl/glm4v text, ≡ ggml GGML_ROPE_TYPE_MROPE): when
    rp.sections is set and positions is [S, B, T] (one stream per section
    role: t, h, w, extra), each frequency dim takes its angle from the
    stream its section covers. With all streams equal (pure text) this
    reduces exactly to classic rope."""
    if rp.sections and positions.ndim == 3:
        cos, sin = rope_angles(rp, positions)  # [S, B, T, half]
        half = rp.dims // 2
        sec = [s for s in rp.sections]
        if rp.mrope_interleaved:
            # qwen3vl IMROPE: [T H W T H W … T] (HF apply_interleaved_mrope)
            stream = np.zeros(half, np.int64)
            for d, off in ((1, 1), (2, 2)):
                idx = np.arange(off, min(sec[d] * 3, half), 3)
                stream[idx] = d
        else:
            sec_total = max(1, sum(sec))
            j = np.arange(half) % sec_total
            stream = np.searchsorted(np.cumsum(sec), j, side="right")
        stream = np.minimum(stream, positions.shape[0] - 1)
        idx = jnp.asarray(stream, jnp.int32)
        cos = jnp.take_along_axis(
            jnp.moveaxis(cos, 0, -1), idx[None, None, :, None], axis=-1
        )[..., 0]
        sin = jnp.take_along_axis(
            jnp.moveaxis(sin, 0, -1), idx[None, None, :, None], axis=-1
        )[..., 0]
        return _apply(x, cos[:, :, None, :], sin[:, :, None, :], rp.style)
    cos, sin = rope_angles(rp, positions)  # [B, T, half]
    return _apply(x, cos[:, :, None, :], sin[:, :, None, :], rp.style)
