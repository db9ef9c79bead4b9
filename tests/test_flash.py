"""Flash attention kernel conformance vs the jnp reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.ops.attention import attention_reference, causal_mask
from tpullm.ops.pallas import flash


def run_case(B, T, H, Hkv, D, S, offset, sliding_window=0, softcap=0.0, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    offsets = jnp.full((B,), offset, dtype=jnp.int32)
    scale = D ** -0.5

    positions = jnp.broadcast_to(jnp.arange(offset, offset + T), (B, T))
    mask = causal_mask(positions, S, offset + T, sliding_window)
    ref = attention_reference(q, k, v, mask, scale, softcap)
    got = flash.flash_attention(q, k, v, offsets, scale, softcap, sliding_window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_supports():
    assert flash.supports((1, 128, 8, 64), (1, 2, 512, 64))
    assert not flash.supports((1, 1, 8, 64), (1, 2, 512, 64))  # decode T=1
    assert not flash.supports((1, 128, 8, 64), (1, 3, 512, 64))  # H % Hkv


def test_prefill_from_zero():
    run_case(B=1, T=128, H=4, Hkv=2, D=64, S=256, offset=0)


def test_prefill_with_history():
    # cache already holds 128 tokens; queries run at offset 128
    run_case(B=2, T=128, H=4, Hkv=4, D=64, S=512, offset=128)


def test_multi_tile_q_and_kv():
    run_case(B=1, T=512, H=2, Hkv=1, D=64, S=512, offset=0)


def test_gqa_mapping():
    run_case(B=1, T=256, H=8, Hkv=2, D=32, S=256, offset=0, seed=3)


def test_sliding_window():
    run_case(B=1, T=256, H=2, Hkv=2, D=32, S=256, offset=0, sliding_window=64)


def test_softcap():
    run_case(B=1, T=128, H=2, Hkv=2, D=32, S=128, offset=0, softcap=50.0)


def test_per_batch_offsets():
    rng = np.random.default_rng(1)
    B, T, H, Hkv, D, S = 2, 64, 2, 2, 32, 256
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    offsets = jnp.asarray([0, 96], dtype=jnp.int32)
    scale = D ** -0.5
    got = flash.flash_attention(q, k, v, offsets, scale)
    # reference per batch row
    for b in range(B):
        off = int(offsets[b])
        positions = jnp.arange(off, off + T)[None]
        mask = causal_mask(positions, S, off + T, 0)
        ref = attention_reference(q[b : b + 1], k[b : b + 1], v[b : b + 1],
                                  mask, scale)
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(ref[0]), rtol=2e-3, atol=2e-3
        )


def test_flash_q8_matches_dequant_reference():
    """The int8-KV flash kernel matches attention over the dequantized
    cache (≡ fork flash_attn_tile_q8 vs the f32 fattn path)."""
    from tpullm.ops.attention import attention_reference, causal_mask
    from tpullm.ops.pallas import flash

    rng = np.random.default_rng(0)
    B, T, H, Hkv, S, D = 1, 32, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.3)
    k_q = jnp.asarray(rng.integers(-127, 127, size=(B, Hkv, S, D), dtype=np.int8))
    v_q = jnp.asarray(rng.integers(-127, 127, size=(B, Hkv, S, D), dtype=np.int8))
    k_s = jnp.asarray(rng.uniform(0.001, 0.01, size=(B, Hkv, S)).astype(np.float32))
    v_s = jnp.asarray(rng.uniform(0.001, 0.01, size=(B, Hkv, S)).astype(np.float32))
    offsets = jnp.asarray([96], jnp.int32)  # 96 past + 32 new = 128 valid

    got = flash.flash_attention_q8(q, k_q, k_s, v_q, v_s, offsets, 0.125)

    k = k_q.astype(jnp.float32) * k_s[..., None]
    v = v_q.astype(jnp.float32) * v_s[..., None]
    positions = offsets[:, None] + jnp.arange(T)[None, :]
    mask = causal_mask(positions, S, offsets + T)
    ref = attention_reference(q, k, v, mask, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_quant_kv_cache_engine_uses_q8_flash(tmp_path):
    """q8_0 KV engine prefill runs through the packed-plane flash path and
    matches the bf16-cache engine closely."""
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime import Engine

    path = make_tiny_llama_gguf(tmp_path / "m.gguf", n_embd=128, n_head=4,
                                n_head_kv=2)
    toks = list(range(3, 35))
    e_q8 = Engine(path, mode="dense", dtype=jnp.float32, max_seq=256,
                  kv_dtype="q8_0")
    got = e_q8.prefill_all_logits(toks)
    e_bf = Engine(path, mode="dense", dtype=jnp.float32, max_seq=256,
                  kv_dtype=jnp.float32)
    ref = e_bf.prefill_all_logits(toks)
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.1)  # q8 rounding
