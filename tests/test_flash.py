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
    assert flash.supports((1, 1, 8, 64), (1, 2, 512, 64))  # decode T=1 pads
    assert not flash.supports((1, 12, 8, 64), (1, 2, 512, 64))  # T%8
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


def test_decode_t1_and_t4():
    """T<8 decode steps pad to one 8-row tile; kv tiles past kv_len clamp
    (DMA elision) and skip compute — values must still match the dense
    reference exactly."""
    for T, off in ((1, 0), (1, 100), (4, 37), (7, 250)):
        run_case(B=2, T=T, H=4, Hkv=2, D=64, S=512, offset=off, seed=T)


def test_decode_per_batch_offsets_with_idle_row():
    """Batched decode: one active slot deep in the cache, one idle slot
    (offset −1) whose output must be finite (the scheduler discards it)."""
    rng = np.random.default_rng(5)
    B, T, H, Hkv, D, S = 2, 1, 2, 2, 32, 256
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    offsets = jnp.asarray([200, -1], jnp.int32)
    got = flash.flash_attention(q, k, v, offsets, 0.125)
    positions = jnp.asarray([[200]])
    mask = causal_mask(positions, S, jnp.asarray([201]))
    ref = attention_reference(q[:1], k[:1], v[:1], mask, 0.125)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(got[1])).all()


def test_sinks_match_dense():
    """Per-head sink logits join the softmax normalizer (≡ gpt-oss
    ggml_soft_max_add_sinks) — kernel vs the dense sink formula."""
    from tpullm.ops.attention import _attention_with_sinks_dense as _attention_with_sinks

    rng = np.random.default_rng(7)
    for T, off in ((1, 60), (32, 0)):
        B, H, Hkv, D, S = 1, 4, 2, 32, 128
        q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
        sinks = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
        offsets = jnp.full((B,), off, jnp.int32)
        got = flash.flash_attention(q, k, v, offsets, 0.177, sinks=sinks)
        positions = jnp.broadcast_to(jnp.arange(off, off + T), (B, T))
        mask = causal_mask(positions, S, off + T)
        ref = _attention_with_sinks(q, k, v, mask, 0.177, sinks)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def test_alibi_matches_dense():
    """ALiBi slopes in-kernel vs the dense reference bias path
    (bloom/mpt/jais)."""
    from tpullm.ops.attention import alibi_distances, alibi_slopes

    rng = np.random.default_rng(9)
    for T, off in ((1, 90), (64, 0)):
        B, H, Hkv, D, S = 1, 8, 8, 32, 128
        q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
        slopes = alibi_slopes(H, 8.0)
        offsets = jnp.full((B,), off, jnp.int32)
        got = flash.flash_attention(q, k, v, offsets, 0.177,
                                    alibi_slopes=slopes)
        positions = jnp.broadcast_to(jnp.arange(off, off + T), (B, T))
        mask = causal_mask(positions, S, off + T)
        dist = alibi_distances(positions, S)
        ref = attention_reference(q, k, v, mask, 0.177,
                                  alibi=(slopes, dist))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def test_q8_decode_t1_with_sinks():
    """The q8 kernel shares the decode/sink plumbing."""
    from tpullm.ops.attention import _attention_with_sinks_dense as _attention_with_sinks

    rng = np.random.default_rng(11)
    B, T, H, Hkv, S, D = 1, 1, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32) * 0.3)
    k_q = jnp.asarray(rng.integers(-127, 127, size=(B, Hkv, S, D), dtype=np.int8))
    v_q = jnp.asarray(rng.integers(-127, 127, size=(B, Hkv, S, D), dtype=np.int8))
    k_s = jnp.asarray(rng.uniform(0.001, 0.01, size=(B, Hkv, S)).astype(np.float32))
    v_s = jnp.asarray(rng.uniform(0.001, 0.01, size=(B, Hkv, S)).astype(np.float32))
    sinks = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) - 3.0)
    offsets = jnp.asarray([77], jnp.int32)
    got = flash.flash_attention_q8(q, k_q, k_s, v_q, v_s, offsets, 0.125,
                                   sinks=sinks)
    k = k_q.astype(jnp.float32) * k_s[..., None]
    v = v_q.astype(jnp.float32) * v_s[..., None]
    positions = offsets[:, None] + jnp.arange(T)[None, :]
    mask = causal_mask(positions, S, offsets + T)
    ref = _attention_with_sinks(q, k, v, mask, 0.125, sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_sliding_window_decode_clamps_low_tiles():
    """Deep-offset decode with a window smaller than the context: tiles
    left of the window clamp/skip; values match the dense reference."""
    run_case(B=1, T=1, H=2, Hkv=2, D=32, S=1024, offset=900,
             sliding_window=128, seed=13)


def test_flash_non_multiple_256_cache():
    """Caches sized off the ×256 grid (max_seq = depth + tg + 64 style)
    still take the kernel via a smaller divisor tile."""
    import numpy as np

    from tpullm.ops.attention import attention_reference, causal_mask
    from tpullm.ops.pallas import flash

    B, T, H, Hkv, D, S = 1, 16, 4, 2, 32, 320  # 320 = 64×5, not ×256
    assert flash.supports((B, T, H, D), (B, Hkv, S, D))
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, jnp.float32)
    offs = jnp.asarray([40], jnp.int32)
    got = flash.flash_attention(q, k, v, offs, 0.177)
    positions = offs[:, None] + jnp.arange(T)[None, :]
    mask = causal_mask(positions, S, offs + T)
    ref = attention_reference(q, k, v, mask, 0.177)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
