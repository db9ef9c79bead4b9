"""iSWA dual ring cache (≡ llama_kv_cache_unified_iswa): ring-cached SWA
layers must produce the same logits as the full-size cache, across chunked
prefill, decode, rollback, and reset."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.models.testing import make_tiny_gemma_gguf
from tpullm.runtime import Engine
from tpullm.runtime.kvcache import SWACache


@pytest.fixture(scope="module")
def gemma_model(tmp_path_factory):
    return make_tiny_gemma_gguf(
        tmp_path_factory.mktemp("swa") / "g.gguf", arch="gemma3",
        sliding_window=16, n_ctx=256,
    )


def _engines(path, **kw):
    ring = Engine(path, mode="dense", dtype=jnp.float32,
                  kv_dtype=jnp.float32, max_seq=128, **kw)
    full = Engine(path, mode="dense", dtype=jnp.float32,
                  kv_dtype=jnp.float32, max_seq=128, swa_full=True, **kw)
    return ring, full


def test_ring_cache_engaged(gemma_model):
    ring, full = _engines(gemma_model)
    assert isinstance(ring.cache, SWACache)
    assert not isinstance(full.cache, SWACache)
    # 5 of 6 gemma3 layers are SWA; ring is much smaller than max_seq only
    # for realistic ctx (here ring_len >= window-1+chunk capped at max_seq)
    assert ring.cache.ring_len <= ring.max_seq


def test_ring_matches_full_prefill_and_decode(gemma_model):
    ring, full = _engines(gemma_model)
    toks = list(np.random.default_rng(0).integers(5, 250, size=40))
    lr = ring.prefill(toks)
    lf = full.prefill(toks)
    np.testing.assert_allclose(lr, lf, rtol=1e-5, atol=1e-5)
    for t in (3, 7, 11, 19):
        lr = ring.decode_step(t)
        lf = full.decode_step(t)
        np.testing.assert_allclose(lr, lf, rtol=1e-5, atol=1e-5)


def test_ring_chunked_prefill_matches(gemma_model):
    """Force chunking (prefill_cap below prompt length) — logits must not
    change vs one-shot prefill with the full cache."""
    ring, full = _engines(gemma_model)
    ring.prefill_cap = 16  # chunk aggressively: many ring wraps
    toks = list(np.random.default_rng(1).integers(5, 250, size=100))
    lr = ring.prefill(toks)
    lf = full.prefill(toks)
    np.testing.assert_allclose(lr, lf, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ring.decode_step(9), full.decode_step(9),
                               rtol=1e-5, atol=1e-5)


def test_ring_all_logits_chunked(gemma_model):
    ring, full = _engines(gemma_model)
    ring.prefill_cap = 32
    toks = list(np.random.default_rng(2).integers(5, 250, size=80))
    lr = ring.prefill_all_logits(toks)
    lf = full.prefill_all_logits(toks)
    assert lr.shape == lf.shape == (80, lf.shape[1])
    np.testing.assert_allclose(lr, lf, rtol=1e-5, atol=1e-5)


def test_ring_reset_isolates_conversations(gemma_model):
    ring, full = _engines(gemma_model)
    ring.prefill(list(range(5, 45)))
    ring.reset()
    full.reset()
    toks = [7, 9, 11, 13]
    np.testing.assert_allclose(ring.prefill(toks), full.prefill(toks),
                               rtol=1e-5, atol=1e-5)


def test_ring_rollback_reexecute(gemma_model):
    """Speculative-style rollback: rewind n_past and re-decode different
    tokens; ring slots must be correctly overwritten."""
    ring, full = _engines(gemma_model)
    ring.prefill([5, 6, 7, 8]); full.prefill([5, 6, 7, 8])
    for t in (20, 21, 22):
        ring.decode_step(t); full.decode_step(t)
    ring.n_past -= 2; full.n_past -= 2  # reject last 2 speculated tokens
    for t in (30, 31):
        lr = ring.decode_step(t)
        lf = full.decode_step(t)
    np.testing.assert_allclose(lr, lf, rtol=1e-5, atol=1e-5)


def test_ring_memory_smaller():
    """The point of the exercise: SWA layers allocate ring_len, not max_len."""
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = make_tiny_gemma_gguf(os.path.join(d, "g.gguf"), arch="gemma3",
                                    sliding_window=16, n_ctx=8192)
        eng = Engine(path, mode="dense", max_seq=8192)
        c = eng.cache
        assert isinstance(c, SWACache)
        full_bytes = c.full_k.size + c.full_v.size
        swa_bytes = c.swa_k.size + c.swa_v.size
        # 5 swa layers at ring_len ≪ 1 full layer at 8192
        assert c.ring_len < 8192 / 4
        assert swa_bytes < full_bytes * 2


def test_ring_state_save_load(gemma_model, tmp_path):
    """Prompt-cache roundtrip for iSWA engines: ring + slot positions
    persist, so a restored engine continues identically."""
    from tpullm.runtime.state import load_state, save_state

    ring, _ = _engines(gemma_model)
    toks = list(np.random.default_rng(3).integers(5, 250, size=30))
    ring.prefill(toks)
    expect = [ring.decode_step(7), ring.decode_step(8)]

    ring2, _ = _engines(gemma_model)
    ring2.prefill(toks)
    p = str(tmp_path / "state.npz")
    save_state(ring2, p, tokens=toks)

    ring3, _ = _engines(gemma_model)
    restored = load_state(ring3, p)
    assert restored == toks
    got = [ring3.decode_step(7), ring3.decode_step(8)]
    np.testing.assert_allclose(got[0], expect[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[1], expect[1], rtol=1e-5, atol=1e-5)


# slow: chunked device-generation sweep; ring==full parity stays fast
@pytest.mark.slow
def test_ring_device_generation_chunked(gemma_model):
    """generate_tokens_device with a prompt longer than prefill_cap: host
    chunks the prefill, decode stays on-device; greedy output matches the
    full-cache engine."""
    ring, full = _engines(gemma_model)
    ring.prefill_cap = 16
    prompt = list(np.random.default_rng(4).integers(5, 250, size=40))
    got = ring.generate_tokens_device(prompt, max_new_tokens=6, temp=0.0,
                                      stop_on_eog=False)
    want = full.generate_tokens_device(prompt, max_new_tokens=6, temp=0.0,
                                       stop_on_eog=False)
    assert got == want


def test_joint_prefill_on_swa_serving_engine(gemma_model):
    """prefill_slots (joint multi-slot admission) over the iSWA dual ring
    cache must reproduce sequential per-slot prefills — ring writes and
    slot_pos bookkeeping are per-row vmapped."""
    from tpullm.runtime.batch_engine import BatchEngine

    prompts = {0: list(range(3, 30)), 1: list(range(5, 14))}

    def fresh():
        return BatchEngine(gemma_model, n_slots=2, max_seq=64, mode="dense",
                           dtype=jnp.float32, kv_dtype=jnp.float32,
                           prefill_chunk=16)

    eng_a = fresh()
    ref = {s: eng_a.prefill_slot(s, t) for s, t in prompts.items()}
    eng_b = fresh()
    got = eng_b.prefill_slots(prompts)
    for s in prompts:
        np.testing.assert_allclose(got[s], ref[s], rtol=2e-4, atol=2e-4)
    feed = {s: int(np.argmax(ref[s])) for s in prompts}
    da = eng_a.decode_batch(feed)
    db = eng_b.decode_batch(feed)
    for s in prompts:
        np.testing.assert_allclose(db[s], da[s], rtol=2e-4, atol=2e-4)
