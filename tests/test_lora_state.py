"""LoRA adapter + state save/restore tests (≡ reference llama-adapter,
export-lora, llama_state_* / test-state-restore-fragmented)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.lora import (
    LoraAdapter,
    apply_lora,
    load_lora_gguf,
    merge_lora_dense,
    save_lora_gguf,
)
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.runtime import Engine
from tpullm.runtime.state import load_state, save_state


@pytest.fixture(scope="module")
def base_model(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("lora") / "base.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )


def _make_adapter(tmp_path, base_model, rank=4, alpha=8.0, seed=3):
    rng = np.random.default_rng(seed)
    r = GGUFReader(base_model)
    tensors = {}
    for name in ("blk.0.attn_q.weight", "blk.1.ffn_down.weight", "output.weight"):
        n_out, n_in = r.tensors[name].shape[1], r.tensors[name].shape[0]
        a = rng.standard_normal((rank, n_in)).astype(np.float32) * 0.05
        b = rng.standard_normal((n_out, rank)).astype(np.float32) * 0.05
        tensors[name] = (a, b)
    path = tmp_path / "adapter.gguf"
    save_lora_gguf(path, tensors, alpha=alpha)
    return str(path), tensors


def test_lora_roundtrip(tmp_path, base_model):
    path, tensors = _make_adapter(tmp_path, base_model)
    ad = load_lora_gguf(path)
    assert ad.alpha == 8.0
    assert set(ad.tensors) == set(tensors)
    a, b = ad.tensors["blk.0.attn_q.weight"]
    np.testing.assert_allclose(a, tensors["blk.0.attn_q.weight"][0], rtol=1e-6)
    # scale = user * alpha / rank
    assert ad.scale_for("blk.0.attn_q.weight", 0.5) == pytest.approx(0.5 * 8.0 / 4)


def test_lora_changes_logits_and_scale_zero_is_identity(base_model, tmp_path):
    path, _ = _make_adapter(tmp_path, base_model)
    prompt = "the quick brown"

    eng0 = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    ids = eng0.tokenizer.tokenize(prompt, add_special=True)
    base_logits = eng0.prefill(ids)

    eng1 = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32, lora=[(path, 1.0)])
    lora_logits = eng1.prefill(ids)
    assert np.abs(lora_logits - base_logits).max() > 1e-4

    eng2 = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32, lora=[(path, 0.0)])
    zero_logits = eng2.prefill(ids)
    np.testing.assert_allclose(zero_logits, base_logits, rtol=1e-5, atol=1e-5)


def test_lora_matches_merged_weights(base_model, tmp_path):
    """Runtime LoRA == merging BA into the dense weight (export-lora check)."""
    path, tensors = _make_adapter(tmp_path, base_model)
    ad = load_lora_gguf(path)

    r = GGUFReader(base_model)
    name = "blk.0.attn_q.weight"
    w = r.tensors[name].to_numpy()
    a, b = ad.tensors[name]
    scale = ad.scale_for(name, 1.0)
    merged = merge_lora_dense(w, a, b, scale)

    x = np.random.default_rng(0).standard_normal((3, w.shape[1])).astype(np.float32)
    ref = x @ merged.T

    from tpullm.models.weights import DenseLinear
    from tpullm.models.lora import LoraLinear

    base_lin = DenseLinear(jnp.asarray(w.T, dtype=jnp.float32))
    lin = LoraLinear(base_lin, jnp.asarray(a.T, jnp.float32),
                     jnp.asarray(b.T, jnp.float32), scale)
    got = np.asarray(lin(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_lora_quant_base(base_model, tmp_path):
    """LoRA over packed-quantized base weights runs (unmerged, like the
    reference's runtime adapter over quantized models)."""
    from tpullm.tools.quantize import quantize_model

    qpath = tmp_path / "q.gguf"
    quantize_model(str(base_model), str(qpath), "Q4_K_M", verbose=False)
    path, _ = _make_adapter(tmp_path, base_model)
    eng = Engine(str(qpath), mode="quant", max_seq=64, lora=[(path, 1.0)])
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)


def test_lora_unmatched_tensor_raises(base_model, tmp_path):
    ad = LoraAdapter(alpha=0.0, tensors={
        "blk.0.nonexistent.weight": (np.zeros((2, 64), np.float32),
                                     np.zeros((64, 2), np.float32)),
    })
    eng = Engine(base_model, mode="dense", max_seq=64)
    with pytest.raises(ValueError, match="no matching base weight"):
        apply_lora(eng.params, ad)


# -- state save/restore -----------------------------------------------------------


def test_state_save_restore_continuation(base_model, tmp_path):
    """Generation after restore must equal uninterrupted generation."""
    eng = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=128,
                 kv_dtype=jnp.float32)
    ids = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    ref = list(eng.generate_tokens(ids, 12, stop_on_eog=False))

    # prefill, save, then restore into a FRESH engine and continue
    eng2 = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=128,
                  kv_dtype=jnp.float32)
    eng2.prefill(ids)
    state_file = tmp_path / "state.npz"
    save_state(eng2, state_file, tokens=ids)

    eng3 = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=128,
                  kv_dtype=jnp.float32)
    restored = load_state(eng3, state_file)
    assert restored == ids
    assert eng3.n_past == len(ids)
    # continue greedily: re-decode the last prompt token to get next logits
    # (the ≡ of the reference's session-file "token prefix" replay of 1 token)
    eng3.n_past = len(ids) - 1
    logits = eng3.decode_step(ids[-1])
    out = [int(np.argmax(logits))]
    for _ in range(len(ref) - 1):
        logits = eng3.decode_step(out[-1])
        out.append(int(np.argmax(logits)))
    assert out == ref


def test_state_mismatch_rejected(base_model, tmp_path):
    eng = Engine(base_model, mode="dense", max_seq=64)
    eng.prefill([1, 5, 9])
    f = tmp_path / "s.npz"
    save_state(eng, f)

    other = make_tiny_llama_gguf(tmp_path / "other.gguf", n_embd=128,
                                 n_head=8, n_head_kv=4, n_ff=128, n_layer=2)
    eng2 = Engine(other, mode="dense", max_seq=64)
    with pytest.raises(ValueError, match="mismatch"):
        load_state(eng2, f)


def test_slot_state_roundtrip(base_model, tmp_path):
    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.runtime.state import load_slot_state, save_slot_state

    eng = BatchEngine(base_model, n_slots=2, max_seq=64, mode="dense",
                      kv_dtype=jnp.float32, prefill_chunk=32)
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    eng.prefill_slot(1, ids)
    f = tmp_path / "slot.npz"
    save_slot_state(eng, 1, f, tokens=ids)

    eng2 = BatchEngine(base_model, n_slots=2, max_seq=64, mode="dense",
                       kv_dtype=jnp.float32, prefill_chunk=32)
    toks = load_slot_state(eng2, 0, f)  # restore into a different slot
    assert toks == ids
    assert int(eng2.n_past[0]) == len(ids)
    a = eng.decode_batch({1: 7})[1]
    b = eng2.decode_batch({0: 7})[0]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_export_lora_merged_model_matches_runtime(base_model, tmp_path):
    """export-lora output model ≡ base + runtime adapter."""
    from tpullm.tools.export_lora import export_lora

    path, _ = _make_adapter(tmp_path, base_model)
    merged_path = tmp_path / "merged.gguf"
    stats = export_lora(base_model, [path], str(merged_path), verbose=False)
    assert stats["n_merged"] == 3

    prompt_ids = None
    eng_rt = Engine(base_model, mode="dense", dtype=jnp.float32, max_seq=64,
                    kv_dtype=jnp.float32, lora=[(path, 1.0)])
    prompt_ids = eng_rt.tokenizer.tokenize("the quick", add_special=True)
    rt_logits = eng_rt.prefill(prompt_ids)

    eng_merged = Engine(str(merged_path), mode="dense", dtype=jnp.float32,
                        max_seq=64, kv_dtype=jnp.float32)
    merged_logits = eng_merged.prefill(prompt_ids)
    np.testing.assert_allclose(merged_logits, rt_logits, rtol=1e-3, atol=1e-3)
