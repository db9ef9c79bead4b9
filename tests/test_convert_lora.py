"""PEFT LoRA → GGUF adapter conversion parity (≡ convert_lora_to_gguf.py):
a real PEFT adapter converted to GGUF and applied at runtime must match
transformers' merged-adapter logits."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")

from tpullm.models.lora import load_lora_gguf  # noqa: E402
from tpullm.runtime import Engine  # noqa: E402
from tpullm.tools.convert_hf import convert_hf_to_gguf  # noqa: E402
from tpullm.tools.convert_lora import convert_lora_to_gguf  # noqa: E402


def _make_llama_with_adapter(tmp_path, alpha=8.0, rank=4):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    model = LlamaForCausalLM(LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
    ))
    model.eval()
    base_dir = tmp_path / "base"
    model.save_pretrained(base_dir, safe_serialization=True)

    lora_cfg = peft.LoraConfig(
        r=rank, lora_alpha=alpha,
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"],
        lora_dropout=0.0, bias="none", task_type="CAUSAL_LM",
    )
    pm = peft.get_peft_model(model, lora_cfg)
    # PEFT initializes lora_B to zero (identity adapter) — randomize both
    # factors so the adapter actually moves the logits
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in pm.named_parameters():
            if "lora_A" in name or "lora_B" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    pm.eval()
    lora_dir = tmp_path / "adapter"
    pm.save_pretrained(lora_dir)
    return pm, str(base_dir), str(lora_dir / "default")


def test_convert_peft_lora_matches_merged_logits(tmp_path):
    """llama is a PERMUTE_QK arch, so this exercises the lora_B permute on
    attn_q/attn_k as well as the plain projections."""
    import os

    pm, base_dir, lora_dir = _make_llama_with_adapter(tmp_path)
    if not os.path.isdir(lora_dir):  # older peft lays the adapter flat
        lora_dir = os.path.dirname(lora_dir)

    base_gguf = str(tmp_path / "base.gguf")
    convert_hf_to_gguf(base_dir, base_gguf, outtype="f32", verbose=False)
    adapter_gguf = str(tmp_path / "adapter.gguf")
    stats = convert_lora_to_gguf(lora_dir, adapter_gguf, base=base_dir,
                                 outtype="f32", verbose=False)
    assert stats["arch"] == "llama"
    assert stats["alpha"] == 8.0

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        merged = pm.merge_and_unload()
        ref = merged(torch.tensor([ids])).logits[0].numpy()

    eng = Engine(base_gguf, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32, lora=[(adapter_gguf, 1.0)])
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)

    # and the adapter must genuinely differ from base
    eng0 = Engine(base_gguf, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    assert np.abs(eng0.prefill_all_logits(ids) - got).max() > 1e-3


def test_convert_lora_metadata_and_pairs(tmp_path):
    _, base_dir, lora_dir = _make_llama_with_adapter(tmp_path, alpha=16.0,
                                                     rank=2)
    import os

    if not os.path.isdir(lora_dir):
        lora_dir = os.path.dirname(lora_dir)
    out = str(tmp_path / "a.gguf")
    convert_lora_to_gguf(lora_dir, out, base=base_dir, outtype="f32",
                         verbose=False)
    ad = load_lora_gguf(out)
    assert ad.alpha == 16.0
    # every factor pair present, correct rank, GGUF names
    assert "blk.0.attn_q.weight" in ad.tensors
    assert "blk.1.ffn_down.weight" in ad.tensors
    a, b = ad.tensors["blk.0.attn_q.weight"]
    assert a.shape == (2, 64) and b.shape == (64, 2)
    assert ad.scale_for("blk.0.attn_q.weight", 1.0) == pytest.approx(8.0)
