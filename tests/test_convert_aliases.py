"""Converter class-alias coverage: every HF architectures class the
reference registers (@ModelBase.register sweep of convert_hf_to_gguf.py)
must dispatch to a tpullm Family — via model_type, the _BY_CLASS override,
the CLASS_FALLBACK alias table, or a documented multimodal unwrap."""

import json
import os
import re

import numpy as np
import pytest

from tpullm.tools.convert_hf import ARCH_MAP, CLASS_FALLBACK, resolve_alias

REF_CONVERTER = "/root/reference/convert_hf_to_gguf.py"

# wrapper classes whose checkpoints are dispatched by their canonical
# model_type through the vl/audio text_config unwrap in convert_hf_to_gguf
# (the class name never reaches the alias table)
MM_WRAPPERS = {
    "AudioFlamingo3ForConditionalGeneration",  # audio_flamingo3 → qwen2
    "Glm4vForConditionalGeneration",           # glm4v → glm4
    "Glm4vMoeForConditionalGeneration",        # glm4v_moe → glm4_moe
    "GlmasrModel",                             # glmasr → glm4
    "Idefics3ForConditionalGeneration",        # idefics3 → llama
    "JanusForConditionalGeneration",           # janus → llama
    "KimiVLForConditionalGeneration",          # kimi_vl → deepseek_v2
    "Lfm2AudioForConditionalGeneration",       # lfm2_audio → lfm2
    "Lfm2VlForConditionalGeneration",          # lfm2_vl → lfm2
    "LightOnOCRForConditionalGeneration",      # lightonocr → mistral
    "LlavaForConditionalGeneration",           # llava → text model_type
    "Qwen2AudioForConditionalGeneration",      # qwen2_audio → qwen2
    "Qwen2_5OmniModel",                        # qwen2_5_omni → qwen2_vl
    "SmolVLMForConditionalGeneration",         # smolvlm → llama
    "UltravoxModel",                           # ultravox → llama
    "VoxtralForConditionalGeneration",         # voxtral → qwen2/llama
    "YoutuVLForConditionalGeneration",         # youtu_vl → deepseek_v2
}

# classes with no convertible text LM (towers exported by --mmproj only)
MMPROJ_ONLY = {"InternVisionModel"}


def _by_class_table():
    s = open(os.path.join(os.path.dirname(__file__), os.pardir, "tpullm",
                          "tools", "convert_hf.py")).read()
    body = re.search(r"_BY_CLASS = \{(.*?)\}", s, re.S).group(1)
    return dict(re.findall(r'"([^"]+)":\s*"([^"]+)"', body))


@pytest.mark.skipif(not os.path.exists(REF_CONVERTER),
                    reason="reference tree not present")
def test_every_reference_registered_class_dispatches():
    src = open(REF_CONVERTER).read()
    names = set()
    for m in re.finditer(r"@ModelBase\.register\(([^)]*?)\)", src, re.S):
        names.update(re.findall(r'"([^"]+)"', m.group(1)))
    assert len(names) > 150  # the sweep found the register list
    by_class = _by_class_table()
    uncovered = sorted(
        n for n in names
        if n not in by_class and n not in CLASS_FALLBACK
        and n not in MM_WRAPPERS and n not in MMPROJ_ONLY)
    assert uncovered == [], (
        f"{len(uncovered)} reference-registered classes with no tpullm "
        f"dispatch: {uncovered}")


def test_fallback_targets_resolve():
    for cls, mt in CLASS_FALLBACK.items():
        assert ARCH_MAP.get(mt), (cls, mt)


def test_resolve_alias_semantics():
    # canonical model_type wins; fallback only fires when unresolvable
    assert resolve_alias("llama", ["InternLM3ForCausalLM"]) == "llama"
    assert resolve_alias("internlm3", ["InternLM3ForCausalLM"]) == "llama"
    assert resolve_alias("weird", ["MixtralForCausalLM"]) == "mixtral"
    assert resolve_alias("youtu", ["YoutuForCausalLM"]) == "deepseek_v2"
    assert resolve_alias("unknown", ["NoSuchClass"]) == "unknown"


def test_alias_checkpoint_converts_end_to_end(tmp_path):
    """A custom-code fork (nonstandard model_type + canonical llama-family
    architectures class) converts and reloads through the alias path."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    import jax.numpy as jnp

    from tpullm.runtime import Engine
    from tpullm.tools.convert_hf import convert_hf_to_gguf

    torch.manual_seed(0)
    model = LlamaForCausalLM(LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0))
    model.eval()
    d = tmp_path / "fork"
    model.save_pretrained(d, safe_serialization=True)
    cfg = json.load(open(d / "config.json"))
    cfg["model_type"] = "internlm3"  # nonstandard fork model_type
    cfg["architectures"] = ["InternLM3ForCausalLM"]
    json.dump(cfg, open(d / "config.json", "w"))

    out = str(tmp_path / "fork.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama"

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
