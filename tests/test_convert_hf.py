"""HF→GGUF conversion parity: converted model's logits must match
transformers' (≡ convert_hf_to_gguf.py correctness, validated the way the
reference CI compares converted models)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpullm.runtime import Engine  # noqa: E402
from tpullm.tools.convert_hf import convert_hf_to_gguf  # noqa: E402


def _make_hf_llama(tmp_path, tie=False, qwen=False):
    from transformers import LlamaConfig, LlamaForCausalLM, Qwen2Config, Qwen2ForCausalLM

    kw = dict(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=tie,
    )
    torch.manual_seed(0)
    if qwen:
        model = Qwen2ForCausalLM(Qwen2Config(**kw))
    else:
        model = LlamaForCausalLM(LlamaConfig(**kw))
    model.eval()
    d = tmp_path / ("hf_qwen" if qwen else "hf_llama")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.mark.parametrize("qwen", [False, True])
def test_convert_matches_transformers_logits(tmp_path, qwen):
    model, d = _make_hf_llama(tmp_path, qwen=qwen)
    out = str(tmp_path / "m.gguf")
    stats = convert_hf_to_gguf(d, out, outtype="f32", verbose=False)
    assert stats["arch"] == ("qwen2" if qwen else "llama")

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()

    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_tied_embeddings(tmp_path):
    model, d = _make_hf_llama(tmp_path, tie=True)
    out = str(tmp_path / "tied.gguf")
    convert_hf_to_gguf(d, out, outtype="f32", verbose=False)
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.params["output"] is None  # tied head
    ids = [3, 5, 9]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_vocab_bpe(tmp_path):
    """tokenizer.json BPE vocab lands in GGUF metadata."""
    _, d = _make_hf_llama(tmp_path)
    tok = {
        "added_tokens": [
            {"id": 0, "content": "<unk>", "special": True},
            {"id": 1, "content": "<s>", "special": True},
        ],
        "model": {
            "type": "BPE",
            "vocab": {"a": 2, "b": 3, "ab": 4},
            "merges": ["a b"],
        },
    }
    json.dump(tok, open(os.path.join(d, "tokenizer.json"), "w"))
    out = str(tmp_path / "v.gguf")
    convert_hf_to_gguf(d, out, outtype="f32", verbose=False)

    from tpullm.gguf import GGUFReader

    r = GGUFReader(out)
    assert r.metadata["tokenizer.ggml.model"] == "gpt2"
    assert r.metadata["tokenizer.ggml.tokens"][:5] == ["<unk>", "<s>", "a", "b", "ab"]
    assert r.metadata["tokenizer.ggml.merges"] == ["a b"]


def test_spm_proto_parser(tmp_path):
    """Minimal SPM protobuf writer→parser roundtrip."""
    import struct

    from tpullm.tools.convert_hf import _parse_spm

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                out += bytes([b7])
                return out

    def piece(text, score, ptype):
        body = b"\x0a" + varint(len(text.encode())) + text.encode()
        body += b"\x15" + struct.pack("<f", score)
        body += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(body)) + body

    blob = piece("<unk>", 0.0, 2) + piece("▁the", -1.5, 1) + piece("<0x0A>", 0.0, 6)
    f = tmp_path / "tokenizer.model"
    f.write_bytes(blob)
    pieces = _parse_spm(str(f))
    assert pieces == [("<unk>", 0.0, 2), ("▁the", -1.5, 1), ("<0x0A>", 0.0, 6)]


def test_convert_phi3_logit_parity(tmp_path):
    """Phi-3 conversion: fused qkv_proj/gate_up_proj tensors stay fused in
    the GGUF (blk.N.attn_qkv / ffn_up) and the loader splits them."""
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(1)
    model = Phi3ForCausalLM(Phi3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_phi3"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "phi3.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "phi3"

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_olmo2_logit_parity(tmp_path):
    """OLMo-2 conversion: post-norm placement + full-width q/k norms."""
    from transformers import Olmo2Config, Olmo2ForCausalLM

    torch.manual_seed(2)
    model = Olmo2ForCausalLM(Olmo2Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_olmo2"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "olmo2.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "olmo2"

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_cohere_logit_parity(tmp_path):
    """Command-R conversion: parallel attn+FFN block, LayerNorm, tied head
    with logit_scale."""
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(3)
    model = CohereForCausalLM(CohereConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, logit_scale=0.25,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        use_qk_norm=False,
    ))
    model.eval()
    d = tmp_path / "hf_cohere"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "commandr.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "command-r"

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_granite_logit_parity(tmp_path):
    """Granite conversion: llama graph + embedding/residual/attention/logit
    multipliers (≡ llm_build_granite)."""
    from transformers import GraniteConfig, GraniteForCausalLM

    torch.manual_seed(4)
    model = GraniteForCausalLM(GraniteConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        attention_multiplier=0.015625, logits_scaling=8.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_granite"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "granite.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "granite"

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert abs(eng.hp.residual_scale - 0.22) < 1e-6
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_gpt_oss_logit_parity(tmp_path):
    """gpt-oss conversion: interleaved gate_up split, sinks, alternating
    SWA, softmax-weight routing."""
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(5)
    model = GptOssForCausalLM(GptOssConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, sliding_window=16, rope_theta=10000.0,
        rope_scaling=None,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_gptoss"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "oss.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "gpt-oss"

    ids = [3, 17, 42, 7, 19, 55]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_convert_starcoder2_logit_parity(tmp_path):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    torch.manual_seed(4)
    model = Starcoder2ForCausalLM(Starcoder2Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, use_bias=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_sc2"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "sc2.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "starcoder2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_stablelm_logit_parity(tmp_path):
    from transformers import StableLmConfig, StableLmForCausalLM

    torch.manual_seed(5)
    model = StableLmForCausalLM(StableLmConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        partial_rotary_factor=0.5, use_parallel_residual=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_slm"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "slm.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "stablelm"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_olmoe_logit_parity(tmp_path):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    torch.manual_seed(6)
    model = OlmoeForCausalLM(OlmoeConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_olmoe"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "olmoe.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "olmoe"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_gptneox_logit_parity(tmp_path):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(7)
    model = GPTNeoXForCausalLM(GPTNeoXConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.5,
        use_parallel_residual=True, rotary_emb_base=10000,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_neox"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "neox.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "gptneox"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_t5_logit_parity(tmp_path):
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(8)
    model = T5ForConditionalGeneration(T5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=16,
        dense_act_fn="relu", is_gated_act=False, tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    ))
    model.eval()
    d = tmp_path / "hf_t5"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "t5.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "t5"

    enc_ids = [3, 17, 42, 7]
    dec_ids = [0, 5, 9]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([enc_ids]),
                    decoder_input_ids=torch.tensor([dec_ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    logits = [eng.prefill(enc_ids)]  # decoder step on start token (=0)
    logits.append(eng.decode_step(dec_ids[1]))
    logits.append(eng.decode_step(dec_ids[2]))
    got = np.stack(logits)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_convert_mamba_logit_parity(tmp_path):
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(9)
    model = MambaForCausalLM(MambaConfig(
        vocab_size=96, hidden_size=64, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, use_bias=False,
        use_conv_bias=True, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_mamba"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "mamba.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "mamba"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_convert_qwen3next_logit_parity(tmp_path):
    """Gold standard for the gated DeltaNet hybrid: tiny random HF
    Qwen3NextForCausalLM → GGUF → engine logits must match transformers."""
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    torch.manual_seed(11)
    model = Qwen3NextForCausalLM(Qwen3NextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
        linear_conv_kernel_dim=4, linear_key_head_dim=16,
        linear_value_head_dim=16, linear_num_key_heads=2,
        linear_num_value_heads=4,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        moe_intermediate_size=32, shared_expert_intermediate_size=48,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_q3n"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "q3n.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen3next"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_mixtral_logit_parity(tmp_path):
    """Mixtral = LLM_ARCH_LLAMA with a renormalized softmax MoE FFN."""
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(12)
    model = MixtralForCausalLM(MixtralConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_mixtral"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "mixtral.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_gemma_v1_logit_parity(tmp_path):
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(13)
    model = GemmaForCausalLM(GemmaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, hidden_act="gelu_pytorch_tanh",
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_gemma"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "gemma.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "gemma"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_deepseek_v3_logit_parity(tmp_path):
    """DeepseekV3: MLA (q-LoRA + kv compression), sigmoid routing with
    selection bias, routed scaling, shared expert, dense lead layer."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(14)
    model = DeepseekV3ForCausalLM(DeepseekV3Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=24, kv_lora_rank=24,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        scoring_func="sigmoid", topk_method="noaux_tc",
        n_group=1, topk_group=1,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_dsv3"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "dsv3.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "deepseek2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.head_dim_k_mla == 24 and eng.hp.n_head_kv == 1
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_mamba2_logit_parity(tmp_path):
    """Mamba2 SSD: converted A is -exp(A_log), grouped gated ssm_norm."""
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(15)
    model = Mamba2ForCausalLM(Mamba2Config(
        # n_groups=1: HF's MambaRMSNormGated normalizes over the full
        # width while the reference (and original mamba_ssm) normalize per
        # group — the oracles only agree at one group
        vocab_size=96, hidden_size=64, state_size=16, head_dim=16,
        num_heads=8, expand=2, num_hidden_layers=2, n_groups=1,
        conv_kernel=4, use_bias=False, use_conv_bias=True,
        chunk_size=16, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_mamba2"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "mamba2.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "mamba2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref[:, :96], rtol=2e-3, atol=2e-3)


def test_convert_gemma3n_logit_parity(tmp_path):
    """Gemma3n: AltUp stack, Laurel, per-layer embeddings, shared-KV tail,
    activation sparsity, softcapped logits — vs transformers."""
    from transformers import Gemma3nTextConfig, Gemma3nForCausalLM

    torch.manual_seed(16)
    cfg = Gemma3nTextConfig(
        vocab_size=96, vocab_size_per_layer_input=96,
        hidden_size=64, hidden_size_per_layer_input=16,
        intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        altup_num_inputs=4, altup_active_idx=0, laurel_rank=8,
        num_kv_shared_layers=1, sliding_window=8,
        layer_types=["sliding_attention", "sliding_attention",
                     "full_attention", "sliding_attention"],
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0],
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        final_logit_softcapping=30.0,
        max_position_embeddings=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    model = Gemma3nForCausalLM(cfg)
    model.eval()
    d = tmp_path / "hf_g3n"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "g3n.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "gemma3n"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.swa_layers == (1, 1, 0, 1) and eng.hp.n_kv_shared == 1
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_convert_falcon_h1_logit_parity(tmp_path):
    """FalconH1: parallel attention + mamba2 SSD per layer, MuP multipliers
    folded into the weights at conversion."""
    from transformers import FalconH1Config, FalconH1ForCausalLM

    torch.manual_seed(17)
    model = FalconH1ForCausalLM(FalconH1Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, mamba_d_ssm=64, mamba_n_heads=4, mamba_d_head=16,
        mamba_n_groups=1, mamba_d_state=16, mamba_d_conv=4,
        mamba_rms_norm=True,
        attention_in_multiplier=0.5, attention_out_multiplier=2.0,
        key_multiplier=1.5, ssm_in_multiplier=0.8, ssm_out_multiplier=1.25,
        mlp_multipliers=[0.7, 1.3], ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05],
        embedding_multiplier=2.0, lm_head_multiplier=0.5,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_fh1"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "fh1.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "falcon-h1"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_convert_glm4moe_logit_parity(tmp_path):
    """GLM4-MoE: sigmoid-scored routing with selection bias, routed scaling,
    ungated shared expert, dense lead, half-rotary NEOX rope."""
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    torch.manual_seed(18)
    model = Glm4MoeForCausalLM(Glm4MoeConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=True, use_qk_norm=True, partial_rotary_factor=0.5,
        attention_bias=False, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_glm4moe"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "glm4moe.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "glm4moe"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.rope.style == "neox" and eng.hp.rope.dims == 8
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_qwen3_moe_logit_parity(tmp_path):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(19)
    model = Qwen3MoeForCausalLM(Qwen3MoeConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, norm_topk_prob=True, decoder_sparse_step=1,
        mlp_only_layers=[], max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_q3moe"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "q3moe.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen3moe"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_gemma2_logit_parity(tmp_path):
    """gemma2: pre+post norms, logit softcaps, alternating SWA."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(20)
    model = Gemma2ForCausalLM(Gemma2Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, hidden_activation="gelu_pytorch_tanh",
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, query_pre_attn_scalar=16,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_g2"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "g2.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "gemma2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_convert_ernie4_5_moe_logit_parity(tmp_path):
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    torch.manual_seed(23)
    model = Ernie4_5_MoeForCausalLM(Ernie4_5_MoeConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        moe_num_experts=4, moe_k=2, moe_intermediate_size=32,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_ernie_moe"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "ernie_moe.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "ernie4_5-moe"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_hunyuan_moe_logit_parity(tmp_path):
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    torch.manual_seed(29)
    model = HunYuanMoEV1ForCausalLM(HunYuanMoEV1Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, moe_topk=2,
        max_position_embeddings=128, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    ))
    model.eval()
    d = tmp_path / "hf_hy_moe"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "hy_moe.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "hunyuan-moe"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_granitemoeshared_logit_parity(tmp_path):
    from transformers import GraniteMoeSharedConfig, GraniteMoeSharedForCausalLM

    torch.manual_seed(31)
    model = GraniteMoeSharedForCausalLM(GraniteMoeSharedConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=48, max_position_embeddings=128,
        rope_theta=10000.0, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attention_multiplier=0.25, embedding_multiplier=2.0,
        residual_multiplier=0.5, logits_scaling=2.0,
    ))
    model.eval()
    d = tmp_path / "hf_gms"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "gms.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "granitemoe"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_granitemoehybrid_logit_parity(tmp_path):
    from transformers import (
        GraniteMoeHybridConfig,
        GraniteMoeHybridForCausalLM,
    )

    torch.manual_seed(37)
    model = GraniteMoeHybridForCausalLM(GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=48, layer_types=["mamba", "attention"],
        mamba_d_state=16, mamba_n_heads=4, mamba_d_head=16, mamba_expand=1,
        mamba_n_groups=1, mamba_d_conv=4, mamba_conv_bias=True,
        max_position_embeddings=128, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, attention_multiplier=0.2, embedding_multiplier=2.0,
        residual_multiplier=0.5, logits_scaling=2.0,
    ))
    model.eval()
    d = tmp_path / "hf_gmh"
    model.save_pretrained(d, safe_serialization=True)
    out = str(tmp_path / "gmh.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "granitehybrid"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_convert_qwen2_vl_text_and_mmproj(tmp_path):
    """qwen2-VL checkpoints convert twice: text stack (logit parity on a
    text-only prompt) and --mmproj vision tower (loads as Qwen2VLVision and
    reproduces the HF visual forward)."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig,
    )

    torch.manual_seed(41)
    vcfg = Qwen2VLVisionConfig(
        depth=2, embed_dim=32, hidden_size=48, num_heads=2, in_chans=3,
        mlp_ratio=2, patch_size=4, spatial_merge_size=2,
        temporal_patch_size=2)
    cfg = Qwen2VLConfig(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling={"type": "mrope", "mrope_section": [4, 1, 1]},
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        vision_config=vcfg.to_dict(), image_token_id=95, video_token_id=94,
        vision_start_token_id=93, vision_end_token_id=92)
    model = Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_q2vl"
    model.save_pretrained(d, safe_serialization=True)

    # text stack
    out = str(tmp_path / "q2vl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen2vl"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    # vision tower
    from tpullm.mtmd import Qwen2VLVision, load_vision
    from tpullm.tools.convert_hf import convert_hf_mmproj
    from test_mtmd import _qwen_hf_patches

    mm = str(tmp_path / "q2vl.mmproj.gguf")
    mstats = convert_hf_mmproj(str(d), mm, verbose=False)
    assert mstats["n_tensors"] > 10
    tower = load_vision(mm)
    assert isinstance(tower, Qwen2VLVision)
    visual = (model.model.visual
              if hasattr(model.model, "visual") else model.visual).float()
    img = np.random.default_rng(5).normal(size=(3, 16, 24)).astype(np.float32)
    got_emb = tower.encode_pixels(img)
    with torch.no_grad():
        flat = torch.from_numpy(_qwen_hf_patches(img, 2, 4, 2))
        ref_emb = visual(flat, grid_thw=torch.tensor([[1, 4, 6]])).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_qwen25_vl_text_and_mmproj(tmp_path):
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )

    torch.manual_seed(43)
    vcfg = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=32, out_hidden_size=48, intermediate_size=64,
        num_heads=2, patch_size=4, spatial_merge_size=2,
        temporal_patch_size=2, window_size=8, fullatt_block_indexes=[1, 3])
    cfg = Qwen2_5_VLConfig(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling={"type": "mrope", "mrope_section": [4, 1, 1]},
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        vision_config=vcfg.to_dict(), image_token_id=95, video_token_id=94,
        vision_start_token_id=93, vision_end_token_id=92)
    model = Qwen2_5_VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_q25vl"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "q25vl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen2vl"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import Qwen2VLVision, load_vision
    from tpullm.tools.convert_hf import convert_hf_mmproj
    from test_mtmd import _qwen_hf_patches

    mm = str(tmp_path / "q25vl.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Qwen2VLVision) and tower.is_25
    assert tower.n_wa_pattern == 2
    visual = (model.model.visual
              if hasattr(model.model, "visual") else model.visual).float()
    img = np.random.default_rng(7).normal(size=(3, 16, 16)).astype(np.float32)
    got_emb = tower.encode_pixels(img)
    with torch.no_grad():
        flat = torch.from_numpy(_qwen_hf_patches(img, 2, 4, 2))
        ref_emb = visual(flat, grid_thw=torch.tensor([[1, 4, 4]])).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_gemma3_vl_text_and_mmproj(tmp_path):
    """Full Gemma3 multimodal checkpoint: text stack parity + --mmproj
    SigLIP tower export (AvgPool projector with folded +1 RMS norm)."""
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    torch.manual_seed(47)
    cfg = Gemma3Config(
        text_config=dict(
            vocab_size=262208, hidden_size=48, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, sliding_window=8,
            max_position_embeddings=128, rope_theta=10000.0),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=4,
            hidden_act="gelu_pytorch_tanh"),
        mm_tokens_per_image=16,
        image_token_index=262144, boi_token_index=255999,
        eoi_token_index=256000,
    )
    model = Gemma3ForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_g3vl"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "g3vl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "gemma3"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)

    from tpullm.mtmd import Gemma3Vision, load_vision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "g3vl.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Gemma3Vision)
    visual = (model.model.vision_tower
              if hasattr(model.model, "vision_tower") else model.vision_tower)
    proj = (model.model.multi_modal_projector
            if hasattr(model.model, "multi_modal_projector")
            else model.multi_modal_projector)
    px = np.random.default_rng(13).normal(size=(3, 32, 32)).astype(np.float32)
    got_emb = np.asarray(tower._encode(tower.params, px))
    with torch.no_grad():
        hidden = visual(torch.from_numpy(px[None])).last_hidden_state
        ref_emb = proj(hidden)[0].numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=3e-3, atol=3e-3)


def test_convert_mistral3_text_and_mmproj(tmp_path):
    """Mistral-Small-3.1-style checkpoint: mistral text stack + --mmproj
    pixtral tower with the Mistral3 patch merger."""
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration

    torch.manual_seed(53)
    cfg = Mistral3Config(
        text_config=dict(
            model_type="mistral", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=12,
            rope_theta=10000.0, max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, head_dim=16, image_size=32, patch_size=4,
            rope_theta=10000.0),
        spatial_merge_size=2, image_token_index=99,
        vision_feature_layer=-1, multimodal_projector_bias=False)
    model = Mistral3ForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_m3"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "m3.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "mistral3"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.pixtral import PixtralVision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "m3.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, PixtralVision)
    P, rows, cols = 4, 8, 8
    px = np.random.default_rng(17).normal(
        size=(3, rows * P, cols * P)).astype(np.float32)
    patches = px.reshape(3, rows, P, cols, P).transpose(1, 3, 0, 2, 4)
    patches = patches.reshape(rows * cols, 3 * P * P).astype(np.float32)
    got_emb = tower.encode_grid(patches, rows, cols)
    visual = (model.model.vision_tower
              if hasattr(model.model, "vision_tower") else model.vision_tower)
    proj = (model.model.multi_modal_projector
            if hasattr(model.model, "multi_modal_projector")
            else model.multi_modal_projector)
    with torch.no_grad():
        hidden = visual(torch.from_numpy(px[None]),
                        image_sizes=torch.tensor([[rows * P, cols * P]]))
        hidden = hidden.last_hidden_state if hasattr(
            hidden, "last_hidden_state") else hidden[0]
        ref_emb = proj(hidden.reshape(-1, 32),
                       image_sizes=torch.tensor([[rows * P, cols * P]]))
        ref_emb = ref_emb.numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_internvl_text_and_mmproj(tmp_path):
    """InternVL wrapper: the qwen2 language model converts under its own
    arch; --mmproj exports the InternViT tower + pixel-shuffle projector."""
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    torch.manual_seed(59)
    cfg = InternVLConfig(
        text_config=dict(
            model_type="qwen2", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=[32, 32], patch_size=[4, 4],
            use_absolute_position_embeddings=True, layer_norm_eps=1e-6),
        image_token_id=99, downsample_ratio=0.5)
    model = InternVLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_ivl"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "ivl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.internvl import InternVLVision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "ivl.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, InternVLVision)
    P, side = 4, 8
    px = np.random.default_rng(19).normal(
        size=(3, side * P, side * P)).astype(np.float32)
    patches = px.reshape(3, side, P, side, P).transpose(1, 3, 0, 2, 4)
    patches = patches.reshape(side * side, 3 * P * P).astype(np.float32)
    got_emb = tower.encode_grid(patches, side, side)
    with torch.no_grad():
        feats = model.get_image_features(
            torch.from_numpy(px[None]),
            vision_feature_layer=-1,
            vision_feature_select_strategy="default")
        ref_emb = feats[0].numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_llava_text_and_mmproj(tmp_path):
    """LLaVA: llama text under its own arch; --mmproj exports the CLIP
    tower truncated at vision_feature_layer=-2 with quick_gelu recorded."""
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    torch.manual_seed(61)
    cfg = LlavaConfig(
        text_config=dict(
            model_type="llama", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=32, patch_size=4,
            projection_dim=48, hidden_act="quick_gelu"),
        image_token_index=99)
    model = LlavaForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_llava"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "llava.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import ClipVision, load_vision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "llava.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, ClipVision)
    assert tower.n_layer == 2 and tower.use_gelu is False  # vfl=-2 truncation
    px = np.random.default_rng(23).normal(size=(1, 3, 32, 32)).astype(
        np.float32)
    got_emb = tower.encode(px)[0]
    with torch.no_grad():
        ref_emb = model.get_image_features(
            torch.from_numpy(px),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        if isinstance(ref_emb, (list, tuple)):
            ref_emb = ref_emb[0]
        ref_emb = ref_emb.reshape(-1, 48).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_qwen2_audio_text_and_mmproj(tmp_path):
    """Qwen2-Audio: qwen2 text under its own arch; --mmproj exports the
    whisper encoder (+stride-2 avg pool) and fc projector, pinned against
    the HF audio tower + projector forward."""
    from transformers import (
        Qwen2AudioConfig,
        Qwen2AudioForConditionalGeneration,
    )

    torch.manual_seed(67)
    cfg = Qwen2AudioConfig(
        audio_config=dict(
            d_model=32, encoder_layers=2, encoder_attention_heads=2,
            encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=50),
        text_config=dict(
            model_type="qwen2", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=128),
        audio_token_index=99)
    model = Qwen2AudioForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_q2a"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "q2a.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import WhisperAudioEncoder
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "q2a.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    enc = WhisperAudioEncoder(mm)
    # HF expects mel length 2*max_source_positions (stride-2 conv)
    mel = np.random.default_rng(29).normal(size=(16, 100)).astype(np.float32)
    got_emb = enc.encode_mel(mel)
    tower = (model.audio_tower if hasattr(model, "audio_tower")
             else model.model.audio_tower)
    proj = (model.multi_modal_projector
            if hasattr(model, "multi_modal_projector")
            else model.model.multi_modal_projector)
    with torch.no_grad():
        hidden = tower(torch.from_numpy(mel[None])).last_hidden_state
        ref_emb = proj(hidden)[0].numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_voxtral_text_and_mmproj(tmp_path):
    """Voxtral: llama text + --mmproj whisper tower with frame stacking and
    the bias-free GELU MLP projector, pinned against HF get_audio_features."""
    from transformers import VoxtralConfig, VoxtralForConditionalGeneration

    torch.manual_seed(71)
    cfg = VoxtralConfig(
        audio_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, num_mel_bins=16,
            max_source_positions=52),
        text_config=dict(
            model_type="llama", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=128),
        audio_token_id=99)
    model = VoxtralForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_vox"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "vox.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import WhisperAudioEncoder
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "vox.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    enc = WhisperAudioEncoder(mm)
    assert enc.proj_type == "voxtral" and enc.stack_factor == 4
    mel = np.random.default_rng(31).normal(size=(16, 104)).astype(np.float32)
    got_emb = enc.encode_mel(mel)
    with torch.no_grad():
        ref_emb = model.get_audio_features(
            torch.from_numpy(mel[None])).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_idefics3_text_and_mmproj(tmp_path):
    """SmolVLM/Idefics3: llama text under its own arch; --mmproj exports the
    SigLIP tower + pixel-shuffle fc projector, pinned against the HF
    vision tower + connector forward."""
    from transformers import Idefics3Config, Idefics3ForConditionalGeneration

    torch.manual_seed(73)
    cfg = Idefics3Config(
        text_config=dict(
            model_type="llama", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=4),
        scale_factor=2, image_token_id=99)
    model = Idefics3ForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_idf"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "idf.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.siglip import Idefics3Vision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "idf.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Idefics3Vision)
    px = np.random.default_rng(37).normal(size=(3, 32, 32)).astype(np.float32)
    got_emb = np.asarray(tower._encode(tower.params, jnp.asarray(px)))
    vt = (model.model.vision_model
          if hasattr(model.model, "vision_model") else model.vision_model)
    conn = (model.model.connector
            if hasattr(model.model, "connector") else model.connector)
    with torch.no_grad():
        hidden = vt(torch.from_numpy(px[None])).last_hidden_state
        ref_emb = conn(hidden)[0].numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_janus_text_and_mmproj(tmp_path):
    """Janus-Pro: llama text (model.language_model.* prefix, generation
    stack skipped); --mmproj exports the SigLIP tower + 2-layer MLP
    aligner, pinned against HF JanusModel.get_image_features."""
    from transformers import JanusConfig, JanusForConditionalGeneration

    torch.manual_seed(74)
    cfg = JanusConfig(
        text_config=dict(
            model_type="llama", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=32, patch_size=4, mlp_ratio=2),
        vq_config=dict(embed_dim=8, num_embeddings=16, base_channels=32,
                       resolution=32),
        image_token_id=99)
    model = JanusForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_janus"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "janus.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.siglip import JanusVision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "janus.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, JanusVision)
    assert tower.use_gelu  # janus vision hidden_act is exact gelu
    px = np.random.default_rng(41).normal(size=(3, 32, 32)).astype(np.float32)
    got_emb = np.asarray(tower._encode(tower.params, jnp.asarray(px)))
    with torch.no_grad():
        ref_emb = model.model.get_image_features(
            torch.from_numpy(px[None]))[0].numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_lfm2_vl_text_and_mmproj(tmp_path):
    """LFM2-VL: lfm2 hybrid text under its own arch; --mmproj exports the
    SigLIP2-NaFlex tower (dynamic grid, antialiased position resize) +
    pixel-unshuffle MLP projector, pinned against HF
    Lfm2VlModel.get_image_features at a non-square, non-native grid."""
    from transformers import Lfm2VlConfig, Lfm2VlForConditionalGeneration

    torch.manual_seed(75)
    cfg = Lfm2VlConfig(
        text_config=dict(
            model_type="lfm2", vocab_size=100, hidden_size=48,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            layer_types=["conv", "full_attention"], conv_L_cache=3,
            max_position_embeddings=128, block_ff_dim=64,
            block_multiple_of=16, block_auto_adjust_ff_dim=False),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_patches=64, patch_size=4),
        downsample_factor=2, image_token_id=99)
    model = Lfm2VlForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_lfm2vl"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "lfm2vl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "lfm2"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.siglip import Lfm2Vision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "lfm2vl.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Lfm2Vision)
    # 16×24 image → 4×6 patch grid (≠ native 8×8 → position resize),
    # downsampled 2× → 2×3 = 6 output tokens
    P, H, W = 4, 16, 24
    rng = np.random.default_rng(43)
    img = rng.normal(size=(H, W, 3)).astype(np.float32)
    got_emb = np.asarray(tower._encode(
        tower.params, jnp.asarray(img.transpose(2, 0, 1))))
    assert got_emb.shape[0] == (H // P // 2) * (W // P // 2)
    # HF NaFlex input: HWC-flattened patches in raster order
    patches = (img.reshape(H // P, P, W // P, P, 3)
               .transpose(0, 2, 1, 3, 4).reshape(-1, P * P * 3))
    with torch.no_grad():
        ref_emb = model.model.get_image_features(
            torch.from_numpy(patches[None]),
            torch.tensor([[H // P, W // P]]),
            torch.ones(1, patches.shape[0], dtype=torch.long))
    ref_emb = ref_emb[0].reshape(-1, ref_emb[0].shape[-1]).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)

    # preprocessing snaps to patch·merge multiples (calc_size_preserved_ratio)
    th, tw = tower._target_size(100, 190)
    assert th % (P * 2) == 0 and tw % (P * 2) == 0
    emb2 = tower.encode_image((rng.random((100, 190, 3)) * 255).astype(np.uint8))
    assert emb2.shape[0] == (th // P // 2) * (tw // P // 2)


def test_convert_glm4v_text_and_mmproj(tmp_path):
    """GLM-4V: glm4 text under its own arch (text-only M-RoPE ≡ standard
    interleaved partial rotary); --mmproj exports the RMS-norm M-RoPE ViT
    with bicubic-resized positions, conv patch-merger and gated-MLP
    projector, pinned against HF Glm4vVisionModel at a non-native grid."""
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    torch.manual_seed(76)
    cfg = Glm4vConfig(
        text_config=dict(
            vocab_size=100, hidden_size=48, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0,
            rope_scaling=dict(rope_type="default", mrope_section=[2, 2, 2])),
        vision_config=dict(
            hidden_size=32, depth=2, num_heads=2, intermediate_size=40,
            out_hidden_size=48, image_size=32, patch_size=4,
            spatial_merge_size=2, temporal_patch_size=2),
        image_token_id=99)
    model = Glm4vForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_glm4v"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "glm4v.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "glm4"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.glm4v import Glm4vVision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "glm4v.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Glm4vVision)
    # 16×24 image → 4×6 patch grid (≠ native 8×8 → bicubic position resize),
    # merged 2× → 2×3 = 6 output tokens
    P, H, W = 4, 16, 24
    rng = np.random.default_rng(44)
    px = rng.normal(size=(3, H, W)).astype(np.float32)
    got_emb = tower.encode_pixels(px)
    assert got_emb.shape == (6, 48)
    # HF input: merge-block-ordered patches, still frame duplicated on the
    # temporal axis, flattened (c, t, py, px)
    m = 2
    ph, pw = H // P, W // P
    x = px.reshape(3, ph // m, m, P, pw // m, m, P)
    patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3, P, P)
    patches = np.repeat(patches[:, :, None], 2, axis=2).reshape(ph * pw, -1)
    with torch.no_grad():
        ref_emb = model.model.visual(
            torch.from_numpy(patches),
            grid_thw=torch.tensor([[1, ph, pw]])).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_llama4_vl_text_and_mmproj(tmp_path):
    """Llama-4 multimodal: MoE text under the llama4 arch; --mmproj exports
    the CLS-tailed 2-D-rope ViT + pixel shuffle + double-GELU adapter +
    projector, pinned against HF Llama4VisionModel + multi_modal_projector."""
    from transformers import Llama4Config, Llama4ForConditionalGeneration

    torch.manual_seed(77)
    cfg = Llama4Config(
        text_config=dict(
            vocab_size=96, hidden_size=64, intermediate_size=32,
            intermediate_size_mlp=128, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=2, num_experts_per_tok=1,
            interleave_moe_layer_step=2, attention_chunk_size=8,
            head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
            pad_token_id=0, bos_token_id=1, eos_token_id=2),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=16, patch_size=4,
            pixel_shuffle_ratio=0.5, projector_input_dim=48,
            projector_output_dim=48, vision_output_dim=48),
        image_token_id=95)
    model = Llama4ForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_llama4vl"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "llama4vl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "llama4"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.llama4 import Llama4Vision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "llama4vl.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Llama4Vision)
    px = np.random.default_rng(45).normal(size=(3, 16, 16)).astype(np.float32)
    got_emb = np.asarray(tower._encode(tower.params, jnp.asarray(px)))
    assert got_emb.shape == (4, 64)  # 4×4 patches → shuffle 2× → 4 tokens
    with torch.no_grad():
        vt = getattr(model, "model", model)
        hs = vt.vision_model(torch.from_numpy(px[None])).last_hidden_state
        ref_emb = vt.multi_modal_projector(hs)[0].numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_convert_qwen3vl_text_and_mmproj(tmp_path):
    """Qwen3-VL: qwen3vl text arch (qwen3 graph + m-rope sections kv);
    --mmproj exports the deepstack ViT — align-corners bilinear position
    interpolation, fused-qkv M-RoPE blocks, per-layer deepstack mergers and
    the main merger — pinned against HF Qwen3VLVisionModel (output =
    main ‖ deepstack features)."""
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    torch.manual_seed(78)
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=100, hidden_size=48, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rope_theta=10000.0,
            rope_scaling=dict(rope_type="default", mrope_section=[4, 2, 2])),
        vision_config=dict(
            hidden_size=32, depth=3, num_heads=2, intermediate_size=40,
            out_hidden_size=48, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1]),
        image_token_id=99)
    model = Qwen3VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_qwen3vl"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "qwen3vl.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen3vl"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import load_vision
    from tpullm.mtmd.qwen_vl import Qwen3VLVision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "qwen3vl.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)
    tower = load_vision(mm)
    assert isinstance(tower, Qwen3VLVision)
    # 16×24 → 4×6 patches (pw=6 ≠ grid side 4 → interpolated positions);
    # merged 2× → 6 tokens; out dim 48·(1+2 deepstack) = 144
    P, H, W = 4, 16, 24
    rng = np.random.default_rng(46)
    px = rng.normal(size=(3, H, W)).astype(np.float32)
    got_emb = tower.encode_pixels(px)
    assert got_emb.shape == (6, 144)
    m = 2
    ph, pw = H // P, W // P
    x = px.reshape(3, ph // m, m, P, pw // m, m, P)
    patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3, P, P)
    patches = np.repeat(patches[:, :, None], 2, axis=2).reshape(ph * pw, -1)
    with torch.no_grad():
        vt = getattr(model, "model", model)
        main, ds = vt.visual(torch.from_numpy(patches),
                             grid_thw=torch.tensor([[1, ph, pw]]))
        ref_emb = torch.cat([main] + list(ds), dim=-1).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)


def test_qwen3vl_multimodal_prefill_parity(tmp_path):
    """Full multimodal prefill: M-RoPE position streams (get_rope_index
    semantics) + deepstack residual injection at early layers, pinned
    against the HF Qwen3VL forward with pixel_values. Also checks the
    decode-position counter (rope trails cache slots after image grids)."""
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    torch.manual_seed(79)
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=100, hidden_size=48, intermediate_size=64,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rope_theta=10000.0,
            rope_scaling=dict(rope_type="default", mrope_section=[4, 2, 2])),
        vision_config=dict(
            hidden_size=32, depth=3, num_heads=2, intermediate_size=40,
            out_hidden_size=48, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1]),
        image_token_id=99, vision_start_token_id=98)
    model = Qwen3VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_qwen3vl_mm"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "q3vl_mm.gguf")
    convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "q3vl_mm.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)

    # image: 16×24 → 4×6 patch grid → 2×3 = 6 llm tokens
    P, H, W = 4, 16, 24
    rng = np.random.default_rng(47)
    px = rng.normal(size=(3, H, W)).astype(np.float32)
    m = 2
    ph, pw = H // P, W // P
    x = px.reshape(3, ph // m, m, P, pw // m, m, P)
    patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3, P, P)
    patches = np.repeat(patches[:, :, None], 2, axis=2).reshape(ph * pw, -1)

    pre, post = [3, 17, 42, 98], [7, 19]  # 98 = vision_start
    n_img = (ph // m) * (pw // m)
    ids = pre + [99] * n_img + post
    input_ids = torch.tensor([ids])
    grid = torch.tensor([[1, ph, pw]])
    with torch.no_grad():
        hf_out = model(input_ids=input_ids,
                       pixel_values=torch.from_numpy(patches),
                       image_grid_thw=grid)
        ref_last = hf_out.logits[0, -1].numpy()
        hf_pos = model.model.get_rope_index(input_ids,
                                            image_grid_thw=grid)[0].numpy()

    from tpullm.mtmd import load_vision

    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    tower = load_vision(mm)
    emb = tower.encode_pixels(px)
    E = eng.hp.n_embd
    k = emb.shape[1] // E - 1
    main, ds = emb[:, :E], emb[:, E:].reshape(n_img, k, E)

    tok_embd = np.asarray(eng.params["tok_embd"], np.float32)
    embds = np.concatenate([tok_embd[pre], main, tok_embd[post]], 0)
    n = len(ids)
    # position streams: text runs advance all; image pins t, sweeps h/w
    st = len(pre)
    g = np.arange(n_img, dtype=np.int32)
    gw = pw // m
    img_pos = np.stack([np.full(n_img, st), st + g // gw, st + g % gw,
                        np.full(n_img, st)]).astype(np.int32)
    st2 = st + max(ph // m, pw // m)
    tail = np.arange(st2, st2 + len(post), dtype=np.int32)
    positions = np.concatenate([
        np.broadcast_to(np.arange(st, dtype=np.int32), (4, st)).copy(),
        img_pos, np.broadcast_to(tail, (4, len(post))).copy()], axis=1)
    # our streams must equal HF get_rope_index (t, h, w)
    np.testing.assert_array_equal(positions[:3], hf_pos[:, 0])

    deepstack = np.zeros((k, n, E), np.float32)
    deepstack[:, st:st + n_img] = ds.transpose(1, 0, 2)
    got_last = eng.prefill_embeddings(embds, positions=positions,
                                      deepstack=deepstack)
    np.testing.assert_allclose(got_last, ref_last, rtol=2e-3, atol=2e-3)

    # one decode step: rope position = mrope counter, not cache slot
    nxt = 23
    with torch.no_grad():
        ref2 = model(input_ids=torch.tensor([ids + [nxt]]),
                     pixel_values=torch.from_numpy(patches),
                     image_grid_thw=grid).logits[0, -1].numpy()
    eng.rope_pos_delta = int(positions[:, -1].max()) + 1 - eng.n_past
    got2 = eng.decode_step(nxt)
    np.testing.assert_allclose(got2, ref2, rtol=2e-3, atol=2e-3)


def test_qwen2vl_multimodal_prefill_parity(tmp_path):
    """Qwen2-VL multimodal prefill: chunked M-RoPE sections (TTT…HHH…WWW)
    + grid position streams, pinned against the HF forward with
    pixel_values."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    torch.manual_seed(80)
    cfg = Qwen2VLConfig(
        vocab_size=100, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling=dict(rope_type="default", mrope_section=[2, 2, 2]),
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=48, num_heads=2,
            mlp_ratio=2, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, in_channels=3),
        image_token_id=99, vision_start_token_id=98, vision_end_token_id=97)
    model = Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_qwen2vl_mm"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "q2vl_mm.gguf")
    convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "q2vl_mm.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)

    P, H, W = 4, 16, 24
    rng = np.random.default_rng(48)
    px = rng.normal(size=(3, H, W)).astype(np.float32)
    m = 2
    ph, pw = H // P, W // P
    x = px.reshape(3, ph // m, m, P, pw // m, m, P)
    patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3, P, P)
    patches = np.repeat(patches[:, :, None], 2, axis=2).reshape(ph * pw, -1)

    pre, post = [3, 17, 42, 98], [97, 19]
    n_img = (ph // m) * (pw // m)
    ids = pre + [99] * n_img + post
    input_ids = torch.tensor([ids])
    grid = torch.tensor([[1, ph, pw]])
    with torch.no_grad():
        ref_last = model(input_ids=input_ids,
                         pixel_values=torch.from_numpy(patches),
                         image_grid_thw=grid).logits[0, -1].numpy()
        hf_pos = model.model.get_rope_index(input_ids,
                                            image_grid_thw=grid)[0].numpy()

    from tpullm.mtmd import load_vision

    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.rope.sections and not eng.hp.rope.mrope_interleaved
    tower = load_vision(mm)
    emb = np.asarray(tower.encode_pixels(px), np.float32)
    assert tower.last_grid == (ph // m, pw // m)

    tok_embd = np.asarray(eng.params["tok_embd"], np.float32)
    embds = np.concatenate([tok_embd[pre], emb, tok_embd[post]], 0)
    st = len(pre)
    g = np.arange(n_img, dtype=np.int32)
    gw = pw // m
    img_pos = np.stack([np.full(n_img, st), st + g // gw, st + g % gw,
                        np.full(n_img, st)]).astype(np.int32)
    st2 = st + max(ph // m, pw // m)
    tail = np.arange(st2, st2 + len(post), dtype=np.int32)
    positions = np.concatenate([
        np.broadcast_to(np.arange(st, dtype=np.int32), (4, st)).copy(),
        img_pos, np.broadcast_to(tail, (4, len(post))).copy()], axis=1)
    np.testing.assert_array_equal(positions[:3], hf_pos[:, 0])
    got_last = eng.prefill_embeddings(embds, positions=positions)
    np.testing.assert_allclose(got_last, ref_last, rtol=2e-3, atol=2e-3)


def test_convert_qwen25_omni_text_vision_audio(tmp_path):
    """Qwen2.5-Omni thinker: qwen2vl text arch; ONE dual-modality --mmproj
    with the 2.5-VL vision half (separate q/k/v) and the windowed whisper
    audio half (per-window conv/positions/attention + avg pool), each
    pinned against the HF thinker towers."""
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniThinkerConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration)

    torch.manual_seed(81)
    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=dict(
            d_model=32, encoder_layers=2, encoder_attention_heads=2,
            encoder_ffn_dim=48, num_mel_bins=16, output_dim=48, n_window=4,
            max_source_positions=200),
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=2, intermediate_size=40,
            out_hidden_size=48, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, fullatt_block_indexes=[1], window_size=8,
            in_channels=3),
        text_config=dict(
            vocab_size=100, hidden_size=48, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0,
            rope_scaling=dict(rope_type="default", mrope_section=[2, 2, 2])),
        audio_token_index=96, image_token_index=99, video_token_index=97)
    model = Qwen2_5OmniThinkerForConditionalGeneration(cfg)
    model.eval()
    d = tmp_path / "hf_omni"
    model.save_pretrained(d, safe_serialization=True)

    out = str(tmp_path / "omni.gguf")
    stats = convert_hf_to_gguf(str(d), out, outtype="f32", verbose=False)
    assert stats["arch"] == "qwen2vl"
    ids = [3, 17, 42, 7, 19]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([ids])).logits[0].numpy()
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    from tpullm.mtmd import WhisperAudioEncoder, load_vision
    from tpullm.mtmd.qwen_vl import Qwen2VLVision
    from tpullm.tools.convert_hf import convert_hf_mmproj

    mm = str(tmp_path / "omni.mmproj.gguf")
    convert_hf_mmproj(str(d), mm, verbose=False)

    # vision half ≡ qwen2.5vl graph
    tower = load_vision(mm)
    assert isinstance(tower, Qwen2VLVision) and tower.is_25
    P, H, W = 4, 16, 16
    rng = np.random.default_rng(49)
    px = rng.normal(size=(3, H, W)).astype(np.float32)
    got_emb = tower.encode_pixels(px)
    m = 2
    ph, pw = H // P, W // P
    x = px.reshape(3, ph // m, m, P, pw // m, m, P)
    patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3, P, P)
    patches = np.repeat(patches[:, :, None], 2, axis=2).reshape(ph * pw, -1)
    with torch.no_grad():
        ref_emb = model.visual(torch.from_numpy(patches),
                               grid_thw=torch.tensor([[1, ph, pw]])).numpy()
    np.testing.assert_allclose(got_emb, ref_emb, rtol=2e-3, atol=2e-3)

    # audio half: windowed attention over 2·n_window mel chunks
    audio = WhisperAudioEncoder(mm)
    assert audio.proj_type == "qwen2.5o" and audio.n_window == 4
    L = 18  # chunks [8, 8, 2] → post-conv [4, 4, 1] = 9 → pooled 4
    mel = rng.normal(size=(16, L)).astype(np.float32)
    got_a = audio.encode_mel(mel)
    assert got_a.shape == (4, 48)
    import math

    aftercnn = sum(math.ceil(c / 2) for c in (8, 8, 2))
    with torch.no_grad():
        ref_a = model.audio_tower(
            input_features=torch.from_numpy(mel),
            feature_lens=torch.tensor([L]),
            aftercnn_lens=torch.tensor([aftercnn]),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(got_a, ref_a, rtol=2e-3, atol=2e-3)
