"""Round-trip conversion oracle, batch 6: the final tail
(llama-embed encoder export, BailingMoeV2/Ling-2.0, Grok-1, EXAONE-MoE,
MiMo-V2-Flash, Step-3.5).

Same scheme as test_convert_families.py: synthesize a tiny GGUF fixture,
invert it into an HF-named safetensors checkpoint, convert, and compare
Engine logits (or pooled embeddings) between fixture and converted file."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("safetensors")

from tpullm.gguf.reader import GGUFReader  # noqa: E402
from tpullm.runtime import Engine  # noqa: E402
from tpullm.tools.convert_hf import convert_hf_to_gguf  # noqa: E402


def _fixture_tensors(path):
    r = GGUFReader(path)
    return {name: np.asarray(info.to_numpy(), dtype=np.float32)
            for name, info in r.tensors.items()}, r.metadata


def _write_hf(tmp_path, name, cfg, sd):
    from safetensors.numpy import save_file

    d = tmp_path / f"hf_{name}"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(d / "model.safetensors"))
    return str(d)


def _parity(fixture_gguf, src, tmp_path, arch, atol=3e-4):
    out = str(tmp_path / "m.gguf")
    stats = convert_hf_to_gguf(src, out, outtype="f32", verbose=False)
    assert stats["arch"] == arch
    ids = [3, 17, 42, 7, 19, 55, 30, 4]
    ref = Engine(fixture_gguf, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).prefill_all_logits(ids)
    got = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=atol)


def _embed_parity(fixture_gguf, src, tmp_path, arch, atol=3e-4):
    out = str(tmp_path / "m.gguf")
    stats = convert_hf_to_gguf(src, out, outtype="f32", verbose=False)
    assert stats["arch"] == arch
    ids = [3, 17, 42, 7, 19, 55]
    ref = Engine(fixture_gguf, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).embed_tokens(ids, pooling="mean",
                                                    normalize=False)
    got = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).embed_tokens(ids, pooling="mean",
                                                    normalize=False)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=atol)


def _unpermute_qk(w, n_head):
    s = w.shape
    return (w.reshape(n_head, s[0] // n_head // 2, 2, *s[1:])
            .swapaxes(1, 2).reshape(s))


_IDS = dict(pad_token_id=0, bos_token_id=1, eos_token_id=2)


def test_roundtrip_llama_embed(tmp_path):
    """LlamaModel (encoder-only export) → llama-embed: plain llama tensors,
    bidirectional mean pooling."""
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="llama-embed")
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "self_attn.q_proj.weight"] = \
            _unpermute_qk(t[p + "attn_q.weight"], 4)
        sd[h + "self_attn.k_proj.weight"] = \
            _unpermute_qk(t[p + "attn_k.weight"], 2)
        sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "mlp.gate_proj.weight"] = t[p + "ffn_gate.weight"]
        sd[h + "mlp.up_proj.weight"] = t[p + "ffn_up.weight"]
        sd[h + "mlp.down_proj.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="llama", architectures=["LlamaModel"],
               hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _embed_parity(fx, _write_hf(tmp_path, "le", cfg, sd), tmp_path,
                  "llama-embed")


def test_roundtrip_bailingmoe2(tmp_path):
    """BailingMoeV2 (Ling-2.0): fused NEOX qkv, expert_bias, dense lead."""
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="bailingmoe2",
                            with_probs_bias=True, n_dense_lead=1,
                            n_layer=2)
    t, md = _fixture_tensors(fx)
    sd = {
        "model.word_embeddings.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "attention.query_key_value.weight"] = np.concatenate([
            t[p + "attn_q.weight"], t[p + "attn_k.weight"],
            t[p + "attn_v.weight"]], axis=0)
        sd[h + "attention.dense.weight"] = t[p + "attn_output.weight"]
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            sd[h + "mlp.gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[h + "mlp.gate.expert_bias"] = t[p + "exp_probs_b.bias"]
            for ei in range(4):
                sd[h + f"mlp.experts.{ei}.gate_proj.weight"] = \
                    t[p + "ffn_gate_exps.weight"][ei]
                sd[h + f"mlp.experts.{ei}.up_proj.weight"] = \
                    t[p + "ffn_up_exps.weight"][ei]
                sd[h + f"mlp.experts.{ei}.down_proj.weight"] = \
                    t[p + "ffn_down_exps.weight"][ei]
        else:  # dense lead layer
            sd[h + "mlp.gate_proj.weight"] = t[p + "ffn_gate.weight"]
            sd[h + "mlp.up_proj.weight"] = t[p + "ffn_up.weight"]
            sd[h + "mlp.down_proj.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="bailing_moe_v2", hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16, intermediate_size=96,
               moe_intermediate_size=96, num_experts=4,
               num_experts_per_tok=2, num_shared_experts=0,
               first_k_dense_replace=1, norm_topk_prob=False,
               partial_rotary_factor=1.0, score_function="softmax",
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "bm2", cfg, sd), tmp_path,
            "bailingmoe2")


def test_roundtrip_grok(tmp_path):
    """Grok-1: transformer.decoder_layer naming, merged moe.linear* expert
    tensors, post-norms, multiplied logit scale + final softcap."""
    from tpullm.gguf import GGUFWriter
    from tpullm.models.testing import make_tiny_moe_gguf

    base = make_tiny_moe_gguf(tmp_path / "g_base.gguf", arch="grok")
    r = GGUFReader(base)
    fx = tmp_path / "grok.gguf"
    w = GGUFWriter(fx, architecture="grok")
    for k, v in r.metadata.items():
        if k != "general.architecture":
            w.add_kv(k, v)
    w.add_kv("grok.logit_scale", 0.5773)
    w.add_kv("grok.attn_logit_softcapping", 30.0)
    w.add_kv("grok.final_logit_softcapping", 30.0)
    n_layer = r.metadata["grok.block_count"]
    n_embd = r.metadata["grok.embedding_length"]
    rng = np.random.default_rng(5)
    for name, t_ in r.tensors.items():
        w.add_packed_tensor(name, t_.shape, t_.ggml_type, t_.data.tobytes())
    for i in range(n_layer):
        w.add_tensor(f"blk.{i}.attn_output_norm.weight",
                     1.0 + 0.05 * rng.standard_normal(n_embd)
                     .astype(np.float32))
        w.add_tensor(f"blk.{i}.layer_output_norm.weight",
                     1.0 + 0.05 * rng.standard_normal(n_embd)
                     .astype(np.float32))
    w.write()
    t, md = _fixture_tensors(fx)
    sd = {
        "transformer.in_out_embed.weight": t["token_embd.weight"],
        "transformer.rms_norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"transformer.decoder_layer.{i}."
        sd[h + "rms_norm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "rms_norm_1.weight"] = t[p + "attn_output_norm.weight"]
        sd[h + "rms_norm_2.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "rms_norm_3.weight"] = t[p + "layer_output_norm.weight"]
        a = h + "multi_head_attention."
        sd[a + "query.weight"] = t[p + "attn_q.weight"]
        sd[a + "key.weight"] = t[p + "attn_k.weight"]
        sd[a + "value.weight"] = t[p + "attn_v.weight"]
        sd[a + "linear.weight"] = t[p + "attn_output.weight"]
        sd[h + "router.weight"] = t[p + "ffn_gate_inp.weight"]
        sd[h + "moe.linear.weight"] = t[p + "ffn_gate_exps.weight"]
        sd[h + "moe.linear_1.weight"] = t[p + "ffn_down_exps.weight"]
        sd[h + "moe.linear_v.weight"] = t[p + "ffn_up_exps.weight"]
    cfg = dict(model_type="grok-1", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=96, moe_intermediate_size=96,
               num_local_experts=4, num_experts_per_tok=2,
               attn_logit_softcapping=30.0, final_logit_softcapping=30.0,
               output_multiplier_scale=0.5773,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(str(fx), _write_hf(tmp_path, "grok", cfg, sd), tmp_path, "grok")


def test_roundtrip_exaone_moe(tmp_path):
    """EXAONE-MoE: qwen-moe tensor set + expert bias + ungated shared
    expert + dense lead."""
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="exaone-moe",
                            with_probs_bias=True, n_ff_shexp=48,
                            gated_shexp=False, n_dense_lead=1, n_layer=2,
                            expert_weights_scale=1.0)
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "self_attn.q_proj.weight"] = t[p + "attn_q.weight"]
        sd[h + "self_attn.k_proj.weight"] = t[p + "attn_k.weight"]
        sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            sd[h + "mlp.gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[h + "mlp.gate.e_score_correction_bias"] = \
                t[p + "exp_probs_b.bias"]
            for ei in range(4):
                sd[h + f"mlp.experts.{ei}.gate_proj.weight"] = \
                    t[p + "ffn_gate_exps.weight"][ei]
                sd[h + f"mlp.experts.{ei}.up_proj.weight"] = \
                    t[p + "ffn_up_exps.weight"][ei]
                sd[h + f"mlp.experts.{ei}.down_proj.weight"] = \
                    t[p + "ffn_down_exps.weight"][ei]
            sd[h + "mlp.shared_experts.gate_proj.weight"] = \
                t[p + "ffn_gate_shexp.weight"]
            sd[h + "mlp.shared_experts.up_proj.weight"] = \
                t[p + "ffn_up_shexp.weight"]
            sd[h + "mlp.shared_experts.down_proj.weight"] = \
                t[p + "ffn_down_shexp.weight"]
        else:  # dense lead layer
            sd[h + "mlp.gate_proj.weight"] = t[p + "ffn_gate.weight"]
            sd[h + "mlp.up_proj.weight"] = t[p + "ffn_up.weight"]
            sd[h + "mlp.down_proj.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="exaone_moe", hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16, intermediate_size=96,
               moe_intermediate_size=96, num_experts=4,
               num_experts_per_tok=2, num_shared_experts=1,
               first_k_dense_replace=1, norm_topk_prob=False,
               routed_scaling_factor=1.0,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "exm", cfg, sd), tmp_path,
            "exaone-moe")


def test_roundtrip_mimo2(tmp_path):
    """MiMo-V2-Flash: hybrid SWA pattern with per-layer kv heads,
    attention sinks, noaux_tc sigmoid MoE with correction bias."""
    from tpullm.models.testing import make_tiny_mimo2_nas_gguf

    fx = make_tiny_mimo2_nas_gguf(tmp_path / "a.gguf", arch="mimo2",
                                  heads=[4, 4, 4], kv=[2, 1, 1],
                                  swa_layers=[False, True, True],
                                  moe=[False, True, True])
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(3):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "self_attn.q_proj.weight"] = t[p + "attn_q.weight"]
        sd[h + "self_attn.k_proj.weight"] = t[p + "attn_k.weight"]
        sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "self_attn.attention_sink"] = t[p + "attn_sinks.weight"]
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            sd[h + "mlp.gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[h + "mlp.gate.e_score_correction_bias"] = \
                t[p + "exp_probs_b.bias"]
            for ei in range(4):
                sd[h + f"mlp.experts.{ei}.gate_proj.weight"] = \
                    t[p + "ffn_gate_exps.weight"][ei]
                sd[h + f"mlp.experts.{ei}.up_proj.weight"] = \
                    t[p + "ffn_up_exps.weight"][ei]
                sd[h + f"mlp.experts.{ei}.down_proj.weight"] = \
                    t[p + "ffn_down_exps.weight"][ei]
        else:
            for g in ("gate", "up", "down"):
                sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
                sd[h + f"mlp.{g}_proj.bias"] = t[p + f"ffn_{g}.bias"]
    cfg = dict(model_type="mimo_v2_flash", hidden_size=64,
               num_hidden_layers=3, num_attention_heads=4,
               num_key_value_heads=2, swa_num_key_value_heads=1,
               head_dim=16, v_head_dim=16, intermediate_size=64,
               moe_intermediate_size=32, n_routed_experts=4,
               num_experts_per_tok=2, hybrid_layer_pattern=[0, 1, 1],
               sliding_window=8, partial_rotary_factor=1.0,
               rope_theta=1000000.0, rope_theta_swa=10000.0,
               layernorm_epsilon=1e-6, max_position_embeddings=256,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "mimo2", cfg, sd), tmp_path, "mimo2")


def test_roundtrip_step35(tmp_path):
    """Step-3.5: NAS'd per-layer head counts, +1-offset norms, head-wise
    attention gate, merged MoE tensors, router bias, shared expert."""
    from tpullm.models.testing import make_tiny_mimo2_nas_gguf

    fx = make_tiny_mimo2_nas_gguf(tmp_path / "a.gguf", arch="step35",
                                  heads=[4, 2, 4], kv=[2, 1, 2],
                                  swa_layers=[False, True, False],
                                  moe=[False, True, True])
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"] - 1.0,
        "lm_head.weight": t["output.weight"],
    }
    for i in range(3):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"] - 1.0
        sd[h + "post_attention_layernorm.weight"] = \
            t[p + "ffn_norm.weight"] - 1.0
        sd[h + "self_attn.q_norm.weight"] = t[p + "attn_q_norm.weight"] - 1.0
        sd[h + "self_attn.k_norm.weight"] = t[p + "attn_k_norm.weight"] - 1.0
        sd[h + "self_attn.q_proj.weight"] = t[p + "attn_q.weight"]
        sd[h + "self_attn.k_proj.weight"] = t[p + "attn_k.weight"]
        sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "self_attn.g_proj.weight"] = t[p + "attn_gate.weight"]
        if p + "ffn_gate_inp.weight" in t:  # MoE layer (merged tensors)
            sd[h + "moe.gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[h + "moe.router_bias"] = t[p + "exp_probs_b.bias"]
            sd[h + "moe.gate_proj.weight"] = t[p + "ffn_gate_exps.weight"]
            sd[h + "moe.up_proj.weight"] = t[p + "ffn_up_exps.weight"]
            sd[h + "moe.down_proj.weight"] = t[p + "ffn_down_exps.weight"]
            sd[h + "share_expert.gate_proj.weight"] = \
                t[p + "ffn_gate_shexp.weight"]
            sd[h + "share_expert.up_proj.weight"] = \
                t[p + "ffn_up_shexp.weight"]
            sd[h + "share_expert.down_proj.weight"] = \
                t[p + "ffn_down_shexp.weight"]
        else:
            for g in ("gate", "up", "down"):
                sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
                sd[h + f"mlp.{g}_proj.bias"] = t[p + f"ffn_{g}.bias"]
    cfg = dict(model_type="step3p5", hidden_size=64, num_hidden_layers=3,
               num_attention_heads=4, num_attention_groups=2, head_dim=16,
               attention_other_setting=dict(num_attention_heads=2,
                                            num_attention_groups=1),
               layer_types=["full_attention", "sliding_attention",
                            "full_attention"],
               intermediate_size=64, moe_intermediate_size=32,
               moe_num_experts=4, moe_top_k=2, share_expert_dim=32,
               moe_router_scaling_factor=1.5, norm_expert_weight=True,
               sliding_window=8, rope_theta=[1000000.0, 10000.0],
               rms_norm_eps=1e-6, max_position_embeddings=256,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "step35", cfg, sd), tmp_path, "step35")


def test_roundtrip_refact(tmp_path):
    """GPTRefactForCausalLM: MQA fused kv split, derived n_ff gate_up
    split, ALiBi llama graph (≡ RefactModel :2339)."""
    from tpullm.models.testing import make_tiny_llama_gguf

    # refact derives ff from E: E=64 → 2/3*256 rounded to 256
    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="refact",
                              n_head_kv=1, n_ff=256)
    t, md = _fixture_tensors(fx)
    sd = {
        "transformer.wte.weight": t["token_embd.weight"],
        "transformer.ln_f.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"transformer.h.{i}."
        sd[h + "ln_1.weight"] = t[p + "attn_norm.weight"]
        sd[h + "ln_2.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "attn.q.weight"] = t[p + "attn_q.weight"]
        sd[h + "attn.kv.weight"] = np.concatenate(
            [t[p + "attn_k.weight"], t[p + "attn_v.weight"]], axis=0)
        sd[h + "attn.c_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "mlp.gate_up_proj.weight"] = np.concatenate(
            [t[p + "ffn_gate.weight"], t[p + "ffn_up.weight"]], axis=0)
        sd[h + "mlp.c_proj.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="gpt_refact",
               architectures=["GPTRefactForCausalLM"],
               n_embd=64, n_layer=2, n_head=4, n_positions=256,
               layer_norm_epsilon=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "refact", cfg, sd), tmp_path, "refact")


def test_roundtrip_xlm_roberta_bert(tmp_path):
    """XLMRobertaModel (bge-m3 style) → bert: roberta. prefix strip +
    fairseq position-offset chop (≡ XLMRobertaModel :5845)."""
    from tpullm.models.testing import make_tiny_bert_gguf

    fx = make_tiny_bert_gguf(tmp_path / "a.gguf", n_ctx=128)
    t, md = _fixture_tensors(fx)
    pad = 1
    pos = t["position_embd.weight"]
    pos_hf = np.concatenate(
        [np.zeros((pad + 1, pos.shape[1]), np.float32), pos], axis=0)
    sd = {
        "roberta.embeddings.word_embeddings.weight": t["token_embd.weight"],
        "roberta.embeddings.position_embeddings.weight": pos_hf,
        "roberta.embeddings.token_type_embeddings.weight":
            t["token_types.weight"],
        "roberta.embeddings.LayerNorm.weight": t["token_embd_norm.weight"],
        "roberta.embeddings.LayerNorm.bias": t["token_embd_norm.bias"],
        "roberta.pooler.dense.weight": np.zeros((64, 64), np.float32),
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"roberta.encoder.layer.{i}."
        a = h + "attention."
        for hf, gg in (("self.query", "attn_q"), ("self.key", "attn_k"),
                       ("self.value", "attn_v"), ("output.dense",
                                                  "attn_output")):
            sd[a + hf + ".weight"] = t[p + gg + ".weight"]
            sd[a + hf + ".bias"] = t[p + gg + ".bias"]
        sd[a + "output.LayerNorm.weight"] = t[p + "attn_output_norm.weight"]
        sd[a + "output.LayerNorm.bias"] = t[p + "attn_output_norm.bias"]
        sd[h + "intermediate.dense.weight"] = t[p + "ffn_up.weight"]
        sd[h + "intermediate.dense.bias"] = t[p + "ffn_up.bias"]
        sd[h + "output.dense.weight"] = t[p + "ffn_down.weight"]
        sd[h + "output.dense.bias"] = t[p + "ffn_down.bias"]
        sd[h + "output.LayerNorm.weight"] = t[p + "layer_output_norm.weight"]
        sd[h + "output.LayerNorm.bias"] = t[p + "layer_output_norm.bias"]
    cfg = dict(model_type="xlm-roberta", architectures=["XLMRobertaModel"],
               hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
               intermediate_size=int(md["bert.feed_forward_length"]),
               max_position_embeddings=128 + pad + 1, pad_token_id=pad,
               layer_norm_eps=1e-12, type_vocab_size=2,
               vocab_size=t["token_embd.weight"].shape[0],
               bos_token_id=0, eos_token_id=2)
    _embed_parity(fx, _write_hf(tmp_path, "xlmr", cfg, sd), tmp_path, "bert")


def test_xlm_roberta_jina_v3_arch_pick(tmp_path):
    """lora_adaptations flips the arch to jina-bert-v3, drops learned
    positions and per-task LoRA factors (≡ :5855-5906)."""
    from tpullm.gguf.reader import GGUFReader

    rng = np.random.default_rng(0)
    sd = {
        "roberta.embeddings.word_embeddings.weight":
            rng.standard_normal((64, 32)).astype(np.float32),
        "roberta.embeddings.position_embeddings.weight":
            rng.standard_normal((34, 32)).astype(np.float32),
        "roberta.embeddings.token_type_embeddings.weight":
            rng.standard_normal((1, 32)).astype(np.float32),
        "roberta.embeddings.LayerNorm.weight": np.ones(32, np.float32),
        "roberta.embeddings.LayerNorm.bias": np.zeros(32, np.float32),
        # torch parametrizations wrapper + stacked per-task LoRA
        "roberta.encoder.layer.0.attention.self.query.parametrizations"
        ".weight.original":
            rng.standard_normal((32, 32)).astype(np.float32),
        "roberta.encoder.layer.0.attention.self.query.parametrizations"
        ".weight.0.lora_A":
            rng.standard_normal((3, 4, 32)).astype(np.float32),
        "roberta.encoder.layer.0.attention.self.query.parametrizations"
        ".weight.0.lora_B":
            rng.standard_normal((3, 32, 4)).astype(np.float32),
    }
    cfg = dict(model_type="xlm-roberta", architectures=["XLMRobertaModel"],
               hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
               intermediate_size=64, max_position_embeddings=34,
               pad_token_id=1, layer_norm_eps=1e-12, vocab_size=64,
               lora_adaptations=["retrieval.query", "retrieval.passage",
                                 "separation"],
               rotary_emb_base=10000.0, bos_token_id=0, eos_token_id=2)
    out = str(tmp_path / "m.gguf")
    stats = convert_hf_to_gguf(_write_hf(tmp_path, "jina3", cfg, sd), out,
                               outtype="f32", verbose=False)
    assert stats["arch"] == "jina-bert-v3"
    r = GGUFReader(out)
    assert "token_embd.weight" in r.tensors
    assert "blk.0.attn_q.weight" in r.tensors
    assert "position_embd.weight" not in r.tensors  # v3 ropes
    assert not any("lora" in n for n in r.tensors)


def test_roundtrip_wavtokenizer(tmp_path):
    """WavTokenizerDec: backbone/posnet/convnext/head names → the decoder
    wire format; converted tensors are bit-identical to the fixture."""
    from tpullm.models.testing import make_tiny_wavtokenizer_gguf

    fx = make_tiny_wavtokenizer_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    arch = "wavtokenizer-dec"
    sd = {}
    for name, arr in t.items():
        if name == "token_embd.weight":
            hf = ("feature_extractor.encodec.quantizer.vq.layers.0"
                  "._codebook.embed")
        elif name.startswith("conv1d."):
            hf = "backbone.embed." + name.split(".")[-1]
        elif name.startswith("token_embd_norm."):
            hf = "backbone.norm." + name.split(".")[-1]
        elif name.startswith("output_norm."):
            hf = "backbone.final_layer_norm." + name.split(".")[-1]
        elif name.startswith("output."):
            hf = "head.out." + name.split(".")[-1]
        elif name.startswith(("posnet.", "convnext.")):
            grp, bid, stem, suffix = name.split(".")
            inv = ({"attn_q": "q", "attn_k": "k", "attn_v": "v",
                    "attn_output": "proj_out", "attn_norm": "norm"}
                   if grp == "posnet" else
                   {"dw": "dwconv", "pw1": "pwconv1", "pw2": "pwconv2"})
            hf = f"backbone.{grp}.{bid}.{inv.get(stem, stem)}.{suffix}"
        else:
            raise AssertionError(f"unmapped fixture tensor {name}")
        sd[hf] = arr
    # posnet attention blocks share the 'norm' HF name for attn_norm and
    # the resnet norms live as norm1/norm2 — the fixture uses attn_norm for
    # the attention block only, so no collision
    cfg = dict(model_type="wavtokenizer-dec",
               architectures=["WavTokenizerDec"],
               vocab_size=int(md[f"{arch}.vocab_size"]),
               n_embd=int(md[f"{arch}.embedding_length"]),
               n_embd_features=int(md[f"{arch}.features_length"]),
               n_ff=int(md[f"{arch}.feed_forward_length"]),
               n_head=1, n_layer=1,
               group_norm_epsilon=1e-6, group_norm_groups=int(
                   md[f"{arch}.attention.group_norm_groups"]),
               posnet=dict(n_embd=int(md[f"{arch}.posnet.embedding_length"]),
                           n_layer=int(md[f"{arch}.posnet.block_count"])),
               convnext=dict(
                   n_embd=int(md[f"{arch}.convnext.embedding_length"]),
                   n_layer=int(md[f"{arch}.convnext.block_count"])),
               **_IDS)
    out = str(tmp_path / "m.gguf")
    stats = convert_hf_to_gguf(_write_hf(tmp_path, "wavtok", cfg, sd), out,
                               outtype="f32", verbose=False)
    assert stats["arch"] == arch
    from tpullm.gguf.reader import GGUFReader

    got = {n: np.asarray(i.to_numpy(), np.float32)
           for n, i in GGUFReader(out).tensors.items()}
    assert set(got) == set(t)
    for n in t:
        np.testing.assert_array_equal(got[n], t[n], err_msg=n)
