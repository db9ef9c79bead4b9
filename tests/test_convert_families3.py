"""Round-trip conversion oracle, batch 3: MoE and hybrid families
(DeepSeek v1, ChatGLM, BailingMoe, LLaDA-MoE, AFMoE, MiniMax-M2, GroveMoE,
Nemotron-H dense+MoE, Maincoder, Pangu-Embedded, PLM).

Same scheme as test_convert_families.py."""

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


def _unpermute_qk(w, n_head):
    s = w.shape
    return (w.reshape(n_head, s[0] // n_head // 2, 2, *s[1:])
            .swapaxes(1, 2).reshape(s))


def _moe_layer_sd(sd, t, i, prefix="mlp", gate="gate.weight"):
    """Standard qwen-moe expert/shexp/router inverses for one layer."""
    p, h = f"blk.{i}.", f"model.layers.{i}.{prefix}."
    if p + "ffn_gate_inp.weight" in t:
        sd[h + gate] = t[p + "ffn_gate_inp.weight"]
    for kind, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                       ("down", "down_proj")):
        key = p + f"ffn_{kind}_exps.weight"
        if key in t:
            for e in range(t[key].shape[0]):
                sd[h + f"experts.{e}.{proj}.weight"] = t[key][e]
        skey = p + f"ffn_{kind}_shexp.weight"
        if skey in t:
            sd[h + f"shared_experts.{proj}.weight"] = t[skey]


_IDS = dict(pad_token_id=0, bos_token_id=1, eos_token_id=2)


def test_roundtrip_deepseek_v1(tmp_path):
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="deepseek",
                            n_ff_shexp=48, gated_shexp=False,
                            n_dense_lead=1, expert_weights_scale=1.0)
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
        sd[h + "self_attn.q_proj.weight"] = _unpermute_qk(
            t[p + "attn_q.weight"], 4)
        sd[h + "self_attn.k_proj.weight"] = _unpermute_qk(
            t[p + "attn_k.weight"], 2)
        sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        if p + "ffn_gate.weight" in t:  # dense lead layer
            for g in ("gate", "up", "down"):
                sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
        _moe_layer_sd(sd, t, i)
    cfg = dict(model_type="deepseek", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=96, moe_intermediate_size=96,
               n_routed_experts=4, num_experts_per_tok=2,
               n_shared_experts=1, first_k_dense_replace=1,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "deepseek", cfg, sd), tmp_path,
            "deepseek")


def test_roundtrip_chatglm(tmp_path):
    from tpullm.models.testing import make_tiny_chatglm_gguf

    fx = make_tiny_chatglm_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "transformer.embedding.word_embeddings.weight":
            t["token_embd.weight"],
        "transformer.encoder.final_layernorm.weight":
            t["output_norm.weight"],
        "transformer.output_layer.weight": t["output.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"transformer.encoder.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "self_attention.query_key_value.weight"] = \
            t[p + "attn_qkv.weight"]
        sd[h + "self_attention.query_key_value.bias"] = \
            t[p + "attn_qkv.bias"]
        sd[h + "self_attention.dense.weight"] = t[p + "attn_output.weight"]
        sd[h + "mlp.dense_h_to_4h.weight"] = t[p + "ffn_up.weight"]
        sd[h + "mlp.dense_4h_to_h.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="chatglm", hidden_size=64, num_layers=2,
               num_hidden_layers=2, num_attention_heads=4,
               multi_query_group_num=2, ffn_hidden_size=128,
               seq_length=256, layernorm_epsilon=1e-5, rope_ratio=1.0,
               padded_vocab_size=t["token_embd.weight"].shape[0],
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "chatglm", cfg, sd), tmp_path,
            "chatglm")


def test_roundtrip_bailingmoe(tmp_path):
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="bailingmoe",
                            n_ff_shexp=48, gated_shexp=False,
                            expert_weights_scale=1.0)
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
            _unpermute_qk(t[p + "attn_q.weight"], 4),
            _unpermute_qk(t[p + "attn_k.weight"], 2),
            t[p + "attn_v.weight"],
        ], axis=0)
        sd[h + "attention.dense.weight"] = t[p + "attn_output.weight"]
        _moe_layer_sd(sd, t, i)
    cfg = dict(model_type="bailing_moe", hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16, intermediate_size=96,
               moe_intermediate_size=96, num_experts=4,
               num_experts_per_tok=2, num_shared_experts=1,
               first_k_dense_replace=0, norm_topk_prob=False,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "bailingmoe", cfg, sd), tmp_path,
            "bailingmoe")


def test_roundtrip_minimax_m2(tmp_path):
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="minimax-m2",
                            with_probs_bias=True)
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    W = {"gate": "w1", "down": "w2", "up": "w3"}
    for i in range(2):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "block_sparse_moe.gate.weight"] = \
            t[p + "ffn_gate_inp.weight"]
        sd[h + "block_sparse_moe.gate.e_score_correction_bias"] = \
            t[p + "exp_probs_b.bias"]
        for kind, w_name in W.items():
            exps = t[p + f"ffn_{kind}_exps.weight"]
            for e in range(exps.shape[0]):
                sd[h + f"block_sparse_moe.experts.{e}.{w_name}.weight"] = \
                    exps[e]
    cfg = dict(model_type="minimax",  # published config's model_type
               architectures=["MiniMaxM2ForCausalLM"], hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=96,
               num_local_experts=4, num_experts_per_tok=2, rotary_dim=16,
               max_position_embeddings=256, rope_theta=10000.0,
               layernorm_epsilon=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "minimax", cfg, sd), tmp_path,
            "minimax-m2")


def test_roundtrip_llada_moe(tmp_path):
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="llada-moe")
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
        for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        _moe_layer_sd(sd, t, i)
    cfg = dict(model_type="llada_moe", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=96, expert_intermediate_size=96,
               num_experts=4, num_experts_per_tok=2,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    out = str(tmp_path / "m.gguf")
    src = _write_hf(tmp_path, "llada_moe", cfg, sd)
    stats = convert_hf_to_gguf(src, out, outtype="f32", verbose=False)
    assert stats["arch"] == "llada-moe"
    # diffusion denoiser: compare via the non-causal diffusion step instead
    # of causal prefill
    from tpullm.tools.diffusion import diffusion_generate

    ids = [3, 17, 42, 7]
    ref_eng = Engine(fx, mode="dense", max_seq=64)
    got_eng = Engine(out, mode="dense", max_seq=64)
    ref = diffusion_generate(ref_eng, ids, max_length=8, steps=3,
                             mask_token_id=0)
    got = diffusion_generate(got_eng, ids, max_length=8, steps=3,
                             mask_token_id=0)
    assert ref == got


def test_roundtrip_afmoe(tmp_path):
    from tpullm.models.testing import make_tiny_afmoe_gguf

    fx = make_tiny_afmoe_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(3):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = \
            t[p + "post_attention_norm.weight"]
        sd[h + "pre_mlp_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "post_mlp_layernorm.weight"] = t[p + "post_ffw_norm.weight"]
        for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
        sd[h + "self_attn.gate_proj.weight"] = t[p + "attn_gate.weight"]
        sd[h + "self_attn.q_norm.weight"] = t[p + "attn_q_norm.weight"]
        sd[h + "self_attn.k_norm.weight"] = t[p + "attn_k_norm.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        if p + "ffn_gate.weight" in t:  # dense lead
            for g in ("gate", "up", "down"):
                sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
        else:
            sd[h + "mlp.router.gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[h + "mlp.expert_bias"] = t[p + "exp_probs_b.bias"]
            _moe_layer_sd(sd, t, i)
            del sd[h + "mlp.gate.weight"]  # router written above
    cfg = dict(model_type="afmoe", hidden_size=64, num_hidden_layers=3,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=64, moe_intermediate_size=32,
               num_experts=4, num_experts_per_tok=2, num_shared_experts=1,
               num_dense_layers=1, route_norm=True, route_scale=2.826,
               score_func="sigmoid", sliding_window=8,
               global_attn_every_n_layers=2, rope_theta=1000000.0,
               rope_local_base_freq=10000.0, rms_norm_eps=1e-6,
               max_position_embeddings=256,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "afmoe", cfg, sd), tmp_path, "afmoe")


def test_roundtrip_grovemoe(tmp_path):
    from tpullm.models.testing import make_tiny_grovemoe_gguf

    fx = make_tiny_grovemoe_gguf(tmp_path / "a.gguf", n_group_experts=2)
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
        for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
        sd[h + "self_attn.q_norm.weight"] = t[p + "attn_q_norm.weight"]
        sd[h + "self_attn.k_norm.weight"] = t[p + "attn_k_norm.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        _moe_layer_sd(sd, t, i)
        for kind, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                           ("down", "down_proj")):
            ch = t[p + f"ffn_{kind}_chexps.weight"]
            for e in range(ch.shape[0]):
                sd[h + f"mlp.chunk_experts.{e}.{proj}.weight"] = ch[e]
    cfg = dict(model_type="grove_moe", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=32, moe_intermediate_size=32,
               num_experts=8, num_experts_per_tok=2,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-6,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "grovemoe", cfg, sd), tmp_path,
            "grovemoe")


def _nemotron_h_sd(t, n_layer, kinds):
    sd = {
        "backbone.embeddings.weight": t["token_embd.weight"],
        "backbone.norm_f.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i, kind in enumerate(kinds):
        p, h = f"blk.{i}.", f"backbone.layers.{i}."
        sd[h + "norm.weight"] = t[p + "attn_norm.weight"]
        if kind == "mamba2":
            x = h + "mixer."
            sd[x + "in_proj.weight"] = t[p + "ssm_in.weight"]
            sd[x + "conv1d.weight"] = t[p + "ssm_conv1d.weight"][:, None, :]
            sd[x + "conv1d.bias"] = t[p + "ssm_conv1d.bias"]
            sd[x + "dt_bias"] = t[p + "ssm_dt.bias"]
            sd[x + "A_log"] = np.log(-t[p + "ssm_a"])
            sd[x + "D"] = t[p + "ssm_d"]
            sd[x + "norm.weight"] = t[p + "ssm_norm.weight"]
            sd[x + "out_proj.weight"] = t[p + "ssm_out.weight"]
        elif kind == "attn":
            for g, hf in (("q", "q_proj"), ("k", "k_proj"),
                          ("v", "v_proj")):
                sd[h + f"mixer.{hf}.weight"] = t[p + f"attn_{g}.weight"]
            sd[h + "mixer.o_proj.weight"] = t[p + "attn_output.weight"]
        elif kind == "ffn":
            for g in ("up", "down"):
                sd[h + f"mixer.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
                if p + f"ffn_{g}.bias" in t:
                    sd[h + f"mixer.{g}_proj.bias"] = t[p + f"ffn_{g}.bias"]
        else:  # moe
            x = h + "mixer."
            sd[x + "gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[x + "gate.e_score_correction_bias"] = \
                t[p + "exp_probs_b.bias"]
            for kind2, proj in (("up", "up_proj"), ("down", "down_proj")):
                exps = t[p + f"ffn_{kind2}_exps.weight"]
                for e in range(exps.shape[0]):
                    sd[x + f"experts.{e}.{proj}.weight"] = exps[e]
                sd[x + f"shared_experts.{proj}.weight"] = \
                    t[p + f"ffn_{kind2}_shexp.weight"]
    return sd


_NEM_COMMON = dict(
    hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, mamba_num_heads=4,
    mamba_head_dim=16, ssm_state_size=16, conv_kernel=4, n_groups=2,
    intermediate_size=96, max_position_embeddings=256, rms_norm_eps=1e-5,
    **_IDS,
)


def test_roundtrip_nemotron_h(tmp_path):
    from tpullm.models.testing import make_tiny_hybrid2_gguf

    fx = make_tiny_hybrid2_gguf(tmp_path / "a.gguf", arch="nemotron_h")
    t, md = _fixture_tensors(fx)
    sd = _nemotron_h_sd(t, 3, ["mamba2", "attn", "ffn"])
    cfg = dict(_NEM_COMMON, model_type="nemotron_h",
               hybrid_override_pattern="M*-",
               vocab_size=t["token_embd.weight"].shape[0])
    _parity(fx, _write_hf(tmp_path, "nemotron_h", cfg, sd), tmp_path,
            "nemotron_h")


def test_roundtrip_nemotron_h_moe(tmp_path):
    from tpullm.models.testing import make_tiny_hybrid2_gguf

    fx = make_tiny_hybrid2_gguf(tmp_path / "a.gguf", arch="nemotron_h_moe")
    t, md = _fixture_tensors(fx)
    sd = _nemotron_h_sd(t, 3, ["mamba2", "attn", "moe"])
    cfg = dict(_NEM_COMMON, model_type="nemotron_h",
               hybrid_override_pattern="M*E",
               n_routed_experts=4, num_experts_per_tok=2,
               moe_intermediate_size=96, norm_topk_prob=True,
               routed_scaling_factor=2.0,
               vocab_size=t["token_embd.weight"].shape[0])
    _parity(fx, _write_hf(tmp_path, "nemotron_h_moe", cfg, sd), tmp_path,
            "nemotron_h_moe")


def test_roundtrip_maincoder(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="maincoder",
                              with_qk_norm=True, with_bo=True)
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
        for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
        sd[h + "self_attn.q_norm.weight"] = t[p + "attn_q_norm.weight"]
        sd[h + "self_attn.k_norm.weight"] = t[p + "attn_k_norm.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "self_attn.o_proj.bias"] = t[p + "attn_output.bias"]
        for g in ("gate", "up", "down"):
            sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
    cfg = dict(model_type="maincoder", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=128, max_position_embeddings=256,
               rope_theta=10000.0, rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "maincoder", cfg, sd), tmp_path,
            "maincoder")


def test_roundtrip_pangu_embedded(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="pangu-embedded",
                              with_bo=True)
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
        for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
            sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "self_attn.o_proj.bias"] = t[p + "attn_output.bias"]
        for g in ("gate", "up", "down"):
            sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
    cfg = dict(model_type="pangu_embedded", hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "pangu", cfg, sd), tmp_path,
            "pangu-embedded")


def test_roundtrip_plm(tmp_path):
    from tpullm.models.testing import make_tiny_plm_gguf

    fx = make_tiny_plm_gguf(tmp_path / "a.gguf")
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
        sd[h + "self_attn.kv_a_proj_with_mqa.weight"] = \
            t[p + "attn_kv_a_mqa.weight"]
        sd[h + "self_attn.kv_a_layernorm.weight"] = \
            t[p + "attn_kv_a_norm.weight"]
        sd[h + "self_attn.kv_b_proj.weight"] = t[p + "attn_kv_b.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "mlp.up_proj.weight"] = t[p + "ffn_up.weight"]
        sd[h + "mlp.down_proj.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="plm", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=4,
               intermediate_size=96, qk_nope_head_dim=16,
               qk_rope_head_dim=8, v_head_dim=16, kv_lora_rank=24,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "plm", cfg, sd), tmp_path, "plm")
