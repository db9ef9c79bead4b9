"""Round-trip conversion oracle, batch 4: Kimi-Linear, LFM2-MoE, Arctic,
SmallThinker, RND1, Deci/Nemotron-NAS. Same scheme as
test_convert_families.py."""

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


_IDS = dict(pad_token_id=0, bos_token_id=1, eos_token_id=2)


def test_roundtrip_kimi_linear(tmp_path):
    from tpullm.models.testing import make_tiny_kimi_linear_gguf

    fx = make_tiny_kimi_linear_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    kinds = ["kda", "mla", "kda"]
    for i, kind in enumerate(kinds):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        a = h + "self_attn."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        if kind == "kda":
            for g in ("q", "k", "v"):
                sd[a + f"{g}_proj.weight"] = t[p + f"attn_{g}.weight"]
                # HF stores KDA convs 2-D (d_inner, d_conv)
                sd[a + f"{g}_conv1d.weight"] = \
                    t[p + f"ssm_conv1d_{g}.weight"][:, 0, :]
            sd[a + "f_a_proj.weight"] = t[p + "ssm_f_a.weight"]
            sd[a + "f_b_proj.weight"] = t[p + "ssm_f_b.weight"]
            sd[a + "b_proj.weight"] = t[p + "ssm_beta.weight"]
            sd[a + "g_a_proj.weight"] = t[p + "ssm_g_a.weight"]
            sd[a + "g_b_proj.weight"] = t[p + "ssm_g_b.weight"]
            sd[a + "A_log"] = np.log(-t[p + "ssm_a"]).reshape(1, 1, -1, 1)
            sd[a + "dt_bias"] = t[p + "ssm_dt.bias"]
            sd[a + "o_norm.weight"] = t[p + "ssm_norm.weight"]
            sd[a + "o_proj.weight"] = t[p + "attn_output.weight"]
        else:  # MLA
            sd[a + "q_proj.weight"] = t[p + "attn_q.weight"]
            sd[a + "kv_a_proj_with_mqa.weight"] = \
                t[p + "attn_kv_a_mqa.weight"]
            sd[a + "kv_a_layernorm.weight"] = t[p + "attn_kv_a_norm.weight"]
            # re-fuse k_b (H, kv_lora, nope) + v_b (H, v, kv_lora) into
            # kv_b_proj (H*(nope+v), kv_lora)
            k_b = t[p + "attn_k_b.weight"].transpose(0, 2, 1)  # (H,nope,kvl)
            v_b = t[p + "attn_v_b.weight"]                     # (H,v,kvl)
            kv_b = np.concatenate([k_b, v_b], axis=1)
            sd[a + "kv_b_proj.weight"] = kv_b.reshape(-1, kv_b.shape[-1])
            sd[a + "o_proj.weight"] = t[p + "attn_output.weight"]
        if p + "ffn_gate.weight" in t:  # dense lead
            for g in ("gate", "up", "down"):
                sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
        else:
            b = h + "block_sparse_moe."
            sd[b + "gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[b + "gate.e_score_correction_bias"] = \
                t[p + "exp_probs_b.bias"]
            for kind2, wid in (("gate", "w1"), ("down", "w2"), ("up", "w3")):
                exps = t[p + f"ffn_{kind2}_exps.weight"]
                for e in range(exps.shape[0]):
                    sd[b + f"experts.{e}.{wid}.weight"] = exps[e]
            for g in ("gate", "up", "down"):
                sd[b + f"shared_experts.{g}_proj.weight"] = \
                    t[p + f"ffn_{g}_shexp.weight"]
    cfg = dict(model_type="kimi_linear", hidden_size=64,
               num_hidden_layers=3, num_attention_heads=4,
               num_key_value_heads=4,
               linear_attn_config=dict(full_attn_layers=[2], head_dim=16,
                                       short_conv_kernel_size=4),
               qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
               kv_lora_rank=24, num_local_experts=4, num_experts_per_tok=2,
               moe_intermediate_size=32, num_shared_experts=1,
               first_k_dense_replace=1, routed_scaling_factor=2.446,
               intermediate_size=64, max_position_embeddings=256,
               rope_theta=10000.0, rms_norm_eps=1e-6,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "kimi", cfg, sd), tmp_path,
            "kimi-linear")


def test_roundtrip_lfm2_moe(tmp_path):
    from tpullm.models.testing import make_tiny_lfm2_gguf

    fx = make_tiny_lfm2_gguf(tmp_path / "a.gguf", n_expert=4)
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.embedding_norm.weight": t["token_embd_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    kinds = ["conv", "attn", "conv"]
    for i, kind in enumerate(kinds):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "operator_norm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "ffn_norm.weight"] = t[p + "ffn_norm.weight"]
        if kind == "conv":
            sd[h + "conv.in_proj.weight"] = t[p + "shortconv.in_proj.weight"]
            sd[h + "conv.conv.weight"] = \
                t[p + "shortconv.conv.weight"][:, None, :]
            sd[h + "conv.out_proj.weight"] = \
                t[p + "shortconv.out_proj.weight"]
        else:
            for g, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
                sd[h + f"self_attn.{hf}.weight"] = t[p + f"attn_{g}.weight"]
            sd[h + "self_attn.q_layernorm.weight"] = \
                t[p + "attn_q_norm.weight"]
            sd[h + "self_attn.k_layernorm.weight"] = \
                t[p + "attn_k_norm.weight"]
            sd[h + "self_attn.out_proj.weight"] = \
                t[p + "attn_output.weight"]
        if p + "ffn_gate.weight" in t:  # dense lead
            sd[h + "feed_forward.w1.weight"] = t[p + "ffn_gate.weight"]
            sd[h + "feed_forward.w3.weight"] = t[p + "ffn_up.weight"]
            sd[h + "feed_forward.w2.weight"] = t[p + "ffn_down.weight"]
        else:
            f = h + "feed_forward."
            sd[f + "gate.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[f + "expert_bias"] = t[p + "exp_probs_b.bias"]
            for kind2, wid in (("gate", "w1"), ("down", "w2"), ("up", "w3")):
                exps = t[p + f"ffn_{kind2}_exps.weight"]
                for e in range(exps.shape[0]):
                    sd[f + f"experts.{e}.{wid}.weight"] = exps[e]
    cfg = dict(model_type="lfm2_moe", hidden_size=64, num_hidden_layers=3,
               num_attention_heads=4, num_key_value_heads=2,
               layer_types=["conv", "full_attention", "conv"],
               conv_L_cache=3, intermediate_size=96, num_experts=4,
               num_experts_per_tok=2, moe_intermediate_size=32,
               num_dense_layers=1, norm_topk_prob=True,
               max_position_embeddings=256, rope_theta=10000.0,
               norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "lfm2moe", cfg, sd), tmp_path,
            "lfm2moe")


def test_roundtrip_arctic(tmp_path):
    from tpullm.gguf import GGUFWriter
    from tpullm.models.testing import make_tiny_moe_gguf

    base = make_tiny_moe_gguf(tmp_path / "base.gguf", arch="arctic")
    r = GGUFReader(base)
    fx = str(tmp_path / "arctic.gguf")
    w = GGUFWriter(fx, architecture="arctic")
    for k, v in r.metadata.items():
        if k != "general.architecture":
            w.add_kv(k, v)
    rng = np.random.default_rng(11)
    for name, t_ in r.tensors.items():
        w.add_packed_tensor(name, t_.shape, t_.ggml_type, t_.data.tobytes())
    for i in range(2):
        p = f"blk.{i}."
        w.add_tensor(p + "ffn_gate.weight",
                     (rng.standard_normal((32, 64)) * 0.05).astype(np.float32))
        w.add_tensor(p + "ffn_up.weight",
                     (rng.standard_normal((32, 64)) * 0.05).astype(np.float32))
        w.add_tensor(p + "ffn_down.weight",
                     (rng.standard_normal((64, 32)) * 0.05).astype(np.float32))
        w.add_tensor(p + "ffn_norm_exps.weight", np.ones(64, np.float32))
    w.write()
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "residual_layernorm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = \
            t[p + "ffn_norm_exps.weight"]
        sd[h + "self_attn.q_proj.weight"] = _unpermute_qk(
            t[p + "attn_q.weight"], 4)
        sd[h + "self_attn.k_proj.weight"] = _unpermute_qk(
            t[p + "attn_k.weight"], 2)
        sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
        sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        for g, wid in (("gate", "w1"), ("down", "w2"), ("up", "w3")):
            sd[h + f"residual_mlp.{wid}.weight"] = t[p + f"ffn_{g}.weight"]
            exps = t[p + f"ffn_{g}_exps.weight"]
            for e in range(exps.shape[0]):
                sd[h + f"block_sparse_moe.experts.{e}.{wid}.weight"] = \
                    exps[e]
        sd[h + "block_sparse_moe.gate.weight"] = t[p + "ffn_gate_inp.weight"]
    cfg = dict(model_type="arctic", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=32, moe_intermediate_size=96,
               num_local_experts=4, num_experts_per_tok=2,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "arctic", cfg, sd), tmp_path, "arctic")


def test_roundtrip_smallthinker(tmp_path):
    from tpullm.models.testing import make_tiny_moe_gguf

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="smallthinker")
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
        sd[h + "block_sparse_moe.primary_router.weight"] = \
            t[p + "ffn_gate_inp.weight"]
        for g in ("gate", "up", "down"):
            exps = t[p + f"ffn_{g}_exps.weight"]
            for e in range(exps.shape[0]):
                sd[h + f"block_sparse_moe.experts.{e}.{g}.weight"] = exps[e]
    cfg = dict(model_type="smallthinker", hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, moe_num_primary_experts=4,
               moe_num_active_primary_experts=2, moe_ffn_hidden_size=96,
               moe_primary_router_apply_softmax=True,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "smallthinker", cfg, sd), tmp_path,
            "smallthinker")


def test_roundtrip_rnd1(tmp_path):
    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.tools.diffusion import diffusion_generate

    fx = make_tiny_moe_gguf(tmp_path / "a.gguf", arch="rnd1")
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
        sd[h + "mlp.gate.weight"] = t[p + "ffn_gate_inp.weight"]
        for g in ("gate", "up", "down"):
            exps = t[p + f"ffn_{g}_exps.weight"]
            for e in range(exps.shape[0]):
                sd[h + f"mlp.experts.{e}.{g}_proj.weight"] = exps[e]
    cfg = dict(model_type="rnd1", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=96, moe_intermediate_size=96,
               num_experts=4, num_experts_per_tok=2, mask_token_id=0,
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    out = str(tmp_path / "m.gguf")
    src = _write_hf(tmp_path, "rnd1", cfg, sd)
    stats = convert_hf_to_gguf(src, out, outtype="f32", verbose=False)
    assert stats["arch"] == "rnd1"
    ids = [3, 17, 42, 7]
    ref = diffusion_generate(Engine(fx, mode="dense", max_seq=64), ids,
                             max_length=8, steps=3, mask_token_id=0)
    got = diffusion_generate(Engine(out, mode="dense", max_seq=64), ids,
                             max_length=8, steps=3, mask_token_id=0)
    assert ref == got


def test_roundtrip_deci(tmp_path):
    from tpullm.models.testing import make_tiny_deci_gguf

    fx = make_tiny_deci_gguf(tmp_path / "a.gguf",
                             ffs=[256, 256, 256, 256, 0])
    t, md = _fixture_tensors(fx)
    heads = [4, 4, 0, 4, 0]
    kvs = [2, 1, 0, 0, 0]
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    block_configs = []
    for i in range(5):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        if kvs[i] > 0:
            att = {"n_heads_in_group": heads[i] // kvs[i],
                   "replace_with_linear": False}
            sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
            sd[h + "self_attn.q_proj.weight"] = _unpermute_qk(
                t[p + "attn_q.weight"], heads[i])
            sd[h + "self_attn.k_proj.weight"] = _unpermute_qk(
                t[p + "attn_k.weight"], kvs[i])
            sd[h + "self_attn.v_proj.weight"] = t[p + "attn_v.weight"]
            sd[h + "self_attn.o_proj.weight"] = t[p + "attn_output.weight"]
        elif heads[i] > 0:  # linear attention
            att = {"n_heads_in_group": None, "replace_with_linear": True}
            sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
            sd[h + "self_attn.linear_attn.weight"] = \
                t[p + "attn_output.weight"]
        else:
            att = {"n_heads_in_group": None, "replace_with_linear": False}
        if p + "ffn_gate.weight" in t:
            # 256 = _ffn_mult_to_intermediate_size(6.0, 64)
            ffn = {"ffn_mult": 6.0}
            sd[h + "post_attention_layernorm.weight"] = \
                t[p + "ffn_norm.weight"]
            for g in ("gate", "up", "down"):
                sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
        else:
            ffn = {"ffn_mult": None}
        block_configs.append({"attention": att, "ffn": ffn})
    cfg = dict(model_type="nemotron-nas", hidden_size=64,
               num_hidden_layers=5, num_attention_heads=4,
               block_configs=block_configs, max_position_embeddings=256,
               rope_theta=10000.0, rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _parity(fx, _write_hf(tmp_path, "deci", cfg, sd), tmp_path, "deci")
