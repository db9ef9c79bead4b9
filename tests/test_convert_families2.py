"""Round-trip conversion oracle, batch 2: llama-graph aliases with custom
checkpoint naming (EXAONE, InternLM2, MiniCPM3, OpenELM, PLaMo 1/2/3,
Baichuan, Xverse, Orion, Qwen v1, CodeShell, Jais).

Same scheme as test_convert_families.py: fixture GGUF (numpy-validated in
test_archs.py) → HF-named checkpoint written here from the public wire
format → tpullm-convert-hf → logit parity against the fixture engine."""

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
    """Inverse of the GGUF interleaved-pair layout → HF rotate-half."""
    s = w.shape
    return (w.reshape(n_head, s[0] // n_head // 2, 2, *s[1:])
            .swapaxes(1, 2).reshape(s))


_LLAMA_COMMON = dict(
    vocab_size=None, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-5,
    pad_token_id=0, bos_token_id=1, eos_token_id=2,
)


def _llama_sd(t, n_layer, hf_layer, top):
    """Map fixture tensors to HF names via a per-layer suffix table."""
    sd = {}
    for g, h in top.items():
        if g in t:
            sd[h] = t[g]
    for i in range(n_layer):
        p = f"blk.{i}."
        for g, h in hf_layer.items():
            if p + g in t:
                sd[h.format(i=i)] = t[p + g]
    return sd


def test_roundtrip_exaone(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="exaone")
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "transformer.h.{i}.ln_1.weight",
        "ffn_norm.weight": "transformer.h.{i}.ln_2.weight",
        "attn_q.weight": "transformer.h.{i}.attn.attention.q_proj.weight",
        "attn_k.weight": "transformer.h.{i}.attn.attention.k_proj.weight",
        "attn_v.weight": "transformer.h.{i}.attn.attention.v_proj.weight",
        "attn_output.weight":
            "transformer.h.{i}.attn.attention.out_proj.weight",
        "ffn_gate.weight": "transformer.h.{i}.mlp.c_fc_0.weight",
        "ffn_up.weight": "transformer.h.{i}.mlp.c_fc_1.weight",
        "ffn_down.weight": "transformer.h.{i}.mlp.c_proj.weight",
    }, {
        "token_embd.weight": "transformer.wte.weight",
        "output_norm.weight": "transformer.ln_f.weight",
        "output.weight": "lm_head.weight",
    })
    cfg = dict(_LLAMA_COMMON, model_type="exaone", vocab_size=t[
        "token_embd.weight"].shape[0], activation_function="silu")
    _parity(fx, _write_hf(tmp_path, "exaone", cfg, sd), tmp_path, "exaone")


def test_roundtrip_internlm2(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="internlm2")
    t, md = _fixture_tensors(fx)
    n_head, n_kv, hd = 4, 2, 16
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "model.layers.{i}.attention_norm.weight",
        "ffn_norm.weight": "model.layers.{i}.ffn_norm.weight",
        "attn_output.weight": "model.layers.{i}.attention.wo.weight",
        "ffn_gate.weight": "model.layers.{i}.feed_forward.w1.weight",
        "ffn_up.weight": "model.layers.{i}.feed_forward.w3.weight",
        "ffn_down.weight": "model.layers.{i}.feed_forward.w2.weight",
    }, {
        "token_embd.weight": "model.tok_embeddings.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "output.weight",
    })
    g = n_head // n_kv
    for i in range(2):
        p = f"blk.{i}."
        E = t[p + "attn_q.weight"].shape[-1]
        q = _unpermute_qk(t[p + "attn_q.weight"], n_head).reshape(
            n_kv, g, hd, E)
        k = _unpermute_qk(t[p + "attn_k.weight"], n_kv).reshape(
            n_kv, 1, hd, E)
        v = t[p + "attn_v.weight"].reshape(n_kv, 1, hd, E)
        wqkv = np.concatenate([q, k, v], axis=1).reshape(-1, E)
        sd[f"model.layers.{i}.attention.wqkv.weight"] = wqkv
    cfg = dict(_LLAMA_COMMON, model_type="internlm2",
               vocab_size=t["token_embd.weight"].shape[0], bias=False)
    _parity(fx, _write_hf(tmp_path, "internlm2", cfg, sd), tmp_path,
            "internlm2")


def test_roundtrip_minicpm3(tmp_path):
    from tpullm.models.testing import make_tiny_deepseek2_gguf

    fx = make_tiny_deepseek2_gguf(tmp_path / "a.gguf", arch="minicpm3",
                                  n_dense_lead=10**6)
    t, md = _fixture_tensors(fx)
    n_layer = int(md["minicpm3.block_count"])
    sd = _llama_sd(t, n_layer, {
        "attn_norm.weight": "model.layers.{i}.input_layernorm.weight",
        "ffn_norm.weight":
            "model.layers.{i}.post_attention_layernorm.weight",
        "attn_q_a.weight": "model.layers.{i}.self_attn.q_a_proj.weight",
        "attn_q_a_norm.weight":
            "model.layers.{i}.self_attn.q_a_layernorm.weight",
        "attn_q_b.weight": "model.layers.{i}.self_attn.q_b_proj.weight",
        "attn_kv_a_mqa.weight":
            "model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight",
        "attn_kv_a_norm.weight":
            "model.layers.{i}.self_attn.kv_a_layernorm.weight",
        "attn_kv_b.weight": "model.layers.{i}.self_attn.kv_b_proj.weight",
        "attn_output.weight": "model.layers.{i}.self_attn.o_proj.weight",
        "ffn_gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
        "ffn_up.weight": "model.layers.{i}.mlp.up_proj.weight",
        "ffn_down.weight": "model.layers.{i}.mlp.down_proj.weight",
    }, {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    })
    cfg = dict(_LLAMA_COMMON, model_type="minicpm3",
               vocab_size=t["token_embd.weight"].shape[0],
               num_hidden_layers=n_layer, num_key_value_heads=4,
               intermediate_size=int(md["minicpm3.feed_forward_length"]),
               qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
               q_lora_rank=24, kv_lora_rank=24)
    _parity(fx, _write_hf(tmp_path, "minicpm3", cfg, sd), tmp_path,
            "minicpm3")


def test_roundtrip_openelm(tmp_path):
    from tpullm.models.testing import make_tiny_openelm_gguf

    fx = make_tiny_openelm_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "transformer.token_embeddings.weight": t["token_embd.weight"],
        "transformer.norm.weight": t["output_norm.weight"],
    }
    ffs = [int(v) for v in md["openelm.feed_forward_length"]]
    for i in range(2):
        p = f"blk.{i}."
        h = f"transformer.layers.{i}."
        sd[h + "attn_norm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "ffn_norm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "attn.qkv_proj.weight"] = t[p + "attn_qkv.weight"]
        sd[h + "attn.q_norm.weight"] = t[p + "attn_q_norm.weight"]
        sd[h + "attn.k_norm.weight"] = t[p + "attn_k_norm.weight"]
        sd[h + "attn.out_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "ffn.proj_1.weight"] = np.concatenate(
            [t[p + "ffn_gate.weight"], t[p + "ffn_up.weight"]], axis=0)
        sd[h + "ffn.proj_2.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="openelm", model_dim=64,
               num_transformer_layers=2, head_dim=16,
               num_query_heads=[2, 4], num_kv_heads=[1, 2],
               ffn_multipliers=[1.5, 2.0], ffn_dim_divisor=32,
               max_context_length=256, rope_freq_constant=10000,
               vocab_size=t["token_embd.weight"].shape[0],
               pad_token_id=0, bos_token_id=1, eos_token_id=2)
    assert ffs == [96, 128]  # _make_divisible must reproduce the fixture
    # real OpenELM hardcodes rms eps 1e-6 (modeling_openelm.py; the
    # converter mirrors that) — align the fixture engine to it
    src = _write_hf(tmp_path, "openelm", cfg, sd)
    out = str(tmp_path / "m.gguf")
    stats = convert_hf_to_gguf(src, out, outtype="f32", verbose=False)
    assert stats["arch"] == "openelm"
    ids = [3, 17, 42, 7, 19, 55, 30, 4]
    ref = Engine(fx, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32, override_kv={
                     "openelm.attention.layer_norm_rms_epsilon": 1e-6,
                 }).prefill_all_logits(ids)
    got = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_roundtrip_plamo1(tmp_path):
    from tpullm.models.testing import make_tiny_plamo_gguf

    fx = make_tiny_plamo_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "model.layers.layers.{i}.norm.weight",
        "attn_q.weight": "model.layers.layers.{i}.self_attn.q_proj.weight",
        "attn_k.weight": "model.layers.layers.{i}.self_attn.k_proj.weight",
        "attn_v.weight": "model.layers.layers.{i}.self_attn.v_proj.weight",
        "attn_output.weight":
            "model.layers.layers.{i}.self_attn.o_proj.weight",
        "ffn_gate.weight": "model.layers.layers.{i}.mlp.gate_proj.weight",
        "ffn_up.weight": "model.layers.layers.{i}.mlp.up_proj.weight",
        "ffn_down.weight": "model.layers.layers.{i}.mlp.down_proj.weight",
    }, {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    })
    cfg = dict(_LLAMA_COMMON, model_type="plamo",
               vocab_size=t["token_embd.weight"].shape[0],
               num_key_value_heads=4, intermediate_size=96)
    _parity(fx, _write_hf(tmp_path, "plamo", cfg, sd), tmp_path, "plamo")


def test_roundtrip_plamo2(tmp_path):
    from tpullm.models.testing import make_tiny_plamo2_gguf

    fx = make_tiny_plamo2_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"] - 1.0,
        "lm_head.weight": t["output.weight"],
    }
    for i in range(2):
        p = f"blk.{i}."
        h = f"model.layers.layers.{i}."
        sd[h + "pre_mixer_norm.weight"] = t[p + "attn_norm.weight"] - 1.0
        sd[h + "post_mixer_norm.weight"] = (
            t[p + "post_attention_norm.weight"] - 1.0 / 5)
        sd[h + "pre_mlp_norm.weight"] = t[p + "ffn_norm.weight"] - 1.0
        sd[h + "post_mlp_norm.weight"] = (
            t[p + "post_ffw_norm.weight"] - 1.0 / 5 ** 1.5)
        sd[h + "mlp.gate_up_proj.weight"] = t[p + "ffn_up.weight"]
        sd[h + "mlp.down_proj.weight"] = t[p + "ffn_down.weight"]
        if p + "ssm_in.weight" in t:  # mamba mixer layer
            sd[h + "mixer.in_proj.weight"] = t[p + "ssm_in.weight"]
            sd[h + "mixer.conv1d.weight"] = \
                t[p + "ssm_conv1d.weight"][:, None, :]
            sd[h + "mixer.bcdt_proj.weight"] = t[p + "ssm_x.weight"]
            sd[h + "mixer.dt_proj.weight"] = t[p + "ssm_dt.weight"]
            sd[h + "mixer.dt_bias"] = t[p + "ssm_dt.bias"]
            sd[h + "mixer.dt_norm_weight"] = t[p + "ssm_dt_norm.weight"]
            sd[h + "mixer.B_norm_weight"] = t[p + "ssm_b_norm.weight"]
            sd[h + "mixer.C_norm_weight"] = t[p + "ssm_c_norm.weight"]
            sd[h + "mixer.A_log"] = np.log(-t[p + "ssm_a"])
            sd[h + "mixer.D"] = t[p + "ssm_d"]
            sd[h + "mixer.out_proj.weight"] = t[p + "ssm_out.weight"]
        else:  # attention mixer layer
            sd[h + "mixer.qkv_proj.weight"] = t[p + "attn_qkv.weight"]
            sd[h + "mixer.o_proj.weight"] = t[p + "attn_output.weight"]
            sd[h + "mixer.q_weight"] = t[p + "attn_q_norm.weight"]
            sd[h + "mixer.k_weight"] = t[p + "attn_k_norm.weight"]
    cfg = dict(model_type="plamo2", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               hidden_size_per_head=16, mamba_num_heads=4,
               mamba_d_state=16, mamba_d_conv=4, mamba_step=2,
               mamba_enabled=True, intermediate_size=48,
               rms_norm_eps=1e-6, max_position_embeddings=256,
               rope_theta=10000.0,
               vocab_size=t["token_embd.weight"].shape[0],
               pad_token_id=0, bos_token_id=1, eos_token_id=2)
    _parity(fx, _write_hf(tmp_path, "plamo2", cfg, sd), tmp_path, "plamo2")


def test_roundtrip_plamo3(tmp_path):
    from tpullm.models.testing import make_tiny_plamo3_gguf

    fx = make_tiny_plamo3_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"] - 1.0,
        "lm_head.weight": t["output.weight"],
    }
    for i in range(3):
        p = f"blk.{i}."
        h = f"model.layers.layers.{i}."
        sd[h + "pre_mixer_norm.weight"] = t[p + "attn_norm.weight"] - 1.0
        sd[h + "post_mixer_norm.weight"] = (
            t[p + "post_attention_norm.weight"] - 1.0 / 5)
        sd[h + "pre_mlp_norm.weight"] = t[p + "ffn_norm.weight"] - 1.0
        sd[h + "post_mlp_norm.weight"] = (
            t[p + "post_ffw_norm.weight"] - 1.0 / 5 ** 1.5)
        sd[h + "mixer.qkv_proj.weight"] = t[p + "attn_qkv.weight"]
        sd[h + "mixer.o_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "mixer.q_norm.weight"] = t[p + "attn_q_norm.weight"] - 1.0
        sd[h + "mixer.k_norm.weight"] = t[p + "attn_k_norm.weight"] - 1.0
        sd[h + "mlp.gate_up_proj.weight"] = t[p + "ffn_up.weight"]
        sd[h + "mlp.down_proj.weight"] = t[p + "ffn_down.weight"]
    cfg = dict(model_type="plamo3", hidden_size=64, num_hidden_layers=3,
               num_attention_heads=4, num_key_value_heads=2,
               hidden_size_per_head=16, intermediate_size=48,
               rms_norm_eps=1e-5, max_position_embeddings=256,
               rope_theta=1000000.0, rope_local_theta=10000.0,
               window_size=8, sliding_window_pattern=3,
               vocab_size=t["token_embd.weight"].shape[0],
               pad_token_id=0, bos_token_id=1, eos_token_id=2)
    _parity(fx, _write_hf(tmp_path, "plamo3", cfg, sd), tmp_path, "plamo3")


def test_roundtrip_baichuan(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="baichuan",
                              n_head_kv=4)  # W_pack implies MHA
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "model.layers.{i}.input_layernorm.weight",
        "ffn_norm.weight":
            "model.layers.{i}.post_attention_layernorm.weight",
        "attn_output.weight": "model.layers.{i}.self_attn.o_proj.weight",
        "ffn_gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
        "ffn_up.weight": "model.layers.{i}.mlp.up_proj.weight",
        "ffn_down.weight": "model.layers.{i}.mlp.down_proj.weight",
    }, {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    })
    for i in range(2):
        p = f"blk.{i}."
        sd[f"model.layers.{i}.self_attn.W_pack.weight"] = np.concatenate([
            _unpermute_qk(t[p + "attn_q.weight"], 4),
            _unpermute_qk(t[p + "attn_k.weight"], 4),
            t[p + "attn_v.weight"],
        ], axis=0)
    cfg = dict(_LLAMA_COMMON, model_type="baichuan",
               vocab_size=t["token_embd.weight"].shape[0],
               num_key_value_heads=4)
    del cfg["max_position_embeddings"]
    cfg["model_max_length"] = 256
    _parity(fx, _write_hf(tmp_path, "baichuan", cfg, sd), tmp_path,
            "baichuan")


def test_roundtrip_xverse(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf

    fx = make_tiny_llama_gguf(tmp_path / "a.gguf", arch="xverse")
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "model.layers.{i}.input_layernorm.weight",
        "ffn_norm.weight":
            "model.layers.{i}.post_attention_layernorm.weight",
        "attn_v.weight": "model.layers.{i}.self_attn.v_proj.weight",
        "attn_output.weight": "model.layers.{i}.self_attn.o_proj.weight",
        "ffn_gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
        "ffn_up.weight": "model.layers.{i}.mlp.up_proj.weight",
        "ffn_down.weight": "model.layers.{i}.mlp.down_proj.weight",
    }, {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    })
    for i in range(2):
        p = f"blk.{i}."
        sd[f"model.layers.{i}.self_attn.q_proj.weight"] = _unpermute_qk(
            t[p + "attn_q.weight"], 4)
        sd[f"model.layers.{i}.self_attn.k_proj.weight"] = _unpermute_qk(
            t[p + "attn_k.weight"], 2)
    cfg = dict(_LLAMA_COMMON, model_type="xverse",
               vocab_size=t["token_embd.weight"].shape[0])
    _parity(fx, _write_hf(tmp_path, "xverse", cfg, sd), tmp_path, "xverse")


def test_roundtrip_orion(tmp_path):
    from tpullm.models.testing import make_tiny_starcoder2_gguf

    fx = make_tiny_starcoder2_gguf(tmp_path / "a.gguf", arch="orion",
                                   with_bias=False, gated=True)
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "model.layers.{i}.input_layernorm.weight",
        "attn_norm.bias": "model.layers.{i}.input_layernorm.bias",
        "ffn_norm.weight":
            "model.layers.{i}.post_attention_layernorm.weight",
        "ffn_norm.bias": "model.layers.{i}.post_attention_layernorm.bias",
        "attn_q.weight": "model.layers.{i}.self_attn.q_proj.weight",
        "attn_k.weight": "model.layers.{i}.self_attn.k_proj.weight",
        "attn_v.weight": "model.layers.{i}.self_attn.v_proj.weight",
        "attn_output.weight": "model.layers.{i}.self_attn.o_proj.weight",
        "ffn_gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
        "ffn_up.weight": "model.layers.{i}.mlp.up_proj.weight",
        "ffn_down.weight": "model.layers.{i}.mlp.down_proj.weight",
    }, {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output_norm.bias": "model.norm.bias",
        "output.weight": "lm_head.weight",
    })
    cfg = dict(_LLAMA_COMMON, model_type="orion",
               vocab_size=t["token_embd.weight"].shape[0])
    _parity(fx, _write_hf(tmp_path, "orion", cfg, sd), tmp_path, "orion")


def test_roundtrip_qwen_v1(tmp_path):
    from tpullm.models.testing import make_tiny_qwen_gguf

    fx = make_tiny_qwen_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "transformer.h.{i}.ln_1.weight",
        "ffn_norm.weight": "transformer.h.{i}.ln_2.weight",
        "attn_qkv.weight": "transformer.h.{i}.attn.c_attn.weight",
        "attn_qkv.bias": "transformer.h.{i}.attn.c_attn.bias",
        "attn_output.weight": "transformer.h.{i}.attn.c_proj.weight",
        "ffn_up.weight": "transformer.h.{i}.mlp.w1.weight",
        "ffn_gate.weight": "transformer.h.{i}.mlp.w2.weight",
        "ffn_down.weight": "transformer.h.{i}.mlp.c_proj.weight",
    }, {
        "token_embd.weight": "transformer.wte.weight",
        "output_norm.weight": "transformer.ln_f.weight",
        "output.weight": "lm_head.weight",
    })
    cfg = dict(model_type="qwen", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=256,  # 2 × n_ff
               seq_length=256, rotary_emb_base=10000.0,
               layer_norm_epsilon=1e-5, rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0],
               pad_token_id=0, bos_token_id=1, eos_token_id=2)
    _parity(fx, _write_hf(tmp_path, "qwen", cfg, sd), tmp_path, "qwen")


def test_roundtrip_codeshell(tmp_path):
    from tpullm.models.testing import make_tiny_falcon_gguf

    fx = make_tiny_falcon_gguf(tmp_path / "a.gguf", arch="codeshell",
                               rot_frac=0.5)
    t, md = _fixture_tensors(fx)
    sd = _llama_sd(t, 2, {
        "attn_norm.weight": "transformer.h.{i}.ln_1.weight",
        "attn_norm.bias": "transformer.h.{i}.ln_1.bias",
        "ffn_norm.weight": "transformer.h.{i}.ln_2.weight",
        "ffn_norm.bias": "transformer.h.{i}.ln_2.bias",
        "attn_qkv.weight": "transformer.h.{i}.attn.c_attn.weight",
        "attn_qkv.bias": "transformer.h.{i}.attn.c_attn.bias",
        "attn_output.weight": "transformer.h.{i}.attn.c_proj.weight",
        "attn_output.bias": "transformer.h.{i}.attn.c_proj.bias",
        "ffn_up.weight": "transformer.h.{i}.mlp.c_fc.weight",
        "ffn_up.bias": "transformer.h.{i}.mlp.c_fc.bias",
        "ffn_down.weight": "transformer.h.{i}.mlp.c_proj.weight",
        "ffn_down.bias": "transformer.h.{i}.mlp.c_proj.bias",
    }, {
        "token_embd.weight": "transformer.wte.weight",
        "output_norm.weight": "transformer.ln_f.weight",
        "output_norm.bias": "transformer.ln_f.bias",
        "output.weight": "lm_head.weight",
    })
    cfg = dict(model_type="codeshell", n_embd=64, n_layer=2, n_head=4,
               num_query_groups=2, n_positions=256, n_inner=128,
               rotary_pct=0.5, rope_theta=10000.0,
               layer_norm_epsilon=1e-5,
               vocab_size=t["token_embd.weight"].shape[0],
               pad_token_id=0, bos_token_id=1, eos_token_id=2)
    _parity(fx, _write_hf(tmp_path, "codeshell", cfg, sd), tmp_path,
            "codeshell")


def test_roundtrip_jais(tmp_path):
    from tpullm.models.testing import make_tiny_bloom_gguf

    fx = make_tiny_bloom_gguf(tmp_path / "a.gguf", arch="jais")
    t, md = _fixture_tensors(fx)
    sd = {
        "transformer.wte.weight": t["token_embd.weight"],
        "transformer.ln_f.weight": t["output_norm.weight"],
        "transformer.ln_f.bias": t["output_norm.bias"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(2):
        p = f"blk.{i}."
        h = f"transformer.h.{i}."
        sd[h + "ln_1.weight"] = t[p + "attn_norm.weight"]
        sd[h + "ln_1.bias"] = t[p + "attn_norm.bias"]
        sd[h + "ln_2.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "ln_2.bias"] = t[p + "ffn_norm.bias"]
        sd[h + "attn.c_attn.weight"] = t[p + "attn_qkv.weight"].T
        sd[h + "attn.c_attn.bias"] = t[p + "attn_qkv.bias"]
        sd[h + "attn.c_proj.weight"] = t[p + "attn_output.weight"].T
        sd[h + "attn.c_proj.bias"] = t[p + "attn_output.bias"]
        sd[h + "mlp.c_fc.weight"] = t[p + "ffn_up.weight"].T
        sd[h + "mlp.c_fc.bias"] = t[p + "ffn_up.bias"]
        sd[h + "mlp.c_fc2.weight"] = t[p + "ffn_gate.weight"].T
        sd[h + "mlp.c_fc2.bias"] = t[p + "ffn_gate.bias"]
        sd[h + "mlp.c_proj.weight"] = t[p + "ffn_down.weight"].T
        sd[h + "mlp.c_proj.bias"] = t[p + "ffn_down.bias"]
    cfg = dict(model_type="jais", n_embd=64, n_layer=2, n_head=4,
               n_positions=256, n_inner=128, layer_norm_epsilon=1e-5,
               max_alibi_bias=8.0,
               vocab_size=t["token_embd.weight"].shape[0],
               pad_token_id=0, bos_token_id=1, eos_token_id=2)
    _parity(fx, _write_hf(tmp_path, "jais", cfg, sd), tmp_path, "jais")
