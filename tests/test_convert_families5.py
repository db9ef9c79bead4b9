"""Round-trip conversion oracle, batch 5: the encoder tail
(Nomic-BERT-MoE, NeoBERT, Jina-BERT-v2, EmbeddingGemma, T5-encoder,
CogVLM text stack). Encoders compare pooled hidden states; CogVLM compares
causal logits."""

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


_IDS = dict(pad_token_id=0, bos_token_id=1, eos_token_id=2)


def test_roundtrip_nomic_bert_moe(tmp_path):
    from tpullm.models.testing import make_tiny_nomic_moe_gguf

    fx = make_tiny_nomic_moe_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    arch = "nomic-bert-moe"
    n_expert = int(md[f"{arch}.expert_count"])
    n_layer = int(md[f"{arch}.block_count"])
    E = int(md[f"{arch}.embedding_length"])
    n_inner = int(md[f"{arch}.feed_forward_length"])
    sd = {
        "embeddings.word_embeddings.weight": t["token_embd.weight"],
        "embeddings.token_type_embeddings.weight": t["token_types.weight"],
        "emb_ln.weight": t["token_embd_norm.weight"],
        "emb_ln.bias": t["token_embd_norm.bias"],
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"encoder.layers.{i}."
        sd[h + "attn.Wqkv.weight"] = t[p + "attn_qkv.weight"]
        sd[h + "attn.Wqkv.bias"] = t[p + "attn_qkv.bias"]
        sd[h + "attn.out_proj.weight"] = t[p + "attn_output.weight"]
        sd[h + "attn.out_proj.bias"] = t[p + "attn_output.bias"]
        sd[h + "norm1.weight"] = t[p + "attn_output_norm.weight"]
        sd[h + "norm1.bias"] = t[p + "attn_output_norm.bias"]
        sd[h + "norm2.weight"] = t[p + "layer_output_norm.weight"]
        sd[h + "norm2.bias"] = t[p + "layer_output_norm.bias"]
        if p + "ffn_gate_inp.weight" in t:  # MoE layer
            sd[h + "mlp.router.layer.weight"] = t[p + "ffn_gate_inp.weight"]
            sd[h + "mlp.experts.mlp.w1"] = \
                t[p + "ffn_up_exps.weight"].reshape(-1, E)
            sd[h + "mlp.experts.mlp.w2"] = \
                t[p + "ffn_down_exps.weight"].transpose(0, 2, 1).reshape(
                    -1, E)
        else:
            sd[h + "mlp.fc1.weight"] = t[p + "ffn_up.weight"]
            sd[h + "mlp.fc1.bias"] = t[p + "ffn_up.bias"]
            sd[h + "mlp.fc2.weight"] = t[p + "ffn_down.weight"]
            sd[h + "mlp.fc2.bias"] = t[p + "ffn_down.bias"]
    cfg = dict(model_type="nomic_bert", n_embd=E, n_layer=n_layer,
               n_head=int(md[f"{arch}.attention.head_count"]),
               n_inner=n_inner, n_positions=2048,
               max_trained_positions=2048,
               moe_every_n_layers=int(md[f"{arch}.moe_every_n_layers"]),
               num_experts=n_expert, moe_top_k=2,
               rotary_emb_base=float(md[f"{arch}.rope.freq_base"]),
               layer_norm_epsilon=1e-12, causal=False,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _embed_parity(fx, _write_hf(tmp_path, "nomicmoe", cfg, sd), tmp_path,
                  arch, atol=5e-4)


def test_roundtrip_neobert(tmp_path):
    from tpullm.models.testing import make_tiny_neo_bert_gguf

    fx = make_tiny_neo_bert_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    sd = {
        "model.encoder.weight": t["token_embd.weight"],
        "model.layer_norm.weight": t["enc.output_norm.weight"],
    }
    for i in range(2):
        p, h = f"blk.{i}.", f"model.transformer_encoder.{i}."
        sd[h + "attention_norm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "qkv.weight"] = t[p + "attn_qkv.weight"]
        sd[h + "wo.weight"] = t[p + "attn_output.weight"]
        sd[h + "ffn_norm.weight"] = t[p + "ffn_norm.weight"]
        sd[h + "ffn.w12.weight"] = t[p + "ffn_up.weight"]
        sd[h + "ffn.w3.weight"] = t[p + "ffn_down.weight"]
    # neobert ffn = 2/3 intermediate_size; fixture n_ff=48 → 72
    cfg = dict(model_type="neobert", hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=72, norm_eps=1e-5,
               max_position_embeddings=128, max_length=128,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _embed_parity(fx, _write_hf(tmp_path, "neobert", cfg, sd), tmp_path,
                  "neo-bert")


def test_roundtrip_gemma_embedding(tmp_path):
    from tpullm.models.testing import make_tiny_gemma_embedding_gguf

    fx = make_tiny_gemma_embedding_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    arch = "gemma-embedding"
    n_layer = int(md[f"{arch}.block_count"])
    sd = {"model.embed_tokens.weight": t["token_embd.weight"],
          "model.norm.weight": t["output_norm.weight"] - 1.0}
    REV = {
        "attn_norm.weight": "input_layernorm.weight",
        "post_attention_norm.weight": "post_attention_layernorm.weight",
        "ffn_norm.weight": "pre_feedforward_layernorm.weight",
        "post_ffw_norm.weight": "post_feedforward_layernorm.weight",
        "attn_q_norm.weight": "self_attn.q_norm.weight",
        "attn_k_norm.weight": "self_attn.k_norm.weight",
    }
    LIN = {
        "attn_q.weight": "self_attn.q_proj.weight",
        "attn_k.weight": "self_attn.k_proj.weight",
        "attn_v.weight": "self_attn.v_proj.weight",
        "attn_output.weight": "self_attn.o_proj.weight",
        "ffn_gate.weight": "mlp.gate_proj.weight",
        "ffn_up.weight": "mlp.up_proj.weight",
        "ffn_down.weight": "mlp.down_proj.weight",
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        for g, hf in REV.items():
            sd[h + hf] = t[p + g] - 1.0
        for g, hf in LIN.items():
            sd[h + hf] = t[p + g]
    hd = 16
    cfg = dict(model_type="gemma3_text",
               architectures=["Gemma3TextModel"], hidden_size=64,
               num_hidden_layers=n_layer, num_attention_heads=4,
               num_key_value_heads=2, head_dim=hd, intermediate_size=96,
               query_pre_attn_scalar=hd, sliding_window=8,
               sliding_window_pattern=6, rope_theta=1000000.0,
               rope_local_base_freq=10000.0, rms_norm_eps=1e-5,
               max_position_embeddings=128,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _embed_parity(fx, _write_hf(tmp_path, "gemma_emb", cfg, sd), tmp_path,
                  arch)


def test_roundtrip_t5encoder(tmp_path):
    from tpullm.models.testing import make_tiny_t5_gguf

    fx = make_tiny_t5_gguf(tmp_path / "a.gguf", arch="t5encoder")
    t, md = _fixture_tensors(fx)
    sd = {"shared.weight": t["token_embd.weight"],
          "encoder.final_layer_norm.weight": t["enc.output_norm.weight"]}
    n_layer = int(md["t5encoder.block_count"])
    for i in range(n_layer):
        p, h = f"enc.blk.{i}.", f"encoder.block.{i}."
        sd[h + "layer.0.SelfAttention.q.weight"] = t[p + "attn_q.weight"]
        sd[h + "layer.0.SelfAttention.k.weight"] = t[p + "attn_k.weight"]
        sd[h + "layer.0.SelfAttention.v.weight"] = t[p + "attn_v.weight"]
        sd[h + "layer.0.SelfAttention.o.weight"] = t[p + "attn_o.weight"]
        sd[h + "layer.0.layer_norm.weight"] = t[p + "attn_norm.weight"]
        if p + "attn_rel_b.weight" in t:
            sd[h + "layer.0.SelfAttention.relative_attention_bias.weight"] \
                = t[p + "attn_rel_b.weight"]
        if p + "ffn_gate.weight" in t:  # gated (flan-style) FFN
            sd[h + "layer.1.DenseReluDense.wi_0.weight"] = \
                t[p + "ffn_gate.weight"]
            sd[h + "layer.1.DenseReluDense.wi_1.weight"] = \
                t[p + "ffn_up.weight"]
        else:
            sd[h + "layer.1.DenseReluDense.wi.weight"] = \
                t[p + "ffn_up.weight"]
        sd[h + "layer.1.DenseReluDense.wo.weight"] = t[p + "ffn_down.weight"]
        sd[h + "layer.1.layer_norm.weight"] = t[p + "ffn_norm.weight"]
    cfg = dict(model_type="t5", architectures=["T5EncoderModel"],
               d_model=64, num_layers=n_layer, num_heads=4, d_kv=16,
               d_ff=int(md["t5encoder.feed_forward_length"]),
               relative_attention_num_buckets=int(
                   md["t5encoder.attention.relative_buckets_count"]),
               layer_norm_epsilon=1e-5, n_positions=256,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    _embed_parity(fx, _write_hf(tmp_path, "t5enc", cfg, sd), tmp_path,
                  "t5encoder")


def test_roundtrip_cogvlm(tmp_path):
    from tpullm.models.testing import make_tiny_cogvlm_gguf

    fx = make_tiny_cogvlm_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    n_layer = int(md["cogvlm.block_count"])
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        a = h + "self_attn."
        sd[a + "language_expert_query_key_value.weight"] = \
            t[p + "attn_qkv.weight"]
        sd[a + "language_expert_dense.weight"] = t[p + "attn_output.weight"]
        sd[a + "vision_expert_query_key_value.weight"] = \
            t[p + "vis_attn_qkv.weight"]
        sd[a + "vision_expert_dense.weight"] = t[p + "vis_attn_output.weight"]
        for g in ("gate", "up", "down"):
            sd[h + f"mlp.language_mlp.{g}_proj.weight"] = \
                t[p + f"ffn_{g}.weight"]
            sd[h + f"mlp.vision_mlp.{g}_proj.weight"] = \
                t[p + f"vis_{g}.weight"]
    cfg = dict(model_type="cogvlm", hidden_size=64, num_hidden_layers=n_layer,
               num_attention_heads=4, num_key_value_heads=4,
               intermediate_size=int(md["cogvlm.feed_forward_length"]),
               max_position_embeddings=256, rope_theta=10000.0,
               rms_norm_eps=1e-5,
               vocab_size=t["token_embd.weight"].shape[0], **_IDS)
    out = str(tmp_path / "m.gguf")
    src = _write_hf(tmp_path, "cogvlm", cfg, sd)
    stats = convert_hf_to_gguf(src, out, outtype="f32", verbose=False)
    assert stats["arch"] == "cogvlm"
    ids = [3, 17, 42, 7, 19, 55]
    ref = Engine(fx, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).prefill_all_logits(ids)
    got = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32).prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
