"""Round-trip conversion oracle for the custom-code HF families.

transformers ships no classes for these checkpoints (RWKV world, QRWKV,
ARWKV, ...), so logit parity against an HF forward isn't available. Instead
each test starts from a tiny fixture GGUF (whose numpy forward is validated
in tests/test_archs.py), re-expresses its tensors in the PUBLIC HF
checkpoint naming/layout for the family (the inverse of what the converter
must do — written here independently, from the checkpoint wire format), runs
tpullm-convert-hf over that synthetic checkpoint, and asserts the converted
model's logits match the fixture's. A wrong name mapping drops a tensor
(load error / logit drift); a wrong transpose or stack order changes shapes
or logits.

Reference: convert_hf_to_gguf.py Rwkv6Model/RWKV6Qwen2Model/Rwkv7Model/
ARwkv7Model and gguf-py tensor_mapping.py for the HF-side names.
"""

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
    ref_eng = Engine(fixture_gguf, mode="dense", dtype=jnp.float32,
                     max_seq=64, kv_dtype=jnp.float32)
    ref = ref_eng.prefill_all_logits(ids)
    eng = Engine(out, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    got = eng.prefill_all_logits(ids)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=atol)


def _lift3(v):  # (E,) → HF (1, 1, E) broadcast-param layout
    return v.reshape(1, 1, -1)


def test_roundtrip_rwkv6(tmp_path):
    from tpullm.models.testing import make_tiny_rwkv6_gguf

    fx = make_tiny_rwkv6_gguf(tmp_path / "a.gguf", rescale_every=2)
    t, md = _fixture_tensors(fx)
    E = int(md["rwkv6.embedding_length"])
    sd = {
        "rwkv.embeddings.weight": t["token_embd.weight"],
        "rwkv.blocks.0.pre_ln.weight": t["token_embd_norm.weight"],
        "rwkv.blocks.0.pre_ln.bias": t["token_embd_norm.bias"],
        "rwkv.ln_out.weight": t["output_norm.weight"],
        "rwkv.ln_out.bias": t["output_norm.bias"],
        "head.weight": t["output.weight"],
    }
    n_layer = int(md["rwkv6.block_count"])
    rescale = int(md["rwkv6.rescale_every_n_layers"])
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"rwkv.blocks.{i}."
        a = h + "attention."
        sd[h + "ln1.weight"] = t[p + "attn_norm.weight"]
        sd[h + "ln1.bias"] = t[p + "attn_norm.bias"]
        sd[h + "ln2.weight"] = t[p + "attn_norm_2.weight"]
        sd[h + "ln2.bias"] = t[p + "attn_norm_2.bias"]
        sd[a + "time_maa_x"] = _lift3(t[p + "time_mix_lerp_x.weight"])
        fused = t[p + "time_mix_lerp_fused.weight"].reshape(5, -1)
        for j, c in enumerate("wkvrg"):
            sd[a + f"time_maa_{c}"] = _lift3(fused[j])
        sd[a + "time_maa_w1"] = t[p + "time_mix_w1.weight"].T
        sd[a + "time_maa_w2"] = t[p + "time_mix_w2.weight"].transpose(0, 2, 1)
        sd[a + "time_decay"] = _lift3(t[p + "time_mix_decay.weight"])
        sd[a + "time_decay_w1"] = t[p + "time_mix_decay_w1.weight"].T
        sd[a + "time_decay_w2"] = t[p + "time_mix_decay_w2.weight"].T
        sd[a + "time_faaaa"] = t[p + "time_mix_first.weight"]
        scale = 2.0 ** (i // rescale)
        for hf, gg in (("receptance", "receptance"), ("key", "key"),
                       ("value", "value"), ("gate", "gate"),
                       ("output", "output")):
            v = t[p + f"time_mix_{gg}.weight"]
            sd[a + hf + ".weight"] = v * scale if hf == "output" else v
        sd[a + "ln_x.weight"] = t[p + "time_mix_ln.weight"]
        sd[a + "ln_x.bias"] = t[p + "time_mix_ln.bias"]
        f = h + "feed_forward."
        sd[f + "time_maa_k"] = _lift3(t[p + "channel_mix_lerp_k.weight"])
        sd[f + "time_maa_r"] = _lift3(t[p + "channel_mix_lerp_r.weight"])
        sd[f + "key.weight"] = t[p + "channel_mix_key.weight"]
        sd[f + "receptance.weight"] = t[p + "channel_mix_receptance.weight"]
        sd[f + "value.weight"] = t[p + "channel_mix_value.weight"] * scale
    cfg = dict(model_type="rwkv6", hidden_size=E, num_hidden_layers=n_layer,
               head_size=int(md["rwkv6.wkv.head_size"]),
               intermediate_size=int(md["rwkv6.feed_forward_length"]),
               rescale_every=rescale, layer_norm_epsilon=1e-5,
               vocab_size=t["token_embd.weight"].shape[0])
    src = _write_hf(tmp_path, "rwkv6", cfg, sd)
    _parity(fx, src, tmp_path, "rwkv6")


def test_roundtrip_rwkv6qwen2(tmp_path):
    from tpullm.models.testing import make_tiny_rwkv6qwen2_gguf

    fx = make_tiny_rwkv6qwen2_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    E = int(md["rwkv6qwen2.embedding_length"])
    n_layer = int(md["rwkv6qwen2.block_count"])
    H = int(md["rwkv6qwen2.attention.head_count"])
    PERM = [3, 1, 2, 0, 4]  # wkvrg → rkvwg (self-inverse)
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        a = h + "self_attn."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        for g in ("gate", "up", "down"):
            sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
        sd[a + "time_maa_x"] = _lift3(t[p + "time_mix_lerp_x.weight"])
        fused = t[p + "time_mix_lerp_fused.weight"].reshape(5, -1)
        for j, c in enumerate("wkvrg"):
            sd[a + f"time_maa_{c}"] = _lift3(fused[j])
        w1 = t[p + "time_mix_w1.weight"]  # (5r, E) in wkvrg order
        g1 = w1.reshape(5, -1, w1.shape[-1])[PERM].reshape(-1, w1.shape[-1])
        sd[a + "time_maa_w1"] = g1.T  # HF (E, 5r) in rkvwg order
        w2 = t[p + "time_mix_w2.weight"]  # (5, E, r)
        sd[a + "time_maa_w2"] = w2[PERM].transpose(0, 2, 1)  # HF (5, r, E)
        sd[a + "time_decay"] = _lift3(t[p + "time_mix_decay.weight"])
        sd[a + "time_decay_w1"] = t[p + "time_mix_decay_w1.weight"].T
        sd[a + "time_decay_w2"] = t[p + "time_mix_decay_w2.weight"].T
        for proj, gg in (("q_proj", "receptance"), ("k_proj", "key"),
                         ("v_proj", "value")):
            sd[a + proj + ".weight"] = t[p + f"time_mix_{gg}.weight"]
            sd[a + proj + ".bias"] = t[p + f"time_mix_{gg}.bias"]
        sd[a + "gate.weight"] = t[p + "time_mix_gate.weight"]
        sd[a + "o_proj.weight"] = t[p + "time_mix_output.weight"]
    head_size = int(md["rwkv6qwen2.wkv.head_size"])
    cfg = dict(model_type="rwkv6qwen2", hidden_size=E,
               num_hidden_layers=n_layer, num_attention_heads=H,
               num_key_value_heads=int(
                   md["rwkv6qwen2.attention.head_count_kv"]),
               intermediate_size=int(md["rwkv6qwen2.feed_forward_length"]),
               rms_norm_eps=1e-5, rescale_every=0,
               lora_rank_tokenshift=4, lora_rank_decay=4,
               vocab_size=t["token_embd.weight"].shape[0])
    assert E // H == head_size
    src = _write_hf(tmp_path, "rwkv6qwen2", cfg, sd)
    _parity(fx, src, tmp_path, "rwkv6qwen2")


def test_roundtrip_rwkv7(tmp_path):
    from tpullm.models.testing import make_tiny_rwkv7_gguf

    fx = make_tiny_rwkv7_gguf(tmp_path / "a.gguf", gated=True)
    t, md = _fixture_tensors(fx)
    E = int(md["rwkv7.embedding_length"])
    n_layer = int(md["rwkv7.block_count"])
    sd = {
        "model.embeddings.weight": t["token_embd.weight"],
        "model.pre_ln.weight": t["token_embd_norm.weight"],
        "model.pre_ln.bias": t["token_embd_norm.bias"],
        "model.ln_out.weight": t["output_norm.weight"],
        "model.ln_out.bias": t["output_norm.bias"],
        "head.weight": t["output.weight"],
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        a = h + "attention."
        sd[h + "ln1.weight"] = t[p + "attn_norm.weight"]
        sd[h + "ln1.bias"] = t[p + "attn_norm.bias"]
        sd[h + "ln2.weight"] = t[p + "attn_norm_2.weight"]
        sd[h + "ln2.bias"] = t[p + "attn_norm_2.bias"]
        fused = t[p + "time_mix_lerp_fused.weight"].reshape(6, -1)
        for j, c in enumerate("rwkvag"):
            sd[a + f"x_{c}"] = _lift3(fused[j])
        for grp in ("w", "a", "v", "g"):
            if p + f"time_mix_{grp}0.weight" in t:
                sd[a + f"{grp}0"] = _lift3(t[p + f"time_mix_{grp}0.weight"])
            for idx in "12":
                key = p + f"time_mix_{grp}{idx}.weight"
                if key in t:
                    sd[a + f"{grp}{idx}"] = t[key].T
        sd[a + "k_k"] = t[p + "time_mix_k_k.weight"]
        sd[a + "k_a"] = t[p + "time_mix_k_a.weight"]
        sd[a + "r_k"] = t[p + "time_mix_r_k.weight"]
        for nm in ("receptance", "key", "value", "output"):
            sd[a + nm + ".weight"] = t[p + f"time_mix_{nm}.weight"]
        sd[a + "ln_x.weight"] = t[p + "time_mix_ln.weight"]
        sd[a + "ln_x.bias"] = t[p + "time_mix_ln.bias"]
        f = h + "feed_forward."
        sd[f + "x_k"] = _lift3(t[p + "channel_mix_lerp_k.weight"])
        sd[f + "key.weight"] = t[p + "channel_mix_key.weight"]
        sd[f + "value.weight"] = t[p + "channel_mix_value.weight"]
    cfg = dict(model_type="rwkv7", hidden_size=E, num_hidden_layers=n_layer,
               head_size=int(md["rwkv7.wkv.head_size"]),
               intermediate_size=int(md["rwkv7.feed_forward_length"]),
               layer_norm_epsilon=1e-5, wkv_has_gate=True,
               lora_rank_decay=4, lora_rank_iclr=4,
               lora_rank_value_residual_mix=4, lora_rank_gate=4,
               vocab_size=t["token_embd.weight"].shape[0])
    src = _write_hf(tmp_path, "rwkv7", cfg, sd)
    _parity(fx, src, tmp_path, "rwkv7")


def test_roundtrip_arwkv7(tmp_path):
    from tpullm.models.testing import make_tiny_arwkv7_gguf

    fx = make_tiny_arwkv7_gguf(tmp_path / "a.gguf")
    t, md = _fixture_tensors(fx)
    E = int(md["arwkv7.embedding_length"])
    n_layer = int(md["arwkv7.block_count"])
    sd = {
        "model.embed_tokens.weight": t["token_embd.weight"],
        "model.norm.weight": t["output_norm.weight"],
        "lm_head.weight": t["output.weight"],
    }
    for i in range(n_layer):
        p, h = f"blk.{i}.", f"model.layers.{i}."
        a = h + "self_attn.time_mixer."
        sd[h + "input_layernorm.weight"] = t[p + "attn_norm.weight"]
        sd[h + "post_attention_layernorm.weight"] = t[p + "ffn_norm.weight"]
        for g in ("gate", "up", "down"):
            sd[h + f"mlp.{g}_proj.weight"] = t[p + f"ffn_{g}.weight"]
        fused = t[p + "time_mix_lerp_fused.weight"].reshape(6, -1)
        for j, c in enumerate("rwkvag"):
            sd[a + f"x_{c}"] = _lift3(fused[j])
        for grp in ("w", "a", "v", "g"):
            if p + f"time_mix_{grp}0.weight" in t:
                sd[a + f"{grp}0"] = _lift3(t[p + f"time_mix_{grp}0.weight"])
            for idx in "12":
                key = p + f"time_mix_{grp}{idx}.weight"
                if key in t:
                    sd[a + f"{grp}{idx}"] = t[key].T
        sd[a + "k_k"] = t[p + "time_mix_k_k.weight"]
        sd[a + "k_a"] = t[p + "time_mix_k_a.weight"]
        sd[a + "r_k"] = t[p + "time_mix_r_k.weight"]
        for hf, gg in (("r_proj", "receptance"), ("k_proj", "key"),
                       ("v_proj", "value"), ("o_proj", "output")):
            sd[a + hf + ".weight"] = t[p + f"time_mix_{gg}.weight"]
        sd[a + "g_norm.weight"] = t[p + "time_mix_ln.weight"]
        sd[a + "g_norm.bias"] = t[p + "time_mix_ln.bias"]
    cfg = dict(model_type="rwkv_hybrid", hidden_size=E,
               num_hidden_layers=n_layer,
               head_size=int(md["arwkv7.wkv.head_size"]),
               intermediate_size=int(md["arwkv7.feed_forward_length"]),
               rms_norm_eps=1e-5, wkv_has_gate=True, wkv_version=7,
               vocab_size=t["token_embd.weight"].shape[0])
    src = _write_hf(tmp_path, "arwkv7", cfg, sd)
    _parity(fx, src, tmp_path, "arwkv7")
