"""Youtu-VL tower tests (tools/mtmd/models/youtuvl.cpp): qwen2.5-VL window
machinery with an explicit full-attention layer index list, LayerNorm ViT,
tanh-GELU FFN, and a post_ln + RMS ln_q merger."""

import json

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter


def _write_tiny_youtuvl(path, rng, n_embd=64, n_head=4, n_layer=3, n_ff=96,
                        P=8, wa_full=(1,), window=16, d_out=48):
    w = GGUFWriter(str(path), architecture="clip")
    w.add_kv("clip.projector_type", "youtuvl")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.spatial_merge_size", 2)
    w.add_kv("clip.vision.window_size", window)
    if wa_full:
        w.add_kv("clip.vision.wa_layer_indexes",
                 np.asarray(wa_full, np.int32))
    w.add_kv("clip.use_gelu", True)

    def rand(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    w.add_tensor("v.patch_embd.weight", rand(n_embd, 3 * P * P))
    for i in range(n_layer):
        p = f"v.blk.{i}."
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", (1 + rand(n_embd)).astype(np.float32))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(n_embd, n_embd))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
        w.add_tensor(p + "ffn_up.bias", rand(n_ff))
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
        w.add_tensor(p + "ffn_down.bias", rand(n_embd))
    w.add_tensor("v.post_ln.weight", (1 + rand(n_embd)).astype(np.float32))
    w.add_tensor("v.post_ln.bias", rand(n_embd))
    w.add_tensor("mm.input_norm.weight", (1 + rand(n_embd)).astype(np.float32))
    w.add_tensor("mm.0.weight", rand(80, n_embd * 4))
    w.add_tensor("mm.0.bias", rand(80))
    w.add_tensor("mm.2.weight", rand(d_out, 80))
    w.add_tensor("mm.2.bias", rand(d_out))
    w.write()
    return str(path)


def test_youtuvl_dispatch_and_shapes(tmp_path):
    from tpullm import mtmd
    from tpullm.mtmd.qwen_vl import YoutuVLVision

    rng = np.random.default_rng(3)
    path = _write_tiny_youtuvl(tmp_path / "y.gguf", rng)
    tower = mtmd.load_vision(path)
    assert isinstance(tower, YoutuVLVision)
    assert tower.wa_full_layers == {1}
    assert not tower._is_full(0) and tower._is_full(1) and not tower._is_full(2)

    P = tower.patch_size
    px = (rng.normal(size=(3, 4 * P, 8 * P)) * 0.3).astype(np.float32)
    out = tower.encode_pixels(px)
    assert out.shape == ((4 // 2) * (8 // 2), 48)
    assert np.isfinite(out).all()


def test_youtuvl_all_full_equals_no_windows(tmp_path):
    """With every layer in wa_layer_indexes the window permutation must be
    a pure relabeling: output equals the same weights run with window
    attention disabled. Validates the permute/restore machinery."""
    from tpullm.mtmd.qwen_vl import YoutuVLVision

    rng = np.random.default_rng(5)
    path = _write_tiny_youtuvl(tmp_path / "yf.gguf", rng, n_layer=2,
                               wa_full=(0, 1))
    t1 = YoutuVLVision(path)
    t2 = YoutuVLVision(path)
    t2.wa_full_layers = set()  # disables the window path entirely

    P = t1.patch_size
    px = (rng.normal(size=(3, 4 * P, 4 * P)) * 0.3).astype(np.float32)
    a = t1.encode_pixels(px.copy())
    b = t2.encode_pixels(px.copy())
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_youtuvl_window_masks_change_output(tmp_path):
    """A window-attention layer must differ from full attention when the
    grid spans multiple windows."""
    from tpullm.mtmd.qwen_vl import YoutuVLVision

    rng = np.random.default_rng(7)
    # window 16px / patch 8 / merge 2 → 1 merge-block per window: 4×4 grid
    # = 4 windows
    path = _write_tiny_youtuvl(tmp_path / "yw.gguf", rng, n_layer=2,
                               wa_full=(1,), window=16)
    t_win = YoutuVLVision(path)
    t_full = YoutuVLVision(path)
    t_full.wa_full_layers = set()
    P = t_win.patch_size
    px = (rng.normal(size=(3, 4 * P, 4 * P)) * 0.3).astype(np.float32)
    a = t_win.encode_pixels(px.copy())
    b = t_full.encode_pixels(px.copy())
    assert np.abs(a - b).max() > 1e-4


def test_youtuvl_mmproj_conversion(tmp_path):
    pytest.importorskip("torch")
    from safetensors.numpy import save_file

    from tpullm import mtmd
    from tpullm.tools.convert_hf import _convert_youtuvl_mmproj

    rng = np.random.default_rng(9)
    C, H, L, FF, P = 64, 4, 2, 96, 8

    def rand(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    sd = {
        # SigLIP2-NaFlex linear patch embedding in HWC order
        "siglip2.vision_model.embeddings.patch_embedding.weight":
            rand(C, P * P * 3),
        "siglip2.vision_model.embeddings.patch_embedding.bias": rand(C),
        "siglip2.vision_model.post_layernorm.weight": 1 + rand(C),
        "siglip2.vision_model.post_layernorm.bias": rand(C),
        "merger.ln_q.weight": 1 + rand(C),
        "merger.mlp.0.weight": rand(80, C * 4),
        "merger.mlp.0.bias": rand(80),
        "merger.mlp.2.weight": rand(48, 80),
        "merger.mlp.2.bias": rand(48),
    }
    for i in range(L):
        p = f"siglip2.vision_model.encoder.layers.{i}."
        for hf, n in (("self_attn.q_proj", "q"), ("self_attn.k_proj", "k"),
                      ("self_attn.v_proj", "v"), ("self_attn.out_proj", "o")):
            sd[p + hf + ".weight"] = rand(C, C)
            sd[p + hf + ".bias"] = rand(C)
        sd[p + "layer_norm1.weight"] = 1 + rand(C)
        sd[p + "layer_norm1.bias"] = rand(C)
        sd[p + "layer_norm2.weight"] = 1 + rand(C)
        sd[p + "layer_norm2.bias"] = rand(C)
        sd[p + "mlp.fc1.weight"] = rand(FF, C)
        sd[p + "mlp.fc1.bias"] = rand(FF)
        sd[p + "mlp.fc2.weight"] = rand(C, FF)
        sd[p + "mlp.fc2.bias"] = rand(C)
    d = tmp_path / "hf_youtu"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    cfg = {
        "model_type": "youtu_vl",
        "vision_config": {
            "hidden_size": C, "patch_size": P, "num_hidden_layers": L,
            "num_attention_heads": H, "intermediate_size": FF,
            "spatial_merge_size": 2, "window_size": 16,
            "fullatt_block_indexes": [1], "hidden_act": "gelu_pytorch_tanh",
        },
        "text_config": {"model_type": "deepseek_v2"},
    }
    (d / "config.json").write_text(json.dumps(cfg))

    out = str(tmp_path / "youtu-mmproj.gguf")
    stats = _convert_youtuvl_mmproj(str(d), out, cfg, verbose=False)
    assert stats["n_tensors"] > 10

    tower = mtmd.load_vision(out)
    assert type(tower).__name__ == "YoutuVLVision"
    assert tower.wa_full_layers == {1}
    px = (rng.normal(size=(3, 4 * P, 4 * P)) * 0.3).astype(np.float32)
    y = tower.encode_pixels(px)
    assert y.shape == (4, 48)
    assert np.isfinite(y).all()
