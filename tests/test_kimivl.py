"""Kimi-VL (MoonViT) tower + mmproj conversion tests.

The numeric oracle is a float64 numpy transcription of the reference graph
(tools/mtmd/models/kimivl.cpp + clip.cpp build_vit/build_rope_2d/
build_patch_merge_permute) — it validates the jax tower's layout algebra
(rope halves, pixel-unshuffle order, per-patch projection norm) and the
converter's name mapping end to end."""

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter


def gelu_exact(x):
    """Exact gelu via erf in float64 (numpy has no erf; vectorize math's)."""
    import math

    v = np.vectorize(math.erf)
    return 0.5 * x * (1.0 + v(x / math.sqrt(2.0)))


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_kimivl_oracle(r, patches, rows, cols, n_head, n_merge, eps=1e-5):
    t = {k: v.to_numpy().astype(np.float64) for k, v in r.tensors.items()}
    C = t["v.patch_embd.weight"].shape[0]
    x = patches @ t["v.patch_embd.weight"].reshape(C, -1).T
    x = x + t["v.patch_embd.bias"]
    pos = t["v.position_embd.weight"]
    nps = int(np.sqrt(pos.shape[0]))
    assert (rows, cols) == (nps, nps), "oracle: no pos resize"
    x = x + pos

    D = C // n_head
    dh = D // 2
    i = np.arange(0, dh, 2, dtype=np.float64)
    f = 10000.0 ** (-i / dh)
    hh, ww = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    ang = np.concatenate([ww.reshape(-1, 1) * f, hh.reshape(-1, 1) * f], -1)
    cos, sin = np.cos(ang), np.sin(ang)

    def rope(v):  # [N, H, D] adjacent pairs within each half
        N = v.shape[0]
        pair = v.reshape(N, n_head, D // 2, 2)
        a, b = pair[..., 0], pair[..., 1]
        c = cos[:, None, :]
        s = sin[:, None, :]
        return np.stack([a * c - b * s, a * s + b * c], -1).reshape(N, n_head, D)

    n_layer = max(int(k.split(".")[2]) for k in t if k.startswith("v.blk.")) + 1
    N = rows * cols
    for li in range(n_layer):
        p = f"v.blk.{li}."
        h = _ln(x, t[p + "ln1.weight"], t[p + "ln1.bias"], eps)
        q = rope((h @ t[p + "attn_q.weight"].T + t[p + "attn_q.bias"]).reshape(N, n_head, D))
        k = rope((h @ t[p + "attn_k.weight"].T + t[p + "attn_k.bias"]).reshape(N, n_head, D))
        v = (h @ t[p + "attn_v.weight"].T + t[p + "attn_v.bias"]).reshape(N, n_head, D)
        sc = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(D)
        sc = np.exp(sc - sc.max(-1, keepdims=True))
        pr = sc / sc.sum(-1, keepdims=True)
        ctx = np.einsum("hqk,khd->qhd", pr, v).reshape(N, C)
        x = x + ctx @ t[p + "attn_out.weight"].T + t[p + "attn_out.bias"]
        h = _ln(x, t[p + "ln2.weight"], t[p + "ln2.bias"], eps)
        up = h @ t[p + "ffn_up.weight"].T + t[p + "ffn_up.bias"]
        x = x + gelu_exact(up) @ t[p + "ffn_down.weight"].T + t[p + "ffn_down.bias"]

    x = _ln(x, t["v.post_ln.weight"], t["v.post_ln.bias"], eps)

    # pixel-unshuffle (dy, dx, channel) with channel fastest
    fm = n_merge
    grid = x.reshape(rows, cols, C)
    g = grid.reshape(rows // fm, fm, cols // fm, fm, C)
    merged = g.transpose(0, 2, 1, 3, 4).reshape(-1, fm * fm * C)

    # per-original-patch LayerNorm inside the merged feature
    m2 = merged.reshape(-1, C)
    m2 = _ln(m2, t["mm.input_norm.weight"], t["mm.input_norm.bias"], 1e-5)
    merged = m2.reshape(-1, fm * fm * C)

    y = merged @ t["mm.1.weight"].T + t["mm.1.bias"]
    y = gelu_exact(y)
    return y @ t["mm.2.weight"].T + t["mm.2.bias"]


def _write_tiny_kimivl_gguf(path, rng, n_embd=64, n_head=4, n_layer=2,
                            n_ff=96, P=8, side=4, n_merge=2, d_out=48):
    w = GGUFWriter(str(path), architecture="clip")
    w.add_kv("clip.projector_type", "kimivl")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", side * P)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.vision.projector.scale_factor", n_merge)
    w.add_kv("clip.use_gelu", True)

    def rand(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    w.add_tensor("v.patch_embd.weight", rand(n_embd, 3, P, P).reshape(n_embd, -1))
    w.add_tensor("v.patch_embd.bias", rand(n_embd))
    w.add_tensor("v.position_embd.weight", rand(side * side, n_embd))
    for i in range(n_layer):
        p = f"v.blk.{i}."
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", (1.0 + rand(n_embd)).astype(np.float32))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(n_embd, n_embd))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
        w.add_tensor(p + "ffn_up.bias", rand(n_ff))
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
        w.add_tensor(p + "ffn_down.bias", rand(n_embd))
    w.add_tensor("v.post_ln.weight", (1.0 + rand(n_embd)).astype(np.float32))
    w.add_tensor("v.post_ln.bias", rand(n_embd))
    w.add_tensor("mm.input_norm.weight", (1.0 + rand(n_embd)).astype(np.float32))
    w.add_tensor("mm.input_norm.bias", rand(n_embd))
    w.add_tensor("mm.1.weight", rand(80, n_embd * n_merge * n_merge))
    w.add_tensor("mm.1.bias", rand(80))
    w.add_tensor("mm.2.weight", rand(d_out, 80))
    w.add_tensor("mm.2.bias", rand(d_out))
    w.write()
    return str(path)


def test_kimivl_tower_matches_numpy(tmp_path):
    from tpullm.gguf.reader import GGUFReader
    from tpullm.mtmd.kimivl import KimiVLVision

    rng = np.random.default_rng(11)
    P, side = 8, 4
    path = _write_tiny_kimivl_gguf(tmp_path / "kimivl.gguf", rng, P=P,
                                   side=side)
    tower = KimiVLVision(path)
    patches = (rng.normal(size=(side * side, 3 * P * P)) * 0.3).astype(np.float32)
    got = tower.encode_grid(patches, side, side)
    ref = _np_kimivl_oracle(GGUFReader(path), patches.astype(np.float64),
                            side, side, n_head=4, n_merge=2)
    assert got.shape == ((side // 2) * (side // 2), 48)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_kimivl_dynamic_grid_and_pos_resize(tmp_path):
    """Non-square grid exercises the bilinear pos-embd resize and the
    rope X/Y split; padding path exercises the merge alignment."""
    from tpullm.mtmd.kimivl import KimiVLVision

    rng = np.random.default_rng(12)
    P = 8
    path = _write_tiny_kimivl_gguf(tmp_path / "k2.gguf", rng, P=P, side=4)
    tower = KimiVLVision(path)
    rows, cols = 6, 2
    patches = (rng.normal(size=(rows * cols, 3 * P * P)) * 0.3).astype(np.float32)
    out = tower.encode_grid(patches, rows, cols)
    assert out.shape == ((rows // 2) * (cols // 2), 48)
    assert np.isfinite(out).all()
    # an odd grid pads up to the merge factor
    out2 = tower.encode_grid(patches[:3 * 3], 3, 3)
    assert out2.shape == (4, 48)


def test_kimivl_mmproj_conversion_roundtrip(tmp_path):
    """HF-style Kimi-VL checkpoint dir → _convert_kimivl_mmproj → tower."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from safetensors.numpy import save_file

    import json

    from tpullm import mtmd
    from tpullm.tools.convert_hf import _convert_kimivl_mmproj

    rng = np.random.default_rng(13)
    C, H, L, FF, P = 64, 4, 2, 96, 8

    def rand(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    sd = {
        "vision_tower.patch_embed.proj.weight": rand(C, 3, P, P),
        "vision_tower.patch_embed.proj.bias": rand(C),
        "vision_tower.patch_embed.pos_emb": rand(4, 4, C),
        "vision_tower.encoder.final_layernorm.weight": 1 + rand(C),
        "vision_tower.encoder.final_layernorm.bias": rand(C),
        "multi_modal_projector.pre_norm.weight": 1 + rand(C),
        "multi_modal_projector.pre_norm.bias": rand(C),
        "multi_modal_projector.linear_1.weight": rand(80, C * 4),
        "multi_modal_projector.linear_1.bias": rand(80),
        "multi_modal_projector.linear_2.weight": rand(48, 80),
        "multi_modal_projector.linear_2.bias": rand(48),
    }
    for i in range(L):
        p = f"vision_tower.encoder.blocks.{i}."
        sd[p + "wqkv.weight"] = rand(3 * C, C)
        sd[p + "wqkv.bias"] = rand(3 * C)
        sd[p + "wo.weight"] = rand(C, C)
        sd[p + "wo.bias"] = rand(C)
        sd[p + "norm0.weight"] = 1 + rand(C)
        sd[p + "norm0.bias"] = rand(C)
        sd[p + "norm1.weight"] = 1 + rand(C)
        sd[p + "norm1.bias"] = rand(C)
        sd[p + "mlp.fc0.weight"] = rand(FF, C)
        sd[p + "mlp.fc0.bias"] = rand(FF)
        sd[p + "mlp.fc1.weight"] = rand(C, FF)
        sd[p + "mlp.fc1.bias"] = rand(C)
    d = tmp_path / "hf_kimivl"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    cfg = {
        "model_type": "kimi_vl",
        "vision_config": {
            "model_type": "moonvit", "hidden_size": C, "patch_size": P,
            "num_hidden_layers": L, "num_attention_heads": H,
            "intermediate_size": FF, "merge_kernel_size": [2, 2],
        },
        "text_config": {"model_type": "deepseek_v2"},
    }
    (d / "config.json").write_text(json.dumps(cfg))

    out = str(tmp_path / "kimivl-mmproj.gguf")
    stats = _convert_kimivl_mmproj(str(d), out, cfg, verbose=False)
    assert stats["n_tensors"] > 10

    tower = mtmd.load_vision(out)
    assert type(tower).__name__ == "KimiVLVision"
    patches = (rng.normal(size=(16, 3 * P * P)) * 0.3).astype(np.float32)
    y = tower.encode_grid(patches, 4, 4)
    assert y.shape == (4, 48)
    assert np.isfinite(y).all()

    # wqkv split order: q from the first C rows
    from tpullm.gguf.reader import GGUFReader

    r = GGUFReader(out)
    np.testing.assert_allclose(
        r.tensors["v.blk.0.attn_q.weight"].to_numpy(),
        sd["vision_tower.encoder.blocks.0.wqkv.weight"][:C], rtol=1e-6)
