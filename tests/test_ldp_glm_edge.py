"""MobileVLM LDP/LDPv2 and GLM-Edge projector tests (llava.cpp
PROJECTOR_TYPE_LDP/LDPV2/GLM_EDGE): synthetic CLIP GGUFs; the depthwise-conv
/ squeeze-excite / GLU math is checked against torch (an independent
implementation of conv2d groups, hardswish/hardsigmoid, avg_pool)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpullm.gguf.writer import GGUFWriter  # noqa: E402


def _write_clip_tower(w, rng, n_embd=32, n_layer=1, n_head=2, n_ff=48,
                      P=8, side=4):
    """Common tiny ViT body (class token + learned positions)."""
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", side * P)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)

    def rand(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    w.add_tensor("v.patch_embd.weight", rand(n_embd, 3, P, P).reshape(n_embd, -1))
    w.add_tensor("v.patch_embd.bias", rand(n_embd))
    w.add_tensor("v.class_embd", rand(n_embd))
    w.add_tensor("v.position_embd.weight", rand(side * side + 1, n_embd))
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
    return rand


def test_ldp_projector(tmp_path):
    from tpullm import mtmd

    rng = np.random.default_rng(21)
    C_mm = 24  # projector dim
    path = str(tmp_path / "ldp.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "ldp")
    rand = _write_clip_tower(w, rng)
    w.add_tensor("mm.model.mlp.1.weight", rand(C_mm, 32))
    w.add_tensor("mm.model.mlp.1.bias", rand(C_mm))
    w.add_tensor("mm.model.mlp.3.weight", rand(C_mm, C_mm))
    w.add_tensor("mm.model.mlp.3.bias", rand(C_mm))
    for bi in (1, 2):
        pre = f"mm.model.mb_block.{bi}.block."
        w.add_tensor(pre + "0.0.weight", rand(C_mm, 1, 3, 3))
        w.add_tensor(pre + "0.1.weight", (1 + rand(C_mm)).astype(np.float32))
        w.add_tensor(pre + "0.1.bias", rand(C_mm))
        w.add_tensor(pre + "1.fc1.weight", rand(8, C_mm))
        w.add_tensor(pre + "1.fc1.bias", rand(8))
        w.add_tensor(pre + "1.fc2.weight", rand(C_mm, 8))
        w.add_tensor(pre + "1.fc2.bias", rand(C_mm))
        w.add_tensor(pre + "2.0.weight", rand(C_mm, C_mm))
        w.add_tensor(pre + "2.1.weight", (1 + rand(C_mm)).astype(np.float32))
        w.add_tensor(pre + "2.1.bias", rand(C_mm))
    w.write()

    tower = mtmd.load_vision(path)
    assert tower.proj_type == "ldp"
    img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    out = tower.encode_image(img)
    # 4×4 patch grid → stride-2 block → 2×2 tokens
    assert out.shape == (4, C_mm)
    assert np.isfinite(out).all()


def test_ldp_mb_block_matches_torch(tmp_path):
    """The depthwise-conv SE block vs torch's independent kernels."""
    import jax.numpy as jnp

    from tpullm.mtmd.clip import ClipVision

    rng = np.random.default_rng(23)
    B, H, W, C = 2, 6, 6, 16
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    blk = {
        "dw_w": jnp.asarray(rng.normal(size=(C, 1, 3, 3)).astype(np.float32)),
        "ln0_w": jnp.asarray((1 + rng.normal(size=C) * 0.05).astype(np.float32)),
        "ln0_b": jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.05),
        "fc1_w": jnp.asarray(rng.normal(size=(4, C)).astype(np.float32)),
        "fc1_b": jnp.asarray(rng.normal(size=4).astype(np.float32)),
        "fc2_w": jnp.asarray(rng.normal(size=(C, 4)).astype(np.float32)),
        "fc2_b": jnp.asarray(rng.normal(size=C).astype(np.float32)),
        "pw_w": jnp.asarray(rng.normal(size=(C, C)).astype(np.float32)),
        "ln2_w": jnp.asarray((1 + rng.normal(size=C) * 0.05).astype(np.float32)),
        "ln2_b": jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.05),
    }

    class Dummy(ClipVision):
        def __init__(self):
            self.eps = 1e-5

    for stride in (1, 2):
        got = np.asarray(Dummy()._mb_block(jnp.asarray(x), blk, stride))

        with torch.no_grad():
            t = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
            y = torch.nn.functional.conv2d(
                t, torch.tensor(np.asarray(blk["dw_w"])), stride=stride,
                padding=1, groups=C)
            y = y.permute(0, 2, 3, 1)  # NHWC
            y = torch.nn.functional.layer_norm(
                y, (C,), torch.tensor(np.asarray(blk["ln0_w"])),
                torch.tensor(np.asarray(blk["ln0_b"])), eps=1e-5)
            hw = torch.nn.functional.hardswish(y)
            se = hw.mean(dim=(1, 2))
            se = torch.relu(se @ torch.tensor(np.asarray(blk["fc1_w"])).T
                            + torch.tensor(np.asarray(blk["fc1_b"])))
            se = torch.nn.functional.hardsigmoid(
                se @ torch.tensor(np.asarray(blk["fc2_w"])).T
                + torch.tensor(np.asarray(blk["fc2_b"])))
            y = hw * se[:, None, None, :]
            y = y @ torch.tensor(np.asarray(blk["pw_w"])).T
            ref = torch.nn.functional.layer_norm(
                y, (C,), torch.tensor(np.asarray(blk["ln2_w"])),
                torch.tensor(np.asarray(blk["ln2_b"])), eps=1e-5).numpy()
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_ldpv2_projector_matches_torch(tmp_path):
    from tpullm import mtmd

    rng = np.random.default_rng(25)
    C_mm = 24
    path = str(tmp_path / "ldpv2.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "ldpv2")
    rand = _write_clip_tower(w, rng)
    mlp0_w, mlp0_b = rand(C_mm, 32), rand(C_mm)
    mlp2_w, mlp2_b = rand(C_mm, C_mm), rand(C_mm)
    peg_w, peg_b = rand(C_mm, 1, 3, 3), rand(C_mm)
    w.add_tensor("mm.model.mlp.0.weight", mlp0_w)
    w.add_tensor("mm.model.mlp.0.bias", mlp0_b)
    w.add_tensor("mm.model.mlp.2.weight", mlp2_w)
    w.add_tensor("mm.model.mlp.2.bias", mlp2_b)
    w.add_tensor("mm.model.peg.0.weight", peg_w)
    w.add_tensor("mm.model.peg.0.bias", peg_b)
    w.write()

    tower = mtmd.load_vision(path)
    img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    out = tower.encode_image(img)
    assert out.shape == (4, C_mm)

    # oracle: rerun the projector math in torch from the ViT features
    import jax.numpy as jnp

    px = mtmd.preprocess_image(img, tower.image_size, tower.image_mean,
                               tower.image_std)
    feats = None

    orig = tower._project

    def capture(p, x):
        nonlocal feats
        feats = np.asarray(x)
        return orig(p, x)

    tower._project = capture
    tower._encode = lambda px_: tower._forward(px_)  # drop jit to capture
    got = tower.encode(px[None])[0]
    with torch.no_grad():
        f = torch.tensor(feats)
        y = torch.nn.functional.gelu(
            f @ torch.tensor(mlp0_w).T + torch.tensor(mlp0_b), approximate="tanh")
        y = y @ torch.tensor(mlp2_w).T + torch.tensor(mlp2_b)
        g = int(np.sqrt(y.shape[1]))
        grid = y.reshape(1, g, g, C_mm).permute(0, 3, 1, 2)
        pooled = torch.nn.functional.avg_pool2d(grid, 2, 2)
        peg = torch.nn.functional.conv2d(
            pooled, torch.tensor(peg_w), stride=1, padding=1, groups=C_mm)
        out_t = (peg.permute(0, 2, 3, 1) + torch.tensor(peg_b)
                 + pooled.permute(0, 2, 3, 1))
        ref = out_t.reshape(1, -1, C_mm)[0].numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_glm_edge_projector(tmp_path):
    from tpullm import mtmd

    rng = np.random.default_rng(27)
    C_out, C_llm = 48, 40
    path = str(tmp_path / "glme.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "adapter")
    rand = _write_clip_tower(w, rng)
    w.add_tensor("adapter.conv.weight", rand(C_out, 32, 2, 2))
    w.add_tensor("adapter.conv.bias", rand(C_out))
    w.add_tensor("adapter.linear.linear.weight", rand(C_llm, C_out))
    w.add_tensor("adapter.linear.norm1.weight", (1 + rand(C_llm)).astype(np.float32))
    w.add_tensor("adapter.linear.norm1.bias", rand(C_llm))
    w.add_tensor("adapter.linear.dense_h_to_4h.weight", rand(64, C_llm))
    w.add_tensor("adapter.linear.gate.weight", rand(64, C_llm))
    w.add_tensor("adapter.linear.dense_4h_to_h.weight", rand(C_llm, 64))
    w.add_tensor("adapter.boi", rand(1, C_llm))
    w.add_tensor("adapter.eoi", rand(1, C_llm))
    w.write()

    tower = mtmd.load_vision(path)
    assert tower.proj_type == "adapter"
    img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    out = tower.encode_image(img)
    # 4×4 grid → 2×2 conv downsample = 4 tokens + BOI + EOI
    assert out.shape == (6, C_llm)
    assert np.isfinite(out).all()
    # BOI/EOI rows are the stored marker embeddings
    boi = tower.reader.tensors["adapter.boi"].to_numpy().reshape(-1)
    np.testing.assert_allclose(out[0], boi, rtol=1e-5, atol=1e-6)
