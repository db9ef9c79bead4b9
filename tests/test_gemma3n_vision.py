"""Gemma3n MobileNetV5 vision tower + mmproj conversion tests.

Numeric oracle: a float64 numpy transcription of the reference graph
(tools/mtmd/models/mobilenetv5.cpp — edge-residual / universal-inverted-
residual / MQA blocks, Conv2dSame asymmetric padding, MSFA fusion and the
Gemma3n embedder), validating the jax tower's conv layouts, stage/stride
schedule and fusion-point selection, and the converter's name mapping."""

import json
import math

import numpy as np
import pytest

from tpullm.gguf.writer import GGUFWriter

# tiny config: image 64 → stem 32 → stage0 16 → stage1 8 → stage2 4 → stage3 2
IMG = 64
C_STEM, C_S0, C_S1, C_S2, C_S3 = 8, 12, 16, 24, 40
C_CAT = C_S2 + C_S3
C_MSFA_MID, N_EMBD, TEXT_W = 48, 32, 20
D_HEAD, N_HEAD = 8, 2


def _rand(rng, *shape, s=0.2):
    return (rng.normal(size=shape) * s).astype(np.float32)


def _tiny_tensors(rng):
    """(gguf_name → array) for a 4-stage MobileNetV5 exercising all three
    block types, layer scales, and the k/v down-convs."""
    t = {}

    def conv(name, co, ci, k):
        t[name] = _rand(rng, co, ci, k, k)

    def dw(name, c, k):
        t[name] = _rand(rng, c, 1, k, k)

    def vec(name, c, one=False):
        t[name] = (1.0 + _rand(rng, c)) if one else _rand(rng, c)

    conv("v.conv_stem.conv.weight", C_STEM, 3, 3)
    t["v.conv_stem.conv.bias"] = _rand(rng, 1, C_STEM, 1, 1)
    vec("v.conv_stem.bn.weight", C_STEM, one=True)

    # stage 0: two edge-residual blocks (first downsamples)
    conv("v.blk.0.0.conv_exp.weight", 16, C_STEM, 3)
    vec("v.blk.0.0.bn1.weight", 16, one=True)
    conv("v.blk.0.0.conv_pwl.weight", C_S0, 16, 1)
    vec("v.blk.0.0.bn2.weight", C_S0, one=True)
    conv("v.blk.0.1.conv_exp.weight", 24, C_S0, 3)
    vec("v.blk.0.1.bn1.weight", 24, one=True)
    conv("v.blk.0.1.conv_pwl.weight", C_S0, 24, 1)
    vec("v.blk.0.1.bn2.weight", C_S0, one=True)

    # stage 1: one UIR block with all sub-convs (downsampling dw_mid)
    dw("v.blk.1.0.dw_start.conv.weight", C_S0, 3)
    vec("v.blk.1.0.dw_start.bn.weight", C_S0, one=True)
    conv("v.blk.1.0.pw_exp.conv.weight", 24, C_S0, 1)
    vec("v.blk.1.0.pw_exp.bn.weight", 24, one=True)
    dw("v.blk.1.0.dw_mid.conv.weight", 24, 5)
    vec("v.blk.1.0.dw_mid.bn.weight", 24, one=True)
    conv("v.blk.1.0.pw_proj.conv.weight", C_S1, 24, 1)
    vec("v.blk.1.0.pw_proj.bn.weight", C_S1, one=True)
    t["v.blk.1.0.layer_scale.gamma"] = _rand(rng, 1, C_S1, 1, 1, s=0.5)

    # stage 2: downsampling UIR (no dw_start) + MQA block with k/v down-convs
    conv("v.blk.2.0.pw_exp.conv.weight", 32, C_S1, 1)
    vec("v.blk.2.0.pw_exp.bn.weight", 32, one=True)
    dw("v.blk.2.0.dw_mid.conv.weight", 32, 3)
    vec("v.blk.2.0.dw_mid.bn.weight", 32, one=True)
    conv("v.blk.2.0.pw_proj.conv.weight", C_S2, 32, 1)
    vec("v.blk.2.0.pw_proj.bn.weight", C_S2, one=True)
    vec("v.blk.2.1.norm.weight", C_S2, one=True)
    conv("v.blk.2.1.attn.query.proj.weight", N_HEAD * D_HEAD, C_S2, 1)
    dw("v.blk.2.1.attn.key.down_conv.weight", C_S2, 3)
    vec("v.blk.2.1.attn.key.norm.weight", C_S2, one=True)
    conv("v.blk.2.1.attn.key.proj.weight", D_HEAD, C_S2, 1)
    dw("v.blk.2.1.attn.value.down_conv.weight", C_S2, 3)
    vec("v.blk.2.1.attn.value.norm.weight", C_S2, one=True)
    conv("v.blk.2.1.attn.value.proj.weight", D_HEAD, C_S2, 1)
    conv("v.blk.2.1.attn.output.proj.weight", C_S2, N_HEAD * D_HEAD, 1)
    t["v.blk.2.1.layer_scale.gamma"] = _rand(rng, 1, C_S2, 1, 1, s=0.5)

    # stage 3: downsampling UIR + plain MQA (no k/v down-convs)
    conv("v.blk.3.0.pw_exp.conv.weight", 48, C_S2, 1)
    vec("v.blk.3.0.pw_exp.bn.weight", 48, one=True)
    dw("v.blk.3.0.dw_mid.conv.weight", 48, 3)
    vec("v.blk.3.0.dw_mid.bn.weight", 48, one=True)
    conv("v.blk.3.0.pw_proj.conv.weight", C_S3, 48, 1)
    vec("v.blk.3.0.pw_proj.bn.weight", C_S3, one=True)
    vec("v.blk.3.1.norm.weight", C_S3, one=True)
    conv("v.blk.3.1.attn.query.proj.weight", N_HEAD * D_HEAD, C_S3, 1)
    conv("v.blk.3.1.attn.key.proj.weight", D_HEAD, C_S3, 1)
    conv("v.blk.3.1.attn.value.proj.weight", D_HEAD, C_S3, 1)
    conv("v.blk.3.1.attn.output.proj.weight", C_S3, N_HEAD * D_HEAD, 1)

    conv("v.msfa.ffn.pw_exp.conv.weight", C_MSFA_MID, C_CAT, 1)
    vec("v.msfa.ffn.pw_exp.bn.weight", C_MSFA_MID, one=True)
    conv("v.msfa.ffn.pw_proj.conv.weight", N_EMBD, C_MSFA_MID, 1)
    vec("v.msfa.ffn.pw_proj.bn.weight", N_EMBD, one=True)
    vec("v.msfa.norm.weight", N_EMBD, one=True)
    vec("mm.soft_emb_norm.weight", N_EMBD, one=True)
    t["mm.input_projection.weight"] = _rand(rng, TEXT_W, N_EMBD)
    return t


def _write_gguf(path, tensors):
    w = GGUFWriter(str(path), architecture="clip")
    w.add_kv("clip.projector_type", "gemma3nv")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", IMG)
    w.add_kv("clip.vision.patch_size", 1)
    w.add_kv("clip.vision.embedding_length", N_EMBD)
    w.add_kv("clip.vision.image_mean", [0.0, 0.0, 0.0])
    w.add_kv("clip.vision.image_std", [1.0, 1.0, 1.0])
    for name, a in tensors.items():
        w.add_tensor(name, a)
    w.write()
    return str(path)


# -- float64 numpy oracle ----------------------------------------------------

def _gelu(x):
    v = np.vectorize(math.erf)
    return 0.5 * x * (1.0 + v(x / math.sqrt(2.0)))


def _rms2d(x, w, eps=1e-6):  # x (H, W, C)
    y = x / np.sqrt((x * x).mean(-1, keepdims=True) + eps)
    return y * w if w is not None else y


def _pad_same(x, k, s):
    H, W = x.shape[:2]
    ph = max(0, (-(-H // s) - 1) * s + k - H)
    pw = max(0, (-(-W // s) - 1) * s + k - W)
    return np.pad(x, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                      (0, 0)))


def _conv(x, w, stride=1, pad=0):  # x (H,W,Ci), w (Co,Ci,kh,kw)
    if pad:
        x = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    H, W, _ = x.shape
    co, _, kh, kw = w.shape
    oh, ow = (H - kh) // stride + 1, (W - kw) // stride + 1
    out = np.zeros((oh, ow, co))
    for i in range(oh):
        for j in range(ow):
            patch = x[i * stride:i * stride + kh, j * stride:j * stride + kw]
            out[i, j] = np.einsum("oikl,kli->o", w, patch)
    return out


def _dwconv(x, w, stride=1, pad=0):  # w (C,1,kh,kw)
    if pad:
        x = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    H, W, C = x.shape
    _, _, kh, kw = w.shape
    oh, ow = (H - kh) // stride + 1, (W - kw) // stride + 1
    out = np.zeros((oh, ow, C))
    for i in range(oh):
        for j in range(ow):
            patch = x[i * stride:i * stride + kh, j * stride:j * stride + kw]
            out[i, j] = np.einsum("ckl,klc->c", w[:, 0], patch)
    return out


def _oracle(t, px):
    t = {k: v.astype(np.float64) for k, v in t.items()}

    def vec(n):
        return t[n].reshape(-1) if n in t else None

    x = px.transpose(1, 2, 0)  # (H, W, 3)
    x = _conv(_pad_same(x, 3, 2), t["v.conv_stem.conv.weight"], 2)
    x = x + vec("v.conv_stem.conv.bias")
    x = _gelu(_rms2d(x, vec("v.conv_stem.bn.weight")))

    def edge(x, p, stride):
        if stride == 2:
            c = _conv(_pad_same(x, 3, 2), t[p + "conv_exp.weight"], 2)
        else:
            c = _conv(x, t[p + "conv_exp.weight"], 1, pad=1)
        c = _gelu(_rms2d(c, vec(p + "bn1.weight")))
        c = _rms2d(_conv(c, t[p + "conv_pwl.weight"]), vec(p + "bn2.weight"))
        if stride == 1 and c.shape == x.shape:
            c = c + x
        return c

    def uir(x, p, stride):
        c = x
        if p + "dw_start.conv.weight" in t:
            w = t[p + "dw_start.conv.weight"]
            c = _rms2d(_dwconv(c, w, 1, pad=w.shape[2] // 2),
                       vec(p + "dw_start.bn.weight"))
        if p + "pw_exp.conv.weight" in t:
            c = _gelu(_rms2d(_conv(c, t[p + "pw_exp.conv.weight"]),
                             vec(p + "pw_exp.bn.weight")))
        if p + "dw_mid.conv.weight" in t:
            w = t[p + "dw_mid.conv.weight"]
            k = w.shape[2]
            if stride > 1:
                c = _dwconv(_pad_same(c, k, stride), w, stride)
            else:
                c = _dwconv(c, w, 1, pad=k // 2)
            c = _gelu(_rms2d(c, vec(p + "dw_mid.bn.weight")))
        if p + "pw_proj.conv.weight" in t:
            c = _rms2d(_conv(c, t[p + "pw_proj.conv.weight"]),
                       vec(p + "pw_proj.bn.weight"))
        if p + "layer_scale.gamma" in t:
            c = c * vec(p + "layer_scale.gamma")
        if c.shape == x.shape:
            c = c + x
        return c

    def mqa(x, p):
        c = _rms2d(x, vec(p + "norm.weight"))
        q = _conv(c, t[p + "attn.query.proj.weight"])
        kin = c
        if p + "attn.key.down_conv.weight" in t:
            w = t[p + "attn.key.down_conv.weight"]
            kin = _dwconv(_pad_same(c, w.shape[2], 2), w, 2)
            kin = _rms2d(kin, vec(p + "attn.key.norm.weight"))
        kk = _conv(kin, t[p + "attn.key.proj.weight"])
        vin = c
        if p + "attn.value.down_conv.weight" in t:
            w = t[p + "attn.value.down_conv.weight"]
            vin = _dwconv(_pad_same(c, w.shape[2], 2), w, 2)
            vin = _rms2d(vin, vec(p + "attn.value.norm.weight"))
        vv = _conv(vin, t[p + "attn.value.proj.weight"])
        H, W, _ = q.shape
        D = kk.shape[-1]
        nh = q.shape[-1] // D
        qf = q.reshape(H * W, nh, D)
        kf = kk.reshape(-1, D)
        vf = vv.reshape(-1, D)
        sc = np.einsum("nhd,md->hnm", qf, kf) / math.sqrt(D)
        e = np.exp(sc - sc.max(-1, keepdims=True))
        pr = e / e.sum(-1, keepdims=True)
        ctx = np.einsum("hnm,md->nhd", pr, vf).reshape(H, W, nh * D)
        c = _conv(ctx, t[p + "attn.output.proj.weight"])
        if c.shape == x.shape:
            if p + "layer_scale.gamma" in t:
                c = c * vec(p + "layer_scale.gamma")
            c = c + x
        return c

    x = edge(x, "v.blk.0.0.", 2)
    x = edge(x, "v.blk.0.1.", 1)
    x = uir(x, "v.blk.1.0.", 2)
    x = uir(x, "v.blk.2.0.", 2)
    x = mqa(x, "v.blk.2.1.")
    feat2 = x
    x = uir(x, "v.blk.3.0.", 2)
    x = mqa(x, "v.blk.3.1.")
    feat3 = np.repeat(np.repeat(x, 2, 0), 2, 1)  # nearest ×2 to stage-2 res

    x = np.concatenate([feat2, feat3], axis=-1)
    x = _gelu(_rms2d(_conv(x, t["v.msfa.ffn.pw_exp.conv.weight"]),
                     vec("v.msfa.ffn.pw_exp.bn.weight")))
    x = _rms2d(_conv(x, t["v.msfa.ffn.pw_proj.conv.weight"]),
               vec("v.msfa.ffn.pw_proj.bn.weight"))
    # 4×4 grid < 16 target: no pooling in the tiny config
    x = _rms2d(x, vec("v.msfa.norm.weight"))

    C = x.shape[-1]
    toks = x.reshape(-1, C) * math.sqrt(C)
    toks = toks / np.sqrt((toks * toks).mean(-1, keepdims=True) + 1e-6)
    toks = toks * vec("mm.soft_emb_norm.weight")
    toks = toks @ t["mm.input_projection.weight"].T
    return toks / np.sqrt((toks * toks).mean(-1, keepdims=True) + 1e-6)


def test_gemma3n_tower_matches_numpy(tmp_path):
    from tpullm.mtmd.mobilenet import Gemma3nVision

    rng = np.random.default_rng(21)
    tensors = _tiny_tensors(rng)
    path = _write_gguf(tmp_path / "g3nv.gguf", tensors)
    tower = Gemma3nVision(path)
    assert tower.block_kinds == ["edge", "edge", "uir", "uir", "attn",
                                 "uir", "attn"]
    assert tower.stage_ends == [1, 2, 4, 6]

    px = _rand(rng, 3, IMG, IMG, s=0.5) + 0.5
    got = tower.encode_pixels(px)
    ref = _oracle(tensors, px.astype(np.float64))
    assert got.shape == (16, TEXT_W)  # 4×4 MSFA grid in the tiny config
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_gemma3n_dispatch(tmp_path):
    from tpullm import mtmd

    rng = np.random.default_rng(22)
    path = _write_gguf(tmp_path / "g3nv2.gguf", _tiny_tensors(rng))
    tower = mtmd.load_vision(path)
    assert type(tower).__name__ == "Gemma3nVision"


def test_gemma3n_mmproj_conversion_roundtrip(tmp_path):
    """HF-style Gemma3n checkpoint → _convert_gemma3n_mmproj → tower."""
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from tpullm import mtmd
    from tpullm.tools.convert_hf import _convert_gemma3n_mmproj

    rng = np.random.default_rng(23)
    tensors = _tiny_tensors(rng)
    hf = {}
    for gname, a in tensors.items():
        if gname.startswith("v.blk."):
            hf["model.vision_tower.timm_model.blocks." + gname[6:]] = (
                a.reshape(-1) if gname.endswith("layer_scale.gamma") else a)
        elif gname.startswith(("v.conv_stem.", "v.msfa.")):
            hf["model.vision_tower.timm_model." + gname[2:]] = (
                a.reshape(-1) if gname == "v.conv_stem.conv.bias" else a)
        elif gname == "mm.input_projection.weight":
            hf["model.embed_vision.embedding_projection.weight"] = a
        elif gname == "mm.soft_emb_norm.weight":
            hf["model.embed_vision.soft_embedding_norm.weight"] = a
    d = tmp_path / "hf_g3n"
    d.mkdir()
    save_file(hf, str(d / "model.safetensors"))
    cfg = {"model_type": "gemma3n",
           "vision_config": {"hidden_size": N_EMBD}}
    (d / "config.json").write_text(json.dumps(cfg))
    (d / "preprocessor_config.json").write_text(json.dumps(
        {"size": {"height": IMG, "width": IMG}, "image_seq_length": 16}))

    out = str(tmp_path / "g3n-mmproj.gguf")
    stats = _convert_gemma3n_mmproj(str(d), out, cfg, verbose=False)
    assert stats["n_tensors"] == len(hf)

    tower = mtmd.load_vision(out)
    assert type(tower).__name__ == "Gemma3nVision"
    px = _rand(rng, 3, IMG, IMG, s=0.5) + 0.5
    got = tower.encode_pixels(px)
    ref = _oracle(tensors, px.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
