"""Pixtral + MiniCPM-V tower parity (round-2 mtmd breadth).

Pixtral is checked against transformers' PixtralVisionModel (+ a manual
torch replica of the Mistral3 patch merger / LLaVA projector); MiniCPM-V's
resampler has no transformers class, so it is checked against an
independent numpy oracle implementing clip_graph_minicpmv's math."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpullm.gguf.writer import GGUFWriter  # noqa: E402


def _write_pixtral_mmproj(path, model, *, n_embd, n_ff, n_layer, head_dim,
                          patch, mm_dim, n_merge=1, rng=None,
                          with_break=False):
    """Export a PixtralVisionModel state dict into the mmproj GGUF layout,
    plus random merger/projector tensors; returns the extra numpy mats."""
    rng = rng or np.random.default_rng(0)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "pixtral")
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_embd // head_dim)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.vision.rope.freq_base", 10000.0)
    if n_merge > 1:
        w.add_kv("clip.vision.spatial_merge_size", n_merge)
    w.add_tensor("v.patch_embd.weight",
                 sd["patch_conv.weight"].reshape(n_embd, -1))
    w.add_tensor("v.pre_ln.weight", sd["ln_pre.weight"])
    for i in range(n_layer):
        hf = f"transformer.layers.{i}."
        p = f"v.blk.{i}."
        w.add_tensor(p + "ln1.weight", sd[hf + "attention_norm.weight"])
        w.add_tensor(p + "attn_q.weight", sd[hf + "attention.q_proj.weight"])
        w.add_tensor(p + "attn_k.weight", sd[hf + "attention.k_proj.weight"])
        w.add_tensor(p + "attn_v.weight", sd[hf + "attention.v_proj.weight"])
        w.add_tensor(p + "attn_out.weight", sd[hf + "attention.o_proj.weight"])
        w.add_tensor(p + "ln2.weight", sd[hf + "ffn_norm.weight"])
        w.add_tensor(p + "ffn_gate.weight", sd[hf + "feed_forward.gate_proj.weight"])
        w.add_tensor(p + "ffn_up.weight", sd[hf + "feed_forward.up_proj.weight"])
        w.add_tensor(p + "ffn_down.weight", sd[hf + "feed_forward.down_proj.weight"])
    extras = {
        "mm1": rng.normal(size=(mm_dim, n_embd * (n_merge * n_merge if False else 1))).astype(np.float32) * 0.05,
        "mm2": rng.normal(size=(mm_dim, mm_dim)).astype(np.float32) * 0.05,
    }
    if n_merge > 1:
        extras["input_norm"] = (1.0 + rng.normal(size=n_embd) * 0.1).astype(np.float32)
        extras["merger"] = (rng.normal(size=(n_embd, n_embd * n_merge * n_merge))
                            .astype(np.float32) * 0.05)
        w.add_tensor("mm.input_norm.weight", extras["input_norm"])
        w.add_tensor("mm.patch_merger.weight", extras["merger"])
    w.add_tensor("mm.1.weight", extras["mm1"])
    w.add_tensor("mm.2.weight", extras["mm2"])
    if with_break:
        extras["img_break"] = rng.normal(size=mm_dim).astype(np.float32) * 0.05
        w.add_tensor("v.token_embd.img_break", extras["img_break"])
    w.write()
    return extras


def _torch_projector(hidden, extras, n_merge, rows, cols, eps=1e-5):
    """Manual torch replica of Mistral3PatchMerger + LLaVA projector."""
    import torch.nn.functional as F

    x = torch.as_tensor(hidden)
    if n_merge > 1:
        wn = torch.as_tensor(extras["input_norm"])
        xf = x.float()
        x = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps) * wn
        d = x.shape[-1]
        grid = x.view(rows, cols, d).permute(2, 0, 1).unsqueeze(0)
        unf = F.unfold(grid, kernel_size=n_merge, stride=n_merge)
        x = unf.view(d * n_merge * n_merge, -1).t()
        x = x @ torch.as_tensor(extras["merger"]).t()
        rows, cols = rows // n_merge, cols // n_merge
    x = x @ torch.as_tensor(extras["mm1"]).t()
    x = F.gelu(x.float())
    x = x @ torch.as_tensor(extras["mm2"]).t()
    if "img_break" in extras:
        e = x.shape[-1]
        grid = x.view(rows, cols, e)
        brk = torch.as_tensor(extras["img_break"]).view(1, 1, e).expand(rows, 1, e)
        x = torch.cat([grid, brk], dim=1).reshape(-1, e)[:-1]
    return x.numpy()


@pytest.mark.parametrize("n_merge,with_break", [(1, False), (2, True)])
def test_pixtral_tower_matches_transformers(tmp_path, n_merge, with_break):
    from transformers.models.pixtral.configuration_pixtral import PixtralVisionConfig
    from transformers.models.pixtral.modeling_pixtral import PixtralVisionModel

    from tpullm.mtmd.pixtral import PixtralVision

    torch.manual_seed(0)
    P, n_embd, head_dim = 8, 64, 16
    cfg = PixtralVisionConfig(
        hidden_size=n_embd, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, head_dim=head_dim, patch_size=P,
        image_size=64, rope_theta=10000.0, hidden_act="silu",
    )
    model = PixtralVisionModel(cfg)
    model.eval()

    rows, cols = 4, 6
    img = torch.randn(1, 3, rows * P, cols * P)
    with torch.no_grad():
        hf_hidden = model(img).last_hidden_state[0].numpy()

    path = str(tmp_path / "pixtral.gguf")
    extras = _write_pixtral_mmproj(
        path, model, n_embd=n_embd, n_ff=128, n_layer=2, head_dim=head_dim,
        patch=P, mm_dim=48, n_merge=n_merge, with_break=with_break,
        rng=np.random.default_rng(3))
    ref = _torch_projector(hf_hidden, extras, n_merge, rows, cols)

    tower = PixtralVision(path)
    arr = img[0].numpy()
    patches = arr.reshape(3, rows, P, cols, P).transpose(1, 3, 0, 2, 4)
    patches = patches.reshape(rows * cols, 3 * P * P).astype(np.float32)
    got = tower.encode_grid(patches, rows, cols)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def _np_minicpmv_oracle(reader, patches, rows, cols):
    """Independent numpy forward of clip_graph_minicpmv."""
    t = {k: reader.tensors[k].to_numpy().astype(np.float64)
         for k in reader.tensors}
    md = reader.metadata
    n_embd = md["clip.vision.embedding_length"]
    n_head = md["clip.vision.attention.head_count"]
    eps = md["clip.vision.attention.layer_norm_epsilon"]
    hd = n_embd // n_head
    N = rows * cols

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def mha(x, p, q_in=None, k_in=None):
        qsrc = x if q_in is None else q_in
        ksrc = x if k_in is None else k_in
        q = (qsrc @ t[p + "attn_q.weight"].T + t[p + "attn_q.bias"])
        k = (ksrc @ t[p + "attn_k.weight"].T + t[p + "attn_k.bias"])
        v = (x @ t[p + "attn_v.weight"].T + t[p + "attn_v.bias"])
        nq = q.shape[0]
        q = q.reshape(nq, n_head, hd); k = k.reshape(-1, n_head, hd)
        v = v.reshape(-1, n_head, hd)
        s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
        p_ = np.exp(s - s.max(-1, keepdims=True)); p_ /= p_.sum(-1, keepdims=True)
        ctx = np.einsum("hqk,khd->qhd", p_, v).reshape(nq, n_embd)
        return ctx @ t[p + "attn_out.weight"].T + t[p + "attn_out.bias"]

    side = int(round(np.sqrt(t["v.position_embd.weight"].shape[0])))
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    ids = (rr * side + cc).reshape(-1)
    x = patches @ t["v.patch_embd.weight"].reshape(n_embd, -1).T \
        + t["v.patch_embd.bias"] + t["v.position_embd.weight"][ids]
    n_layer = md["clip.vision.block_count"]
    for i in range(n_layer):
        p = f"v.blk.{i}."
        h = ln(x, t[p + "ln1.weight"], t[p + "ln1.bias"])
        x = x + mha(h, p)
        h = ln(x, t[p + "ln2.weight"], t[p + "ln2.bias"])
        g = h @ t[p + "ffn_up.weight"].T + t[p + "ffn_up.bias"]
        act = 0.5 * g * (1 + np.tanh(np.sqrt(2 / np.pi) * (g + 0.044715 * g ** 3)))
        x = x + act @ t[p + "ffn_down.weight"].T + t[p + "ffn_down.bias"]

    # resampler
    dp = t["resampler.query"].shape[1]
    q = ln(t["resampler.query"], t["resampler.ln_q.weight"], t["resampler.ln_q.bias"])
    v = ln(x @ t["resampler.kv.weight"].T, t["resampler.ln_kv.weight"],
           t["resampler.ln_kv.bias"])
    quarter = dp // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    tx = cc.reshape(-1, 1) * omega
    ty = rr.reshape(-1, 1) * omega
    pos = np.concatenate([np.sin(tx), np.cos(tx), np.sin(ty), np.cos(ty)], -1)
    k = v + pos
    dh = 128 if dp % 128 == 0 else dp  # tiny fixture: single head
    nh = dp // dh
    Q = (q @ t["resampler.attn.q.weight"].T + t["resampler.attn.q.bias"]).reshape(-1, nh, dh)
    K = (k @ t["resampler.attn.k.weight"].T + t["resampler.attn.k.bias"]).reshape(N, nh, dh)
    V = (v @ t["resampler.attn.v.weight"].T + t["resampler.attn.v.bias"]).reshape(N, nh, dh)
    s = np.einsum("qhd,khd->hqk", Q, K) / np.sqrt(dh)
    p_ = np.exp(s - s.max(-1, keepdims=True)); p_ /= p_.sum(-1, keepdims=True)
    ctx = np.einsum("hqk,khd->qhd", p_, V).reshape(-1, dp)
    out = ctx @ t["resampler.attn.out.weight"].T + t["resampler.attn.out.bias"]
    out = ln(out, t["resampler.ln_post.weight"], t["resampler.ln_post.bias"])
    return out @ t["resampler.proj.weight"]


def test_minicpmv_tower_matches_numpy(tmp_path):
    from tpullm.gguf.reader import GGUFReader
    from tpullm.mtmd.minicpmv import MiniCPMVVision

    rng = np.random.default_rng(7)
    P, n_embd, n_layer, n_head = 8, 64, 2, 4
    side, dp, dout, n_query = 4, 128, 48, 8

    w = GGUFWriter(str(tmp_path / "mcpv.gguf"), architecture="clip")
    w.add_kv("clip.projector_type", "resampler")
    w.add_kv("clip.minicpmv_version", 3)
    w.add_kv("clip.minicpmv_query_num", n_query)
    w.add_kv("clip.vision.image_size", side * P)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)

    def rand(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    w.add_tensor("v.patch_embd.weight", rand(n_embd, 3, P, P).reshape(n_embd, -1))
    w.add_tensor("v.patch_embd.bias", rand(n_embd))
    w.add_tensor("v.position_embd.weight", rand(side * side, n_embd))
    for i in range(n_layer):
        p = f"v.blk.{i}."
        for nm, shp in (("ln1", None), ("ln2", None)):
            w.add_tensor(p + nm + ".weight", (1.0 + rand(n_embd)).astype(np.float32))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", rand(n_embd, n_embd))
            w.add_tensor(p + nm + ".bias", rand(n_embd))
        w.add_tensor(p + "ffn_up.weight", rand(128, n_embd))
        w.add_tensor(p + "ffn_up.bias", rand(128))
        w.add_tensor(p + "ffn_down.weight", rand(n_embd, 128))
        w.add_tensor(p + "ffn_down.bias", rand(n_embd))
    w.add_tensor("resampler.query", rand(n_query, dp))
    w.add_tensor("resampler.kv.weight", rand(dp, n_embd))
    for nm in ("ln_q", "ln_kv", "ln_post"):
        w.add_tensor(f"resampler.{nm}.weight", (1.0 + rand(dp)).astype(np.float32))
        w.add_tensor(f"resampler.{nm}.bias", rand(dp))
    for nm in ("q", "k", "v", "out"):
        w.add_tensor(f"resampler.attn.{nm}.weight", rand(dp, dp))
        w.add_tensor(f"resampler.attn.{nm}.bias", rand(dp))
    w.add_tensor("resampler.proj.weight", rand(dp, dout))
    w.write()

    path = str(tmp_path / "mcpv.gguf")
    tower = MiniCPMVVision(path)
    patches = rng.normal(size=(side * side, 3 * P * P)).astype(np.float32)
    got = tower.encode_grid(patches, side, side)
    ref = _np_minicpmv_oracle(GGUFReader(path), patches.astype(np.float64),
                              side, side)
    assert got.shape == (n_query, dout)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_load_vision_dispatch_new_towers(tmp_path):
    from tpullm.gguf.reader import GGUFReader  # noqa: F401
    from tpullm import mtmd

    assert mtmd.load_vision.__doc__  # dispatch exists; towers import cleanly
    from tpullm.mtmd.pixtral import PixtralVision, fit_image_size  # noqa: F401
    from tpullm.mtmd.minicpmv import MiniCPMVVision  # noqa: F401

    h, w = fit_image_size(300, 500, 16, 8 * 256, 64 * 256)
    assert h % 16 == 0 and w % 16 == 0
    assert 8 * 256 <= h * w


def test_internvl_tower_matches_transformers(tmp_path):
    from transformers.models.internvl.configuration_internvl import (
        InternVLVisionConfig,
    )
    from transformers.models.internvl.modeling_internvl import (
        InternVLVisionModel,
    )

    from tpullm.mtmd.internvl import InternVLVision

    torch.manual_seed(0)
    P, n_embd, side, m = 8, 64, 4, 2
    cfg = InternVLVisionConfig(
        hidden_size=n_embd, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=[side * P, side * P],
        patch_size=[P, P], use_absolute_position_embeddings=True,
        layer_norm_eps=1e-6,
    )
    model = InternVLVisionModel(cfg)
    model.eval()
    img = torch.randn(1, 3, side * P, side * P)
    with torch.no_grad():
        hidden = model(pixel_values=img).last_hidden_state

    # HF get_image_features: drop CLS → (b, fs, fs, c) → pixel_shuffle(0.5)
    # → LN + linear + GELU + linear (InternVLMultiModalProjector)
    feats = hidden[:, 1:, :]
    b, np_, c = feats.shape
    fs = int(np_ ** 0.5)
    v = feats.reshape(b, fs, fs, -1)
    # pixel_shuffle(scale=1/m), modeling_internvl.py:688
    bs, w_, h_, ch = v.size()
    v = v.view(bs, w_, int(h_ // m), int(ch * m))
    v = v.permute(0, 2, 1, 3).contiguous()
    v = v.view(bs, int(h_ // m), int(w_ // m), int(ch * m * m))
    v = v.permute(0, 2, 1, 3).contiguous()
    v = v.reshape(bs, -1, v.shape[-1])

    rng = np.random.default_rng(5)
    dmm = n_embd * m * m
    mmw = {
        "ln_w": (1.0 + rng.normal(size=dmm) * 0.1).astype(np.float32),
        "ln_b": (rng.normal(size=dmm) * 0.1).astype(np.float32),
        "l1_w": (rng.normal(size=(48, dmm)) * 0.05).astype(np.float32),
        "l1_b": (rng.normal(size=48) * 0.05).astype(np.float32),
        "l2_w": (rng.normal(size=(48, 48)) * 0.05).astype(np.float32),
        "l2_b": (rng.normal(size=48) * 0.05).astype(np.float32),
    }
    import torch.nn.functional as F

    x = v.float()
    x = F.layer_norm(x, (dmm,), torch.as_tensor(mmw["ln_w"]),
                     torch.as_tensor(mmw["ln_b"]), eps=1e-5)
    x = x @ torch.as_tensor(mmw["l1_w"]).t() + torch.as_tensor(mmw["l1_b"])
    x = F.gelu(x)
    ref = (x @ torch.as_tensor(mmw["l2_w"]).t()
           + torch.as_tensor(mmw["l2_b"]))[0].numpy()

    # export mmproj gguf
    sd = {k: t.detach().numpy().astype(np.float32)
          for k, t in model.state_dict().items()}
    path = str(tmp_path / "internvl.gguf")
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", "internvl")
    w.add_kv("clip.vision.image_size", side * P)
    w.add_kv("clip.vision.patch_size", P)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.block_count", 2)
    w.add_kv("clip.vision.attention.head_count", 4)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.projector.scale_factor", m)
    w.add_tensor("v.patch_embd.weight",
                 sd["embeddings.patch_embeddings.projection.weight"].reshape(n_embd, -1))
    w.add_tensor("v.patch_embd.bias", sd["embeddings.patch_embeddings.projection.bias"])
    w.add_tensor("v.class_embd", sd["embeddings.cls_token"].reshape(-1))
    w.add_tensor("v.position_embd.weight",
                 sd["embeddings.position_embeddings"].reshape(-1, n_embd))
    for i in range(2):
        hf = f"encoder.layer.{i}."
        p = f"v.blk.{i}."
        w.add_tensor(p + "ln1.weight", sd[hf + "layernorm_before.weight"])
        w.add_tensor(p + "ln1.bias", sd[hf + "layernorm_before.bias"])
        w.add_tensor(p + "attn_q.weight", sd[hf + "attention.q_proj.weight"])
        w.add_tensor(p + "attn_k.weight", sd[hf + "attention.k_proj.weight"])
        w.add_tensor(p + "attn_v.weight", sd[hf + "attention.v_proj.weight"])
        w.add_tensor(p + "attn_out.weight", sd[hf + "attention.projection_layer.weight"])
        w.add_tensor(p + "attn_out.bias", sd[hf + "attention.projection_layer.bias"])
        w.add_tensor(p + "ls1.weight", sd[hf + "lambda_1"])
        w.add_tensor(p + "ln2.weight", sd[hf + "layernorm_after.weight"])
        w.add_tensor(p + "ln2.bias", sd[hf + "layernorm_after.bias"])
        w.add_tensor(p + "ffn_up.weight", sd[hf + "mlp.fc1.weight"])
        w.add_tensor(p + "ffn_up.bias", sd[hf + "mlp.fc1.bias"])
        w.add_tensor(p + "ffn_down.weight", sd[hf + "mlp.fc2.weight"])
        w.add_tensor(p + "ffn_down.bias", sd[hf + "mlp.fc2.bias"])
        w.add_tensor(p + "ls2.weight", sd[hf + "lambda_2"])
    w.add_tensor("mm.model.mlp.0.weight", mmw["ln_w"])
    w.add_tensor("mm.model.mlp.0.bias", mmw["ln_b"])
    w.add_tensor("mm.model.mlp.1.weight", mmw["l1_w"])
    w.add_tensor("mm.model.mlp.1.bias", mmw["l1_b"])
    w.add_tensor("mm.model.mlp.3.weight", mmw["l2_w"])
    w.add_tensor("mm.model.mlp.3.bias", mmw["l2_b"])
    w.write()

    tower = InternVLVision(path)
    arr = img[0].numpy()
    patches = arr.reshape(3, side, P, side, P).transpose(1, 3, 0, 2, 4)
    patches = patches.reshape(side * side, 3 * P * P).astype(np.float32)
    got = tower.encode_grid(patches, side, side)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
