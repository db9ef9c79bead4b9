"""LFM2-Audio conformer encoder tests (tools/mtmd/models/conformer.cpp,
PROJECTOR_TYPE_LFM2A): conv subsampling vs torch, the Transformer-XL
rel-shift index property, and an end-to-end synthetic-GGUF run."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tpullm.gguf.writer import GGUFWriter  # noqa: E402
from tpullm.mtmd.audio import ConformerAudioEncoder  # noqa: E402


def _write_tiny_conformer(path, rng, n_mel=16, d=32, n_head=4, n_layer=2,
                          n_ff=48, c0=8, k_dw=9, d_llm=24):
    w = GGUFWriter(str(path), architecture="clip")
    w.add_kv("clip.projector_type", "lfm2a")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.num_mel_bins", n_mel)
    w.add_kv("clip.audio.embedding_length", d)
    w.add_kv("clip.audio.block_count", n_layer)
    w.add_kv("clip.audio.attention.head_count", n_head)

    def rand(*shape, s=0.08):
        return (rng.normal(size=shape) * s).astype(np.float32)

    w.add_tensor("a.conv1d.0.weight", rand(c0, 1, 3, 3))
    w.add_tensor("a.conv1d.0.bias", rand(c0))
    w.add_tensor("a.conv1d.2.weight", rand(c0, 1, 3, 3))
    w.add_tensor("a.conv1d.2.bias", rand(c0))
    w.add_tensor("a.conv1d.3.weight", rand(c0, c0, 1, 1))
    w.add_tensor("a.conv1d.3.bias", rand(c0))
    w.add_tensor("a.conv1d.5.weight", rand(c0, 1, 3, 3))
    w.add_tensor("a.conv1d.5.bias", rand(c0))
    w.add_tensor("a.conv1d.6.weight", rand(c0, c0, 1, 1))
    w.add_tensor("a.conv1d.6.bias", rand(c0))
    wq = c0 * (n_mel // 8)
    w.add_tensor("a.pre_encode.out.weight", rand(d, wq))
    w.add_tensor("a.pre_encode.out.bias", rand(d))
    for i in range(n_layer):
        p = f"a.blk.{i}."
        for nm, shp in (("ffn_norm", (d,)), ("ffn_norm_1", (d,)),
                        ("ln1", (d,)), ("ln2", (d,)), ("norm_conv", (d,)),
                        ("conv_norm", (d,))):
            w.add_tensor(p + nm + ".weight", (1 + rand(*shp)).astype(np.float32))
            w.add_tensor(p + nm + ".bias", rand(*shp))
        for nm, shp in (("ffn_up", (n_ff, d)), ("ffn_down", (d, n_ff)),
                        ("ffn_up_1", (n_ff, d)), ("ffn_down_1", (d, n_ff)),
                        ("attn_q", (d, d)), ("attn_k", (d, d)),
                        ("attn_v", (d, d)), ("attn_out", (d, d)),
                        ("conv_pw1", (2 * d, d)), ("conv_pw2", (d, d))):
            w.add_tensor(p + nm + ".weight", rand(*shp))
            w.add_tensor(p + nm + ".bias", rand(shp[0]))
        w.add_tensor(p + "conv_dw.weight", rand(d, 1, k_dw))
        w.add_tensor(p + "conv_dw.bias", rand(d))
        w.add_tensor(p + "pos_bias_u", rand(n_head, d // n_head))
        w.add_tensor(p + "pos_bias_v", rand(n_head, d // n_head))
        w.add_tensor(p + "linear_pos.weight", rand(d, d))
    w.add_tensor("mm.a.mlp.0.weight", (1 + rand(d)).astype(np.float32))
    w.add_tensor("mm.a.mlp.0.bias", rand(d))
    w.add_tensor("mm.a.mlp.1.weight", rand(40, d))
    w.add_tensor("mm.a.mlp.1.bias", rand(40))
    w.add_tensor("mm.a.mlp.3.weight", rand(d_llm, 40))
    w.add_tensor("mm.a.mlp.3.bias", rand(d_llm))
    w.write()
    return str(path)


def test_rel_shift_index_property():
    """out[h, i, j] must equal bd[h, i, (L-1) + j - i] — the relative
    index the (L − pos − 1)-angled embeddings are built for."""
    h, L = 2, 5
    p = 2 * L - 1
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(h, L, p)).astype(np.float32)
    got = np.asarray(ConformerAudioEncoder._rel_shift(jnp.asarray(bd), L))
    for i in range(L):
        for j in range(L):
            np.testing.assert_allclose(got[:, i, j], bd[:, i, L - 1 + j - i],
                                       rtol=1e-6)


def test_pre_encode_matches_torch(tmp_path):
    rng = np.random.default_rng(31)
    path = _write_tiny_conformer(tmp_path / "c.gguf", rng)
    enc = ConformerAudioEncoder(path)
    mel = rng.normal(size=(16, 64)).astype(np.float32)
    got = np.asarray(enc._pre_encode(jnp.asarray(mel)))

    t = lambda n: torch.tensor(enc.reader.tensors[n].to_numpy())
    with torch.no_grad():
        x = torch.tensor(mel).T[None, None]  # [1, 1, T, n_mel]
        x = torch.relu(torch.nn.functional.conv2d(
            x, t("a.conv1d.0.weight"), t("a.conv1d.0.bias"), 2, 1))
        C = x.shape[1]
        x = torch.nn.functional.conv2d(
            x, t("a.conv1d.2.weight"), t("a.conv1d.2.bias"), 2, 1, groups=C)
        x = torch.relu(torch.nn.functional.conv2d(
            x, t("a.conv1d.3.weight"), t("a.conv1d.3.bias"), 1, 0))
        x = torch.nn.functional.conv2d(
            x, t("a.conv1d.5.weight"), t("a.conv1d.5.bias"), 2, 1, groups=C)
        x = torch.relu(torch.nn.functional.conv2d(
            x, t("a.conv1d.6.weight"), t("a.conv1d.6.bias"), 1, 0))
        # [1, C, T', W'] → [T', C·W'] with W' fastest
        x = x[0].permute(1, 0, 2).reshape(x.shape[2], -1)
        ref = (x @ t("a.pre_encode.out.weight").T
               + t("a.pre_encode.out.bias")).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_conformer_end_to_end(tmp_path):
    rng = np.random.default_rng(33)
    path = _write_tiny_conformer(tmp_path / "c2.gguf", rng)
    enc = ConformerAudioEncoder(path)
    mel = rng.normal(size=(16, 64)).astype(np.float32)
    out = enc.encode_mel(mel)
    assert out.shape[0] == 8  # 64 frames / 8 (three stride-2 convs)
    assert out.shape[1] == 24
    assert np.isfinite(out).all()
    # conv-module depthwise kernel vs torch (same-pad conv1d, groups=C)
    d = enc.n_embd
    lyr = enc.params["layers"][0]
    T = 8
    y = rng.normal(size=(T, d)).astype(np.float32)
    K = 9
    half = (K - 1) // 2
    ypad = np.pad(y, ((half, half), (0, 0)))
    idx = np.arange(T)[:, None] + np.arange(K)[None, :]
    kern = np.asarray(lyr["conv_dw_w"]).reshape(d, K)
    got = np.einsum("tkc,ck->tc", ypad[idx], kern) \
        + np.asarray(lyr["conv_dw_b"])
    with torch.no_grad():
        ref = torch.nn.functional.conv1d(
            torch.tensor(y).T[None], torch.tensor(kern)[:, None, :],
            torch.tensor(np.asarray(lyr["conv_dw_b"])), padding=half,
            groups=d)[0].T.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_load_audio_dispatch(tmp_path):
    from tpullm import mtmd

    rng = np.random.default_rng(35)
    path = _write_tiny_conformer(tmp_path / "c3.gguf", rng)
    enc = mtmd.load_audio(path)
    assert isinstance(enc, ConformerAudioEncoder)

    from tpullm.models.testing import make_tiny_audio_mmproj_gguf

    wpath = make_tiny_audio_mmproj_gguf(tmp_path / "w.gguf", n_mel=16)
    enc2 = mtmd.load_audio(wpath)
    assert isinstance(enc2, mtmd.WhisperAudioEncoder)
