"""Multimodal: CLIP ViT encoder vs numpy reference + media-chunk pipeline
(≡ reference tools/mtmd clip.cpp + mtmd.h, test_vision_api.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.models.testing import make_tiny_llama_gguf, make_tiny_mmproj_gguf
from tpullm.mtmd import (
    MEDIA_MARKER,
    ClipVision,
    build_multimodal_embeddings,
    generate_mtmd,
)
from tpullm.runtime import Engine


def np_clip_forward(reader, pixels):
    """Sequential numpy ViT (second opinion on the encoder math)."""
    md = reader.metadata
    g = lambda k: md[f"clip.vision.{k}"]
    P, E, L, H = g("patch_size"), g("embedding_length"), g("block_count"), g("attention.head_count")
    eps = g("attention.layer_norm_epsilon")
    side = g("image_size") // P

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def gelu(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))

    # im2col patches
    x = pixels.reshape(3, side, P, side, P).transpose(1, 3, 0, 2, 4).reshape(side * side, 3 * P * P)
    x = x @ t("v.patch_embd.weight").T + t("v.patch_embd.bias")
    x = np.concatenate([t("v.class_embd")[None], x], axis=0)
    x = x + t("v.position_embd.weight")[: x.shape[0]]
    x = ln(x, t("v.pre_ln.weight"), t("v.pre_ln.bias"))
    hd = E // H
    T = x.shape[0]
    for i in range(L):
        p = f"v.blk.{i}."
        h = ln(x, t(p + "ln1.weight"), t(p + "ln1.bias"))
        q = (h @ t(p + "attn_q.weight").T + t(p + "attn_q.bias")).reshape(T, H, hd)
        k = (h @ t(p + "attn_k.weight").T + t(p + "attn_k.bias")).reshape(T, H, hd)
        v = (h @ t(p + "attn_v.weight").T + t(p + "attn_v.bias")).reshape(T, H, hd)
        out = np.zeros((T, H, hd))
        for hh in range(H):
            s = q[:, hh] @ k[:, hh].T / np.sqrt(hd)
            e = np.exp(s - s.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ v[:, hh]
        x = x + out.reshape(T, E) @ t(p + "attn_out.weight").T + t(p + "attn_out.bias")
        h = ln(x, t(p + "ln2.weight"), t(p + "ln2.bias"))
        up = h @ t(p + "ffn_up.weight").T + t(p + "ffn_up.bias")
        x = x + gelu(up) @ t(p + "ffn_down.weight").T + t(p + "ffn_down.bias")
    x = ln(x, t("v.post_ln.weight"), t("v.post_ln.bias"))
    x = x[1:]  # drop class token
    y = x @ t("mm.0.weight").T + t("mm.0.bias")
    if "mm.1.weight" in reader.tensors:  # mlp_norm (Yi-VL)
        y = ln(y, t("mm.1.weight"), t("mm.1.bias"))
        y = gelu(y)
        y = y @ t("mm.3.weight").T + t("mm.3.bias")
        return ln(y, t("mm.4.weight"), t("mm.4.bias"))
    y = gelu(y) @ t("mm.2.weight").T + t("mm.2.bias")
    return y


@pytest.fixture(scope="module")
def mmproj(tmp_path_factory):
    return make_tiny_mmproj_gguf(tmp_path_factory.mktemp("mm") / "mmproj.gguf")


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("mm") / "llm.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )


def test_clip_encoder_matches_numpy(mmproj):
    clip = ClipVision(mmproj)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((3, 28, 28)).astype(np.float32) * 0.5
    got = clip.encode(pixels[None])[0]
    ref = np_clip_forward(clip.reader, pixels)
    assert got.shape == (16, 64)  # (28/7)^2 patches, llm embd
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_preprocess_image(mmproj):
    clip = ClipVision(mmproj)
    img = np.random.default_rng(1).integers(0, 255, (50, 40, 3), dtype=np.uint8)
    px = clip.encode_image(img)
    assert px.shape == (16, 64)


def test_embedding_prefill_equals_token_prefill(llm):
    """prefill_embeddings(tok_embd[ids]) ≡ prefill(ids) — the injection
    mechanism is exact."""
    eng1 = Engine(llm, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    ids = eng1.tokenizer.tokenize("the quick brown", add_special=True)
    ref = eng1.prefill(ids)

    eng2 = Engine(llm, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    embds = np.asarray(eng2.params["tok_embd"], np.float32)[np.asarray(ids)]
    got = eng2.prefill_embeddings(embds)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_generate_mtmd_end_to_end(llm, mmproj):
    eng = Engine(llm, mode="dense", max_seq=128)
    clip = ClipVision(mmproj)
    img = np.random.default_rng(2).integers(0, 255, (28, 28, 3), dtype=np.uint8)
    out = generate_mtmd(
        eng, clip, f"describe {MEDIA_MARKER} please", [img], max_new_tokens=6
    )
    assert isinstance(out, str)
    # prompt consumed: text tokens + 16 patch embeddings
    assert eng.n_past > 16


def test_mtmd_marker_count_mismatch(llm, mmproj):
    eng = Engine(llm, mode="dense", max_seq=64)
    clip = ClipVision(mmproj)
    with pytest.raises(ValueError, match="markers"):
        build_multimodal_embeddings(eng, clip, "no marker here", [np.zeros((28, 28, 3))])


def test_server_vision_chat(llm, mmproj, tmp_path):
    """OpenAI vision content blocks through /v1/chat/completions
    (≡ reference tools/server/tests unit/test_vision_api.py)."""
    import asyncio
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.server.api import Server
    from tpullm.server.scheduler import Scheduler

    engine = BatchEngine(llm, n_slots=2, max_seq=128, mode="dense",
                         prefill_chunk=32)
    sched = Scheduler(engine)
    sched.start()

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (28, 28, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    data_uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    async def run():
        server = Server(sched, model_name="tiny", mmproj_path=mmproj)
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "max_tokens": 4, "temperature": 0,
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "what is this?"},
                    {"type": "image_url", "image_url": {"url": data_uri}},
                ]}],
            })
            assert r.status == 200
            data = await r.json()
            assert data["choices"][0]["message"]["role"] == "assistant"
            # image patches consumed: prompt_tokens includes 16 patch embeds
            assert data["usage"]["prompt_tokens"] > 0

            # plain text requests still work on the same server
            r = await client.post("/v1/chat/completions", json={
                "max_tokens": 2, "temperature": 0,
                "messages": [{"role": "user", "content": "hi"}],
            })
            assert r.status == 200
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


# -- audio (whisper encoder, ≡ mtmd-audio.cpp + models/whisper-enc.cpp) -------


def test_log_mel_spectrogram_properties():
    from tpullm.mtmd import log_mel_spectrogram

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)  # 1 kHz, 1 s
    mel = log_mel_spectrogram(tone, n_mel=32)
    assert mel.shape[0] == 32 and mel.shape[1] >= 3000
    assert np.isfinite(mel).all()
    # normalized range: (clamped_log + 4) / 4 stays within sane bounds
    assert mel.min() >= -3 and mel.max() <= 4
    # energy concentrated where the tone lives during the first second,
    # silence afterwards is at the clamp floor
    active = mel[:, :90]
    silent = mel[:, 1500:2900]
    assert active.max() > silent.max() + 0.5
    row_energy = active.mean(axis=1)
    assert 4 <= int(np.argmax(row_energy)) <= 28  # mid-band, not edges


def np_whisper_encoder(reader, mel, skip_proj=False):
    """Independent numpy whisper-encoder forward (qwen2a projector);
    skip_proj=True returns the avg-pooled post-LN body (shared by the
    music_flamingo oracle)."""
    md = reader.metadata
    n_embd = md["clip.audio.embedding_length"]
    n_head = md["clip.audio.attention.head_count"]
    n_layer = md["clip.audio.block_count"]
    eps = md["clip.audio.attention.layer_norm_epsilon"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    from scipy.special import erf

    def gelu(x):
        return 0.5 * x * (1 + erf(x / np.sqrt(2)))

    def conv1d(x, w, b, stride):  # x [C,T], w [O,C,3], pad 1
        xp = np.pad(x, ((0, 0), (1, 1)))
        T = x.shape[1]
        outs = []
        for s in range(0, T, stride):
            outs.append(np.einsum("ock,ck->o", w, xp[:, s:s + 3]))
        return np.stack(outs, axis=1) + b[:, None]

    x = gelu(conv1d(mel.astype(np.float64), t("a.conv1d.1.weight"),
                    t("a.conv1d.1.bias"), 1))
    x = gelu(conv1d(x, t("a.conv1d.2.weight"), t("a.conv1d.2.bias"), 2))
    x = x.T
    n_pos = x.shape[0]
    x = x + t("a.position_embd.weight")[:n_pos]
    for i in range(n_layer):
        p = f"a.blk.{i}."
        h = ln(x, t(p + "ln1.weight"), t(p + "ln1.bias"))
        q = (h @ t(p + "attn_q.weight").T + t(p + "attn_q.bias")).reshape(n_pos, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(n_pos, n_head, hd)
        v = (h @ t(p + "attn_v.weight").T + t(p + "attn_v.bias")).reshape(n_pos, n_head, hd)
        out = np.zeros((n_pos, n_head, hd))
        for hh in range(n_head):
            scores = q[:, hh] @ k[:, hh].T / np.sqrt(hd)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ v[:, hh]
        x = x + out.reshape(n_pos, n_embd) @ t(p + "attn_out.weight").T \
              + t(p + "attn_out.bias")
        h = ln(x, t(p + "ln2.weight"), t(p + "ln2.bias"))
        up = gelu(h @ t(p + "ffn_up.weight").T + t(p + "ffn_up.bias"))
        x = x + up @ t(p + "ffn_down.weight").T + t(p + "ffn_down.bias")
    T2 = (x.shape[0] // 2) * 2  # qwen2a stride-2 avg pool before post-LN
    x = x[:T2].reshape(T2 // 2, 2, -1).mean(axis=1)
    x = ln(x, t("a.post_ln.weight"), t("a.post_ln.bias"))
    if skip_proj:
        return x
    return x @ t("mm.a.fc.weight").T + t("mm.a.fc.bias")


def test_whisper_encoder_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_audio_mmproj_gguf
    from tpullm.mtmd import WhisperAudioEncoder

    path = make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf", n_mel=16)
    enc = WhisperAudioEncoder(path)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((16, 100)).astype(np.float32)
    got = enc.encode_mel(mel)
    ref = np_whisper_encoder(enc.reader, mel)
    assert got.shape == (25, 64)  # stride-2 conv + stride-2 avg pool
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_ultravox_projector_shapes(tmp_path):
    from tpullm.models.testing import make_tiny_audio_mmproj_gguf
    from tpullm.mtmd import WhisperAudioEncoder

    path = make_tiny_audio_mmproj_gguf(tmp_path / "uv.gguf", n_mel=16,
                                       projector="ultravox", stack_factor=4)
    enc = WhisperAudioEncoder(path)
    mel = np.random.default_rng(1).standard_normal((16, 96)).astype(np.float32)
    out = enc.encode_mel(mel)
    # 96 frames → 48 positions → stacked by 4 → 12 tokens
    assert out.shape == (12, 64)
    assert np.isfinite(out).all()


def test_generate_with_audio(tmp_path):
    """End-to-end: <__media__> audio chunk + text through a tiny llama
    (≡ mtmd-cli with an mp3)."""
    from tpullm.models.testing import (
        make_tiny_audio_mmproj_gguf, make_tiny_llama_gguf,
    )
    from tpullm.mtmd import MEDIA_MARKER, WhisperAudioEncoder, generate_mtmd
    from tpullm.runtime import Engine

    model = make_tiny_llama_gguf(tmp_path / "m.gguf")
    enc = WhisperAudioEncoder(
        make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf", n_embd_llm=64))
    eng = Engine(model, mode="dense", max_seq=2048)
    samples = np.random.default_rng(2).standard_normal(16000).astype(np.float32)
    out = generate_mtmd(eng, None, f"describe {MEDIA_MARKER} sound",
                        [samples], max_new_tokens=4, audio=enc)
    assert isinstance(out, str)


# slow: audio-tower serving e2e (~156s); vision chat covers the mtmd
# serving path fast
@pytest.mark.slow
def test_server_audio_chat(tmp_path):
    """OpenAI input_audio content block through /v1/chat/completions
    (≡ server mtmd audio)."""
    import asyncio
    import base64
    import io
    import wave

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.models.testing import (
        make_tiny_audio_mmproj_gguf, make_tiny_llama_gguf,
    )
    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.server.api import Server
    from tpullm.server.scheduler import Scheduler

    model = make_tiny_llama_gguf(tmp_path / "m.gguf")
    mmproj = make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf", n_embd_llm=64)
    eng = BatchEngine(model, mode="dense", n_slots=2, max_seq=2048)
    sched = Scheduler(eng)
    sched.start()

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        samples = (np.sin(np.arange(4000) * 0.2) * 16000).astype(np.int16)
        f.writeframes(samples.tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()

    async def run():
        server = Server(sched, model_name="tiny", mmproj_path=mmproj)
        assert server.audio_enc is not None
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            body = {
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "transcribe:"},
                    {"type": "input_audio",
                     "input_audio": {"data": b64, "format": "wav"}},
                ]}],
                "max_tokens": 4,
                "temperature": 0,
            }
            r = await client.post("/v1/chat/completions", json=body)
            assert r.status == 200, await r.text()
            data = await r.json()
            assert data["choices"][0]["message"]["content"] is not None
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


# -- qwen2/2.5-VL + gemma3 towers vs transformers oracles ----------------------


def _qwen_mmproj_from_hf(path, model, *, proj_type, n_embd, n_ff, n_layer,
                         n_head, patch, merge, n_wa_pattern=0, window=0,
                         eps=1e-6):
    """Export an HF qwen vision tower state dict into the mmproj GGUF layout
    (≡ convert naming in tools/mtmd/clip-impl.h)."""
    from tpullm.gguf.writer import GGUFWriter

    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    w = GGUFWriter(path, architecture="clip")
    w.add_kv("clip.projector_type", proj_type)
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.feed_forward_length", n_ff)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", eps)
    w.add_kv("clip.vision.spatial_merge_size", merge)
    if n_wa_pattern:
        w.add_kv("clip.vision.n_wa_pattern", n_wa_pattern)
        w.add_kv("clip.vision.window_size", window)
    pw = sd["patch_embed.proj.weight"]  # [C, 3, tps, P, P]
    w.add_tensor("v.patch_embd.weight",
                 np.ascontiguousarray(pw[:, :, 0]).reshape(n_embd, -1))
    w.add_tensor("v.patch_embd.weight.1",
                 np.ascontiguousarray(pw[:, :, 1]).reshape(n_embd, -1))
    for i in range(n_layer):
        hp, gp = f"blocks.{i}.", f"v.blk.{i}."
        qkv_w = sd[hp + "attn.qkv.weight"]
        qkv_b = sd[hp + "attn.qkv.bias"]
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            w.add_tensor(gp + nm + ".weight", qkv_w[j * n_embd:(j + 1) * n_embd])
            w.add_tensor(gp + nm + ".bias", qkv_b[j * n_embd:(j + 1) * n_embd])
        w.add_tensor(gp + "attn_out.weight", sd[hp + "attn.proj.weight"])
        w.add_tensor(gp + "attn_out.bias", sd[hp + "attn.proj.bias"])
        w.add_tensor(gp + "ln1.weight", sd[hp + "norm1.weight"])
        if hp + "norm1.bias" in sd:
            w.add_tensor(gp + "ln1.bias", sd[hp + "norm1.bias"])
        w.add_tensor(gp + "ln2.weight", sd[hp + "norm2.weight"])
        if hp + "norm2.bias" in sd:
            w.add_tensor(gp + "ln2.bias", sd[hp + "norm2.bias"])
        if hp + "mlp.fc1.weight" in sd:  # 2.0 quick-gelu MLP
            w.add_tensor(gp + "ffn_up.weight", sd[hp + "mlp.fc1.weight"])
            w.add_tensor(gp + "ffn_up.bias", sd[hp + "mlp.fc1.bias"])
            w.add_tensor(gp + "ffn_down.weight", sd[hp + "mlp.fc2.weight"])
            w.add_tensor(gp + "ffn_down.bias", sd[hp + "mlp.fc2.bias"])
        else:  # 2.5 gated silu
            w.add_tensor(gp + "ffn_gate.weight", sd[hp + "mlp.gate_proj.weight"])
            w.add_tensor(gp + "ffn_gate.bias", sd[hp + "mlp.gate_proj.bias"])
            w.add_tensor(gp + "ffn_up.weight", sd[hp + "mlp.up_proj.weight"])
            w.add_tensor(gp + "ffn_up.bias", sd[hp + "mlp.up_proj.bias"])
            w.add_tensor(gp + "ffn_down.weight", sd[hp + "mlp.down_proj.weight"])
            w.add_tensor(gp + "ffn_down.bias", sd[hp + "mlp.down_proj.bias"])
    w.add_tensor("v.post_ln.weight", sd["merger.ln_q.weight"])
    if "merger.ln_q.bias" in sd:
        w.add_tensor("v.post_ln.bias", sd["merger.ln_q.bias"])
    w.add_tensor("mm.0.weight", sd["merger.mlp.0.weight"])
    w.add_tensor("mm.0.bias", sd["merger.mlp.0.bias"])
    w.add_tensor("mm.2.weight", sd["merger.mlp.2.weight"])
    w.add_tensor("mm.2.bias", sd["merger.mlp.2.bias"])
    w.write()
    return str(path)


def _qwen_hf_patches(img, tps, P, m):
    """Replicate Qwen2VLImageProcessor patch flattening for one still image
    (features ordered [c, t, py, px], sequence in 2x2 merge-block order)."""
    C, H, W = img.shape
    gh, gw = H // P, W // P
    pat = np.stack([img] * tps)  # temporal duplicate
    pat = pat.reshape(1, tps, C, gh // m, m, P, gw // m, m, P)
    pat = pat.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return np.ascontiguousarray(pat).reshape(gh * gw, C * tps * P * P)


def test_qwen2vl_tower_matches_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig,
    )
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    from tpullm.mtmd import load_vision

    cfg = Qwen2VLVisionConfig(
        depth=2, embed_dim=32, hidden_size=48, num_heads=2, mlp_ratio=2,
        patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
    )
    torch.manual_seed(0)
    hf = Qwen2VisionTransformerPretrainedModel(cfg).eval().float()
    path = _qwen_mmproj_from_hf(
        tmp_path / "q2vl.gguf", hf, proj_type="qwen2vl_merger",
        n_embd=32, n_ff=64, n_layer=2, n_head=2, patch=4, merge=2,
    )
    tower = load_vision(path)
    from tpullm.mtmd import Qwen2VLVision

    assert isinstance(tower, Qwen2VLVision)
    rng = np.random.default_rng(3)
    img = rng.normal(size=(3, 16, 24)).astype(np.float32)  # 4x6 patch grid
    got = tower.encode_pixels(img)
    with torch.no_grad():
        flat = torch.from_numpy(_qwen_hf_patches(img, 2, 4, 2))
        ref = hf(flat, grid_thw=torch.tensor([[1, 4, 6]])).numpy()
    assert got.shape == ref.shape == (6, 48)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_qwen25vl_tower_matches_transformers(tmp_path):
    """2.5 adds RMS norms, gated-silu FFN and window attention."""
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    from tpullm.mtmd import load_vision

    cfg = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=32, out_hidden_size=48, intermediate_size=64,
        num_heads=2, patch_size=4, spatial_merge_size=2,
        temporal_patch_size=2, window_size=8, fullatt_block_indexes=[1, 3],
    )
    torch.manual_seed(1)
    hf = Qwen2_5_VisionTransformerPretrainedModel(cfg).eval().float()
    path = _qwen_mmproj_from_hf(
        tmp_path / "q25vl.gguf", hf, proj_type="qwen2.5vl_merger",
        n_embd=32, n_ff=64, n_layer=4, n_head=2, patch=4, merge=2,
        n_wa_pattern=2, window=8,
    )
    tower = load_vision(path)
    rng = np.random.default_rng(5)
    img = rng.normal(size=(3, 24, 16)).astype(np.float32)  # 6x4 grid
    got = tower.encode_pixels(img)
    with torch.no_grad():
        flat = torch.from_numpy(_qwen_hf_patches(img, 2, 4, 2))
        ref = hf(flat, grid_thw=torch.tensor([[1, 6, 4]])).numpy()
    assert got.shape == ref.shape == (6, 48)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_qwen_smart_resize_bounds():
    from tpullm.mtmd.qwen_vl import smart_resize

    h, w = smart_resize(1000, 700, 28, 8 * 28 * 28, 1024 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0
    assert 8 * 28 * 28 <= h * w <= 1024 * 28 * 28
    # tiny images round up to the minimum token budget
    h, w = smart_resize(10, 10, 28, 8 * 28 * 28, 1024 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0 and h * w >= 8 * 28 * 28


def test_gemma3_tower_matches_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from tpullm.gguf.writer import GGUFWriter
    from tpullm.mtmd import Gemma3Vision, load_vision

    n_embd, n_layer, n_head, patch, size, llm = 32, 2, 2, 4, 32, 48
    cfg = SiglipVisionConfig(
        hidden_size=n_embd, intermediate_size=64, num_hidden_layers=n_layer,
        num_attention_heads=n_head, image_size=size, patch_size=patch,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(2)
    hf = SiglipVisionModel(cfg).eval().float()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(9)
    soft_norm = rng.normal(size=n_embd).astype(np.float32) * 0.1
    in_proj = rng.normal(size=(n_embd, llm)).astype(np.float32) * 0.1

    w = GGUFWriter(tmp_path / "g3v.gguf", architecture="clip")
    w.add_kv("clip.projector_type", "gemma3")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.vision.image_size", size)
    w.add_kv("clip.vision.patch_size", patch)
    w.add_kv("clip.vision.embedding_length", n_embd)
    w.add_kv("clip.vision.block_count", n_layer)
    w.add_kv("clip.vision.attention.head_count", n_head)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.projector.scale_factor", 2)
    pre = "vision_model."
    w.add_tensor("v.patch_embd.weight",
                 sd[pre + "embeddings.patch_embedding.weight"].reshape(n_embd, -1))
    w.add_tensor("v.patch_embd.bias", sd[pre + "embeddings.patch_embedding.bias"])
    w.add_tensor("v.position_embd.weight",
                 sd[pre + "embeddings.position_embedding.weight"])
    for i in range(n_layer):
        hp, gp = pre + f"encoder.layers.{i}.", f"v.blk.{i}."
        w.add_tensor(gp + "ln1.weight", sd[hp + "layer_norm1.weight"])
        w.add_tensor(gp + "ln1.bias", sd[hp + "layer_norm1.bias"])
        w.add_tensor(gp + "ln2.weight", sd[hp + "layer_norm2.weight"])
        w.add_tensor(gp + "ln2.bias", sd[hp + "layer_norm2.bias"])
        for hf_nm, gg_nm in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                             ("v_proj", "attn_v"), ("out_proj", "attn_out")):
            w.add_tensor(gp + gg_nm + ".weight", sd[hp + f"self_attn.{hf_nm}.weight"])
            w.add_tensor(gp + gg_nm + ".bias", sd[hp + f"self_attn.{hf_nm}.bias"])
        w.add_tensor(gp + "ffn_up.weight", sd[hp + "mlp.fc1.weight"])
        w.add_tensor(gp + "ffn_up.bias", sd[hp + "mlp.fc1.bias"])
        w.add_tensor(gp + "ffn_down.weight", sd[hp + "mlp.fc2.weight"])
        w.add_tensor(gp + "ffn_down.bias", sd[hp + "mlp.fc2.bias"])
    w.add_tensor("v.post_ln.weight", sd[pre + "post_layernorm.weight"])
    w.add_tensor("v.post_ln.bias", sd[pre + "post_layernorm.bias"])
    # gemma folds the +1 of its RMSNorm into the stored weight
    w.add_tensor("mm.soft_emb_norm.weight", 1.0 + soft_norm)
    w.add_tensor("mm.input_projection.weight", in_proj)
    w.write()

    tower = load_vision(str(tmp_path / "g3v.gguf"))
    assert isinstance(tower, Gemma3Vision)
    rng2 = np.random.default_rng(11)
    px = rng2.normal(size=(3, size, size)).astype(np.float32)
    got = np.asarray(tower._encode(tower.params, px))

    with torch.no_grad():
        hidden = hf(torch.from_numpy(px[None])).last_hidden_state[0].numpy()
    side = size // patch
    k = 2
    pooled = hidden.reshape(side // k, k, side // k, k, n_embd).mean(
        axis=(1, 3)).reshape(-1, n_embd)
    var = (pooled.astype(np.float64) ** 2).mean(-1, keepdims=True)
    normed = pooled / np.sqrt(var + 1e-6)
    ref = (normed * (1.0 + soft_norm)) @ in_proj
    assert got.shape == ref.shape == ((side // k) ** 2, llm)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_generate_mtmd_mrope_positions(tmp_path):
    """build_multimodal_inputs produces get_rope_index-style streams for an
    mrope text stack (grid pins t, sweeps h/w, counter jumps by max side);
    generate_mtmd prefills with them and decode continues from the mrope
    counter (rope_pos_delta trails n_past)."""
    import numpy as np

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.mtmd.pipeline import build_multimodal_inputs, generate_mtmd
    from tpullm.runtime import Engine

    path = make_tiny_llama_gguf(
        tmp_path / "q2vl.gguf", arch="qwen2vl",
        extra_kv={"qwen2vl.rope.dimension_sections":
                  np.asarray([2, 2, 2, 0], np.int32)})
    eng = Engine(path, mode="dense", max_seq=128)
    assert eng.hp.rope.sections == (2, 2, 2, 0)

    class FakeClip:
        def encode_image(self, item):
            self.last_grid = (2, 3)
            rng = np.random.default_rng(0)
            return rng.normal(size=(6, eng.hp.n_embd)).astype(np.float32) * 0.01

    clip = FakeClip()
    text = "the quick <__media__> brown fox"
    embds, positions, ds = build_multimodal_inputs(eng, clip, text, [object()])
    assert ds is None and positions is not None and positions.shape[0] == 4
    n = embds.shape[0]
    # image occupies 6 tokens somewhere; afterwards the counter trails n
    assert int(positions[:, -1].max()) < n - 1
    # within the image block, t is constant and h/w sweep the 2×3 grid
    img0 = np.flatnonzero(positions[1] != positions[2])
    assert img0.size > 0  # h ≠ w somewhere only inside the grid
    out = generate_mtmd(eng, clip, text, [object()], max_new_tokens=3,
                        stop_on_eog=False)
    assert isinstance(out, str)
    assert eng.rope_pos_delta < 0  # grid compressed the position counter


def test_batch_engine_mrope_slot_matches_engine(tmp_path):
    """BatchEngine.prefill_slot_embeddings with M-RoPE streams + deepstack
    matches the single-stream Engine bit-for-bit, sets the slot's
    rope_delta, and decode continues through the batched step (the server
    vision path for qwen-VL models)."""
    import numpy as np

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime import Engine
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_llama_gguf(
        tmp_path / "q2vl_b.gguf", arch="qwen2vl",
        extra_kv={"qwen2vl.rope.dimension_sections":
                  np.asarray([2, 2, 2, 0], np.int32)})
    be = BatchEngine(path, n_slots=2, max_seq=128, dtype=jnp.float32,
                     kv_dtype=jnp.float32)
    se = Engine(path, mode="dense", dtype=jnp.float32, max_seq=128,
                kv_dtype=jnp.float32)
    E = be.hp.n_embd
    rng = np.random.default_rng(5)
    n, n_img, st = 10, 6, 2
    embds = rng.normal(size=(n, E)).astype(np.float32) * 0.02
    g = np.arange(n_img, dtype=np.int32)
    img = np.stack([np.full(n_img, st), st + g // 3, st + g % 3,
                    np.full(n_img, st)]).astype(np.int32)
    tail = np.arange(st + 3, st + 3 + (n - st - n_img), dtype=np.int32)
    pos = np.concatenate([
        np.broadcast_to(np.arange(st, dtype=np.int32), (4, st)).copy(),
        img, np.broadcast_to(tail, (4, n - st - n_img)).copy()], axis=1)
    ds = (rng.normal(size=(2, n, E)) * 0.01).astype(np.float32)

    got = be.prefill_slot_embeddings(1, embds, positions=pos, deepstack=ds)
    ref = se.prefill_embeddings(embds, positions=pos, deepstack=ds)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert int(be.rope_delta[1]) == int(pos[:, -1].max()) + 1 - n < 0

    # decode uses the compressed rope counter on both engines
    se.rope_pos_delta = int(be.rope_delta[1])
    got2 = be.decode_batch({1: 7})[1]
    ref2 = se.decode_step(7)
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-5)
    be.free_slot(1)
    assert int(be.rope_delta[1]) == 0


def test_server_vision_chat_mrope(mmproj, tmp_path):
    """Server vision request against an M-RoPE text stack (qwen2vl arch):
    the scheduler threads position streams through the slot prefill."""
    import asyncio
    import base64
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.server.api import Server
    from tpullm.server.scheduler import Scheduler

    llm = make_tiny_llama_gguf(
        tmp_path / "q2vl_srv.gguf", arch="qwen2vl",
        extra_kv={"qwen2vl.rope.dimension_sections":
                  np.asarray([2, 2, 2, 0], np.int32)})
    engine = BatchEngine(llm, n_slots=2, max_seq=128, mode="dense",
                         prefill_chunk=32)
    assert engine.hp.rope.sections
    sched = Scheduler(engine)
    sched.start()

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(6).integers(0, 255, (28, 28, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    data_uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    async def run():
        server = Server(sched, model_name="tiny", mmproj_path=mmproj)
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "max_tokens": 4, "temperature": 0,
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "what is this?"},
                    {"type": "image_url", "image_url": {"url": data_uri}},
                ]}],
            })
            assert r.status == 200
            data = await r.json()
            assert data["choices"][0]["message"]["role"] == "assistant"
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_clip_mlp_norm_projector(tmp_path):
    """Yi-VL mlp_norm projector (clip.cpp PROJECTOR_TYPE_MLP_NORM, detected
    by the mm.1/mm.3/mm.4 norm tensors): mm.0 → LN → GELU → mm.3 → LN,
    pinned against the numpy replica of the reference graph."""
    from tpullm.models.testing import make_tiny_mmproj_gguf

    path = make_tiny_mmproj_gguf(tmp_path / "yivl.gguf",
                                 projector="mlp_norm")
    clip = ClipVision(path)
    rng = np.random.default_rng(9)
    pixels = rng.standard_normal((3, 28, 28)).astype(np.float32) * 0.5
    got = clip.encode(pixels[None])[0]
    assert got.shape == (16, 64)
    ref = np_clip_forward(clip.reader, pixels)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_music_flamingo_projector(tmp_path):
    """whisper-enc.cpp PROJECTOR_TYPE_MUSIC_FLAMINGO: avg-pooled frames
    through a biased 2-layer GELU-erf MLP."""
    from tpullm.models.testing import make_tiny_audio_mmproj_gguf
    from tpullm.mtmd import WhisperAudioEncoder

    path = make_tiny_audio_mmproj_gguf(tmp_path / "mf.gguf", n_mel=16,
                                       projector="music_flamingo")
    enc = WhisperAudioEncoder(path)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((16, 100)).astype(np.float32)
    out = enc.encode_mel(mel)
    assert out.shape == (25, 64)  # conv/2 then avgpool/2 like qwen2a
    # oracle: shared whisper body (qwen2a oracle minus its fc) + the MLP
    t = lambda n: enc.reader.tensors[n].to_numpy().astype(np.float64)
    body = np_whisper_encoder(enc.reader, mel, skip_proj=True)
    import math
    erf = np.vectorize(math.erf)
    gelu = lambda v: 0.5 * v * (1 + erf(v / np.sqrt(2)))
    ref = gelu(body @ t("mm.a.mlp.1.weight").T + t("mm.a.mlp.1.bias"))
    ref = ref @ t("mm.a.mlp.2.weight").T + t("mm.a.mlp.2.bias")
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_glma_projector(tmp_path):
    """whisper-enc.cpp PROJECTOR_TYPE_GLMA: LN -> stack -> biased GELU-erf
    MLP -> BOI/EOI markers."""
    from tpullm.models.testing import make_tiny_audio_mmproj_gguf
    from tpullm.mtmd import WhisperAudioEncoder

    path = make_tiny_audio_mmproj_gguf(tmp_path / "ga.gguf", n_mel=16,
                                       projector="glma", stack_factor=4)
    enc = WhisperAudioEncoder(path)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((16, 96)).astype(np.float32)
    out = enc.encode_mel(mel)
    # 96 frames -> 48 positions -> stack 4 -> 12 tokens + BOI + EOI
    assert out.shape == (14, 64)
    assert np.isfinite(out).all()
    boi = enc.reader.tensors["v.boi"].to_numpy().reshape(-1)
    eoi = enc.reader.tensors["v.eoi"].to_numpy().reshape(-1)
    np.testing.assert_allclose(out[0], boi, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[-1], eoi, rtol=1e-5, atol=1e-6)
