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


def np_whisper_encoder(reader, mel):
    """Independent numpy whisper-encoder forward (qwen2a projector)."""
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
    x = ln(x, t("a.post_ln.weight"), t("a.post_ln.bias"))
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
    assert got.shape == (50, 64)  # stride-2 conv halves frames
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
