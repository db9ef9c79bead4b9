"""WavTokenizer vocoder + TTS pipeline tests (≡ tools/tts +
llm_build_wavtokenizer_dec)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.registry import get_arch, load_hparams
from tpullm.models.testing import make_tiny_wavtokenizer_gguf
from tpullm.models.wavtokenizer import embd_to_audio


def np_wavtok_forward(reader: GGUFReader, codes):
    md = reader.metadata
    arch = "wavtokenizer-dec"
    ng = md[f"{arch}.attention.group_norm_groups"]
    geps = md[f"{arch}.attention.group_norm_epsilon"]
    eps = md[f"{arch}.attention.layer_norm_epsilon"]

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def has(name):
        return name in reader.tensors

    def conv_same(x, w, b):  # x [T, Cin]; w [Cout, Cin, K]
        T, Cin = x.shape
        Cout, _, K = w.shape
        pad = K // 2
        xp = np.zeros((T + 2 * pad, Cin))
        xp[pad:pad + T] = x
        out = np.zeros((T, Cout))
        for k in range(K):
            out += xp[k:k + T] @ w[:, :, k].T
        return out + b

    def dwconv_same(x, w, b):  # w [C, 1, K]
        T, C = x.shape
        K = w.shape[2]
        pad = K // 2
        xp = np.zeros((T + 2 * pad, C))
        xp[pad:pad + T] = x
        out = np.zeros((T, C))
        for k in range(K):
            out += xp[k:k + T] * w[:, 0, k]
        return out + b

    def gnorm(x, wt, b):  # per group (channels × time)
        T, C = x.shape
        g = x.reshape(T, ng, C // ng)
        mu = g.mean(axis=(0, 2), keepdims=True)
        var = ((g - mu) ** 2).mean(axis=(0, 2), keepdims=True)
        g = (g - mu) / np.sqrt(var + geps)
        return g.reshape(T, C) * wt + b

    def lnorm(x, wt, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * wt + b

    x = t("token_embd.weight")[codes]
    x = conv_same(x, t("conv1d.weight"), t("conv1d.bias"))
    for i in range(6):
        p = f"posnet.{i}."
        res = x
        if has(p + "attn_q.weight"):
            h = gnorm(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"))
            q = conv_same(h, t(p + "attn_q.weight"), t(p + "attn_q.bias"))
            k = conv_same(h, t(p + "attn_k.weight"), t(p + "attn_k.bias"))
            v = conv_same(h, t(p + "attn_v.weight"), t(p + "attn_v.bias"))
            scores = q @ k.T / np.sqrt(q.shape[1])
            e = np.exp(scores - scores.max(-1, keepdims=True))
            probs = e / e.sum(-1, keepdims=True)
            h = probs @ v
            x = res + conv_same(h, t(p + "attn_output.weight"),
                                t(p + "attn_output.bias"))
        elif has(p + "conv1.weight"):
            h = gnorm(x, t(p + "norm1.weight"), t(p + "norm1.bias"))
            h = h * (1 / (1 + np.exp(-h)))  # swish
            h = conv_same(h, t(p + "conv1.weight"), t(p + "conv1.bias"))
            h = gnorm(h, t(p + "norm2.weight"), t(p + "norm2.bias"))
            h = h * (1 / (1 + np.exp(-h)))
            h = conv_same(h, t(p + "conv2.weight"), t(p + "conv2.bias"))
            x = res + h
        else:
            x = gnorm(x, t(p + "norm.weight"), t(p + "norm.bias"))
    x = lnorm(x, t("token_embd_norm.weight"), t("token_embd_norm.bias"))
    for i in range(2):
        p = f"convnext.{i}."
        res = x
        h = dwconv_same(x, t(p + "dw.weight"), t(p + "dw.bias"))
        h = lnorm(h, t(p + "norm.weight"), t(p + "norm.bias"))
        h = h @ t(p + "pw1.weight").T + t(p + "pw1.bias")
        from scipy.special import erf
        h = 0.5 * h * (1 + erf(h / np.sqrt(2)))
        h = h @ t(p + "pw2.weight").T + t(p + "pw2.bias")
        x = res + h * t(p + "gamma.weight")
    x = lnorm(x, t("output_norm.weight"), t("output_norm.bias"))
    return x @ t("output.weight").T + t("output.bias")


def test_wavtokenizer_forward_matches_numpy(tmp_path):
    path = make_tiny_wavtokenizer_gguf(tmp_path / "wt.gguf")
    reader = GGUFReader(path)
    hp = load_hparams(reader)
    spec = get_arch(hp.arch)
    params = spec.build_params(reader, hp)
    codes = np.asarray([3, 17, 42, 5, 9, 11], np.int32)
    toks = jnp.asarray(codes[None])
    embd, _ = jax.jit(
        lambda p, t_: spec.forward(hp, p, t_, jnp.zeros_like(t_), jnp.zeros(()), 0)
    )(params, toks)
    got = np.asarray(embd[0])
    ref = np_wavtok_forward(reader, codes)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_embd_to_audio_shapes():
    rng = np.random.default_rng(0)
    n_codes = 8
    embd = rng.standard_normal((n_codes, 1282)).astype(np.float32) * 0.1
    audio = embd_to_audio(embd)
    n_out = (n_codes - 1) * 320 + 1280
    n_pad = (1280 - 320) // 2
    assert audio.shape == (n_out - 2 * n_pad,)
    assert np.isfinite(audio).all()


def test_tts_helpers_and_wav(tmp_path):
    from tpullm.tools.tts import (build_prompt, codes_from_tokens,
                                  decode_codes, write_wav)

    prompt = build_prompt("Hello, World! 123")
    assert prompt.startswith("<|im_start|>\n<|text_start|>hello<|text_sep|>world")
    assert prompt.endswith("<|audio_start|>\n")
    toks = [10, 151672, 151700, 155772, 155773, 99]
    assert codes_from_tokens(toks) == [0, 28, 4100]

    # vocoder end-to-end: codes → audio → wav file
    path = make_tiny_wavtokenizer_gguf(tmp_path / "wt.gguf")
    audio = decode_codes(path, [1, 2, 3, 4, 5, 6, 7, 8])
    assert np.isfinite(audio).all() and audio.ndim == 1
    out = str(tmp_path / "out.wav")
    write_wav(out, audio)
    assert os.path.getsize(out) > 44
