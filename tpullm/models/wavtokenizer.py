"""WavTokenizer decoder (audio-codec vocoder for OuteTTS).

Reference graph: llm_build_wavtokenizer_dec (src/models/wavtokenizer-dec.cpp)
and the ISTFT synthesis in tools/tts/tts.cpp embd_to_audio (:201-281).

Pipeline: code embeddings → conv1d → posnet (resnet blocks with group-norm
+ swish, one full-attention block, final group-norm) → LayerNorm → convnext
stack (depthwise conv → LN → pointwise GELU MLP → gamma, residual) → final
LayerNorm → linear head producing per-frame [log-magnitude | phase] halves
of an n_fft=1280 spectrum; embd_to_audio turns that into waveform samples
via irfft + hann overlap-add (24 kHz mono).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models.hparams import HParams
from .llama import Params

N_FFT = 1280
N_HOP = 320
SAMPLE_RATE = 24000


def _conv_w(info):
    """GGUF conv1d weight (C_out, C_in, K) as f32 array."""
    w = info.to_numpy()
    return jnp.asarray(w, jnp.float32)


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors
    md = r.metadata
    arch = hp.arch

    def vec(name):
        return jnp.asarray(t[name].to_numpy(), jnp.float32)

    n_posnet = int(md.get(f"{arch}.posnet.block_count", 6))
    n_convnext = int(md.get(f"{arch}.convnext.block_count", 12))

    posnet = []
    for i in range(n_posnet):
        p = f"posnet.{i}."
        layer = {}
        for nm in ("conv1", "conv2", "attn_q", "attn_k", "attn_v", "attn_output"):
            if p + nm + ".weight" in t:
                layer[nm] = _conv_w(t[p + nm + ".weight"])
                layer[nm + "_b"] = vec(p + nm + ".bias")
        for nm in ("norm", "norm1", "norm2", "attn_norm"):
            if p + nm + ".weight" in t:
                layer[nm] = vec(p + nm + ".weight")
                layer[nm + "_b"] = vec(p + nm + ".bias")
        posnet.append(layer)

    convnext = []
    for i in range(n_convnext):
        p = f"convnext.{i}."
        convnext.append({
            "dw": _conv_w(t[p + "dw.weight"]),
            "dw_b": vec(p + "dw.bias"),
            "norm": vec(p + "norm.weight"),
            "norm_b": vec(p + "norm.bias"),
            "pw1": vec(p + "pw1.weight"),
            "pw1_b": vec(p + "pw1.bias"),
            "pw2": vec(p + "pw2.weight"),
            "pw2_b": vec(p + "pw2.bias"),
            "gamma": vec(p + "gamma.weight"),
        })

    return {
        "tok_embd": jnp.asarray(t["token_embd.weight"].to_numpy(), jnp.float32),
        "tok_norm": vec("token_embd_norm.weight"),
        "tok_norm_b": vec("token_embd_norm.bias"),
        "conv1d": _conv_w(t["conv1d.weight"]),
        "conv1d_b": vec("conv1d.bias"),
        "posnet": posnet,
        "convnext": convnext,
        "output_norm": vec("output_norm.weight"),
        "output_norm_b": vec("output_norm.bias"),
        "output": jnp.asarray(t["output.weight"].to_numpy(), jnp.float32),
        "output_b": vec("output.bias"),
    }


def _conv1d_same(x, w, b):
    """x [B, T, Cin]; w [Cout, Cin, K] -> [B, T, Cout] (same padding)."""
    out = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)),  # [K, Cin, Cout]
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b[None, None, :]


def _dwconv1d_same(x, w, b):
    """Depthwise: x [B, T, C]; w [C, 1, K]."""
    C = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)),  # [K, 1, C]
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )
    return out + b[None, None, :]


def _group_norm(x, weight, bias, n_groups, eps):
    """x [B, T, C]: normalize per (group-of-channels × time), affine per
    channel (ggml_group_norm over the [T, C/g] block)."""
    B, T, C = x.shape
    g = x.reshape(B, T, n_groups, C // n_groups)
    mu = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, T, C) * weight[None, None] + bias[None, None]


def _layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,  # audio codes [B, T]
    positions: jax.Array,  # unused
    cache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, object]:
    ng = hp.n_norm_groups or 32
    geps = hp.norm_group_eps
    eps = hp.rms_eps
    x = params["tok_embd"][tokens]  # [B, T, E]
    x = _conv1d_same(x, params["conv1d"], params["conv1d_b"])

    for il, layer in enumerate(params["posnet"]):
        res = x
        if "attn_q" in layer:  # full-attention block (posnet layer 2)
            h = _group_norm(x, layer["attn_norm"], layer["attn_norm_b"], ng, geps)
            q = _conv1d_same(h, layer["attn_q"], layer["attn_q_b"])
            k = _conv1d_same(h, layer["attn_k"], layer["attn_k_b"])
            v = _conv1d_same(h, layer["attn_v"], layer["attn_v_b"])
            C = q.shape[-1]
            scores = jnp.einsum("btc,bsc->bts", q, k) / jnp.sqrt(float(C))
            probs = jax.nn.softmax(scores, axis=-1)
            h = jnp.einsum("bts,bsc->btc", probs, v)
            x = res + _conv1d_same(h, layer["attn_output"], layer["attn_output_b"])
        elif "conv1" in layer:  # resnet block
            h = _group_norm(x, layer["norm1"], layer["norm1_b"], ng, geps)
            h = h * jax.nn.sigmoid(h)  # swish
            h = _conv1d_same(h, layer["conv1"], layer["conv1_b"])
            h = _group_norm(h, layer["norm2"], layer["norm2_b"], ng, geps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, layer["conv2"], layer["conv2_b"])
            x = res + h
        else:  # trailing group norm (posnet layer 5)
            x = _group_norm(x, layer["norm"], layer["norm_b"], ng, geps)

    x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"], eps)

    for layer in params["convnext"]:
        res = x
        h = _dwconv1d_same(x, layer["dw"], layer["dw_b"])
        h = _layer_norm(h, layer["norm"], layer["norm_b"], eps)
        h = jnp.dot(h, layer["pw1"].T) + layer["pw1_b"]
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.dot(h, layer["pw2"].T) + layer["pw2_b"]
        x = res + h * layer["gamma"][None, None]

    x = _layer_norm(x, params["output_norm"], params["output_norm_b"], eps)
    out = jnp.dot(x, params["output"].T) + params["output_b"]
    return out.astype(jnp.float32), cache


def embd_to_audio(embd: np.ndarray) -> np.ndarray:
    """[n_codes, n_embd] spectral frames → waveform (tts.cpp embd_to_audio):
    first half log-magnitudes, second half phases; irfft + periodic-hann
    overlap-add with hann² envelope normalization."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    n_pad = (N_FFT - N_HOP) // 2
    n_out = (n_codes - 1) * N_HOP + N_FFT

    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # [n_codes, half]
    # tts.cpp irfft is a ONE-SIDED inverse DFT (no Hermitian mirror) scaled
    # by 1/N with N = n_fft/2+1 — reproduce it via a zero-padded ifft
    full = np.zeros((n_codes, N_FFT), dtype=np.complex128)
    full[:, :half] = spec
    frames = np.real(np.fft.ifft(full, axis=1)) * (N_FFT / half)

    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT)
    audio = np.zeros(n_out)
    env = np.zeros(n_out)
    for l in range(n_codes):
        start = l * N_HOP
        audio[start:start + N_FFT] += frames[l] * hann
        env[start:start + N_FFT] += hann * hann
    audio = audio / np.maximum(env, 1e-8)
    return audio[n_pad:n_out - n_pad].astype(np.float32)
