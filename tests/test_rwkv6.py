"""RWKV6 vs a sequential numpy reference (≡ reference llm_build_rwkv6 +
the ggml RWKV_WKV6 CPU kernel semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_rwkv6_gguf
from tpullm.runtime import Engine


def np_rwkv6_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["rwkv6.block_count"]
    E = md["rwkv6.embedding_length"]
    D = md["rwkv6.wkv.head_size"]
    H = E // D
    eps = md["rwkv6.attention.layer_norm_epsilon"]
    rescale = md["rwkv6.rescale_every_n_layers"]

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def silu(x):
        return x / (1 + np.exp(-x))

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    x = ln(x, t("token_embd_norm.weight"), t("token_embd_norm.bias"))
    for li in range(n_layer):
        p = f"blk.{li}."
        att_norm = ln(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"))
        x_prev = np.concatenate([np.zeros((1, E)), att_norm[:-1]], axis=0)
        cur = att_norm
        sx = x_prev - cur
        xxx = cur + sx * t(p + "time_mix_lerp_x.weight")
        w1 = t(p + "time_mix_w1.weight").reshape(5, -1, E)
        w2 = t(p + "time_mix_w2.weight")  # (5, E, rank)
        fused = t(p + "time_mix_lerp_fused.weight").reshape(5, E)
        mixed = []
        for gidx in range(5):
            five = np.tanh(xxx @ w1[gidx].T)  # [T, rank]
            delta = five @ w2[gidx].T  # [T, E]
            mixed.append(cur + sx * (delta + fused[gidx]))
        xw, xk, xv, xr, xg = mixed

        r = (xr @ t(p + "time_mix_receptance.weight").T).reshape(T, H, D)
        k = (xk @ t(p + "time_mix_key.weight").T).reshape(T, H, D)
        v = (xv @ t(p + "time_mix_value.weight").T).reshape(T, H, D)
        g = silu(xg @ t(p + "time_mix_gate.weight").T)
        w = np.tanh(xw @ t(p + "time_mix_decay_w1.weight").T) @ t(p + "time_mix_decay_w2.weight").T
        w = w + t(p + "time_mix_decay.weight")
        w = np.exp(-np.exp(w)).reshape(T, H, D)
        first = t(p + "time_mix_first.weight").reshape(H, D)

        # sequential wkv6 (ggml CPU kernel semantics)
        S = np.zeros((H, D, D))
        out = np.zeros((T, H, D))
        for step in range(T):
            for h in range(H):
                kv = np.outer(k[step, h], v[step, h])  # [i, j]
                out[step, h] = r[step, h] @ (first[h][:, None] * kv + S[h])
                S[h] = S[h] * w[step, h][:, None] + kv
        # per-head group norm
        mu = out.mean(-1, keepdims=True)
        var = ((out - mu) ** 2).mean(-1, keepdims=True)
        out = (out - mu) / np.sqrt(var + 64e-5)
        out = out.reshape(T, E) * t(p + "time_mix_ln.weight") + t(p + "time_mix_ln.bias")
        out = out * g
        x = x + out @ t(p + "time_mix_output.weight").T

        ffn_norm = ln(x, t(p + "attn_norm_2.weight"), t(p + "attn_norm_2.bias"))
        x_prev = np.concatenate([np.zeros((1, E)), ffn_norm[:-1]], axis=0)
        cur = ffn_norm
        sx = x_prev - cur
        xk_c = cur + sx * t(p + "channel_mix_lerp_k.weight")
        xr_c = cur + sx * t(p + "channel_mix_lerp_r.weight")
        rr = 1 / (1 + np.exp(-(xr_c @ t(p + "channel_mix_receptance.weight").T)))
        kk = np.square(np.maximum(xk_c @ t(p + "channel_mix_key.weight").T, 0.0))
        x = x + rr * (kk @ t(p + "channel_mix_value.weight").T)

        if rescale and (li + 1) % rescale == 0:
            x = x * 0.5

    x = ln(x, t("output_norm.weight"), t("output_norm.bias"))
    return x @ t("output.weight").T


@pytest.fixture(scope="module")
def rwkv_model(tmp_path_factory):
    return make_tiny_rwkv6_gguf(tmp_path_factory.mktemp("rwkv") / "r.gguf")


def test_rwkv6_forward_matches_numpy(rwkv_model):
    eng = Engine(rwkv_model, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_rwkv6_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_rwkv6_decode_matches_prefill(rwkv_model):
    """Associative-scan state == step-by-step decode state (incl. token
    shift carry)."""
    eng = Engine(rwkv_model, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    all_logits = eng.prefill_all_logits(toks)

    eng2 = Engine(rwkv_model, mode="dense", dtype=jnp.float32, max_seq=64)
    logits = None
    for tk in toks:
        logits = eng2.decode_step(tk)
    np.testing.assert_allclose(logits, all_logits[-1], rtol=2e-3, atol=2e-3)


def test_rwkv6_generation_runs(rwkv_model):
    eng = Engine(rwkv_model, mode="dense", max_seq=64)
    assert isinstance(eng.generate("the quick", max_new_tokens=6), str)
