"""RWKV7 correctness vs an independent numpy reference
(≡ llm_build_rwkv7 + ggml RWKV_WKV7, ggml-cpu/ops.cpp:10302)."""

import numpy as np

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_rwkv7_gguf
from tpullm.runtime import Engine

GN_EPS = 64e-5


def np_rwkv7_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["rwkv7.block_count"]
    E = md["rwkv7.embedding_length"]
    D = md["rwkv7.wkv.head_size"]
    H = E // D
    eps = md["rwkv7.attention.layer_norm_epsilon"]

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def has(name):
        return name in reader.tensors

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def sigmoid(z):
        return 1 / (1 + np.exp(-z))

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    x = ln(x, t("token_embd_norm.weight"), t("token_embd_norm.bias"))
    v_first = None
    for i in range(n_layer):
        p = f"blk.{i}."
        att_norm = ln(x, t(p + "attn_norm.weight"), t(p + "attn_norm.bias"))
        x_prev = np.concatenate([np.zeros((1, E)), att_norm[:-1]], axis=0)
        cur = att_norm
        sx = x_prev - cur
        fused = t(p + "time_mix_lerp_fused.weight").reshape(-1, E)
        mixed = cur[:, None] + sx[:, None] * fused[None]
        xr, xw, xk, xv, xa = [mixed[:, j] for j in range(5)]
        gated = has(p + "time_mix_g1.weight")
        xg = mixed[:, 5] if gated else None

        r = xr @ t(p + "time_mix_receptance.weight").T
        w = t(p + "time_mix_w0.weight").reshape(-1) + np.tanh(
            xw @ t(p + "time_mix_w1.weight").T) @ t(p + "time_mix_w2.weight").T
        w = np.exp(-0.606531 * sigmoid(w))
        k = xk @ t(p + "time_mix_key.weight").T
        v = xv @ t(p + "time_mix_value.weight").T
        if v_first is None:
            v_first = v
        else:
            gate = sigmoid(t(p + "time_mix_v0.weight").reshape(-1)
                           + (xv @ t(p + "time_mix_v1.weight").T)
                           @ t(p + "time_mix_v2.weight").T)
            v = v + (v_first - v) * gate
        a = sigmoid(t(p + "time_mix_a0.weight").reshape(-1)
                    + (xa @ t(p + "time_mix_a1.weight").T)
                    @ t(p + "time_mix_a2.weight").T)
        g = None
        if gated:
            g = sigmoid(xg @ t(p + "time_mix_g1.weight").T) \
                @ t(p + "time_mix_g2.weight").T

        kk = (k * t(p + "time_mix_k_k.weight").reshape(-1)).reshape(T, H, D)
        kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
        ka = k * t(p + "time_mix_k_a.weight").reshape(-1)
        k_f = (k + a * ka - ka).reshape(T, H, D)
        rh = r.reshape(T, H, D)
        wh = w.reshape(T, H, D)
        vh = v.reshape(T, H, D)
        a_in = -kk
        b_in = kk * a.reshape(T, H, D)

        # ggml RWKV_WKV7: state[i=value, j=key]
        S = np.zeros((H, D, D))
        out = np.zeros((T, H, D))
        for n in range(T):
            for h in range(H):
                sa = S[h] @ a_in[n, h]  # [i]
                S[h] = (S[h] * wh[n, h][None, :]
                        + np.outer(vh[n, h], k_f[n, h])
                        + np.outer(sa, b_in[n, h]))
                out[n, h] = S[h] @ rh[n, h]

        mu = out.mean(-1, keepdims=True)
        var = ((out - mu) ** 2).mean(-1, keepdims=True)
        o = (out - mu) / np.sqrt(var + GN_EPS)
        o = o.reshape(T, E) * t(p + "time_mix_ln.weight") + t(p + "time_mix_ln.bias")
        rk = (k_f * rh * t(p + "time_mix_r_k.weight").reshape(H, D)[None]).sum(-1)
        o = o + (vh * rk[..., None]).reshape(T, E)
        if g is not None:
            o = o * g
        x = x + o @ t(p + "time_mix_output.weight").T

        ffn_norm = ln(x, t(p + "attn_norm_2.weight"), t(p + "attn_norm_2.bias"))
        x_prev = np.concatenate([np.zeros((1, E)), ffn_norm[:-1]], axis=0)
        xk_c = ffn_norm + (x_prev - ffn_norm) * t(p + "channel_mix_lerp_k.weight").reshape(-1)
        key = np.square(np.maximum(xk_c @ t(p + "channel_mix_key.weight").T, 0.0))
        x = x + key @ t(p + "channel_mix_value.weight").T

    x = ln(x, t("output_norm.weight"), t("output_norm.bias"))
    return x @ t("output.weight").T


def test_rwkv7_forward_matches_numpy(tmp_path):
    path = make_tiny_rwkv7_gguf(tmp_path / "rwkv7.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_rwkv7_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_rwkv7_ungated_matches_numpy(tmp_path):
    path = make_tiny_rwkv7_gguf(tmp_path / "rwkv7u.gguf", gated=False)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("hello world", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_rwkv7_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_rwkv7_decode_matches_prefill(tmp_path):
    path = make_tiny_rwkv7_gguf(tmp_path / "rwkv7.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_arwkv7_generates_and_decode_matches_prefill(tmp_path):
    """arwkv7 = rwkv7 time-mix on a llama body (llm_build_arwkv7)."""
    from tpullm.models.testing import make_tiny_arwkv7_gguf

    path = make_tiny_arwkv7_gguf(tmp_path / "ar7.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)
