"""Mamba (S6 SSM) correctness vs a sequential numpy reference
(≡ reference ggml SSM_CONV/SSM_SCAN ops + llm_build_mamba graph)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_mamba_gguf
from tpullm.runtime import Engine


def np_mamba_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["mamba.block_count"]
    eps = md["mamba.attention.layer_norm_rms_epsilon"]
    D = md["mamba.ssm.inner_size"]
    S = md["mamba.ssm.state_size"]
    R = md["mamba.ssm.time_step_rank"]
    K = md["mamba.ssm.conv_kernel"]

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def silu(x):
        return x / (1 + np.exp(-x))

    def softplus(x):
        return np.log1p(np.exp(x))

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        xz = h @ t(p + "ssm_in.weight").T  # [T, 2D]
        xin, z = xz[:, :D], xz[:, D:]
        # causal depthwise conv, zero initial state
        w_conv = t(p + "ssm_conv1d.weight")  # [D, K]
        full = np.concatenate([np.zeros((K - 1, D)), xin], axis=0)
        conv = np.zeros((T, D))
        for k in range(K):
            conv += full[k : k + T] * w_conv[:, k]
        conv += t(p + "ssm_conv1d.bias")
        xc = silu(conv)
        x_db = xc @ t(p + "ssm_x.weight").T
        dt = softplus(x_db[:, :R] @ t(p + "ssm_dt.weight").T + t(p + "ssm_dt.bias"))
        Bm, Cm = x_db[:, R : R + S], x_db[:, R + S :]
        A = t(p + "ssm_a")  # stored as -exp(A_log)
        hstate = np.zeros((D, S))
        y = np.zeros((T, D))
        for step in range(T):  # sequential reference scan
            a = np.exp(dt[step][:, None] * A)
            hstate = a * hstate + (dt[step] * xc[step])[:, None] * Bm[step][None, :]
            y[step] = hstate @ Cm[step]
        y += xc * t(p + "ssm_d")
        y *= silu(z)
        x = x + y @ t(p + "ssm_out.weight").T
    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


@pytest.fixture(scope="module")
def mamba_model(tmp_path_factory):
    return make_tiny_mamba_gguf(tmp_path_factory.mktemp("mamba") / "m.gguf")


def test_mamba_forward_matches_numpy(mamba_model):
    eng = Engine(mamba_model, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_mamba_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_mamba_decode_matches_prefill(mamba_model):
    """Associative-scan prefill state == step-by-step decode state."""
    eng = Engine(mamba_model, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    all_logits = eng.prefill_all_logits(toks)

    eng2 = Engine(mamba_model, mode="dense", dtype=jnp.float32, max_seq=64)
    logits = None
    for t in toks:
        logits = eng2.decode_step(t)
    np.testing.assert_allclose(logits, all_logits[-1], rtol=2e-3, atol=2e-3)


def test_mamba_generation_runs(mamba_model):
    eng = Engine(mamba_model, mode="dense", max_seq=64)
    out = eng.generate("the quick", max_new_tokens=8)
    assert isinstance(out, str)


def test_mamba_long_state_carry(mamba_model):
    """Two prefills == one combined prefill (state carried across calls)."""
    eng = Engine(mamba_model, mode="dense", dtype=jnp.float32, max_seq=64)
    a = eng.tokenizer.tokenize("the quick brown", add_special=True)
    b = eng.tokenizer.tokenize(" fox jumps", add_special=False)
    eng.prefill(a)
    l2 = eng.prefill(b)

    eng2 = Engine(mamba_model, mode="dense", dtype=jnp.float32, max_seq=64)
    l_ref = eng2.prefill(a + b)
    np.testing.assert_allclose(l2, l_ref, rtol=2e-3, atol=2e-3)


# -- mamba2 (SSD) ------------------------------------------------------------


def np_mamba2_forward(reader, tokens):
    md = reader.metadata
    n_layer = md["mamba2.block_count"]
    D = md["mamba2.ssm.inner_size"]
    S = md["mamba2.ssm.state_size"]
    K = md["mamba2.ssm.conv_kernel"]
    H = md["mamba2.ssm.time_step_rank"]
    G = md["mamba2.ssm.group_count"]
    eps = md["mamba2.attention.layer_norm_rms_epsilon"]
    hd = D // H
    conv_w = D + 2 * G * S

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def softplus(v):
        return np.log1p(np.exp(v))

    def silu(v):
        return v / (1 + np.exp(-v))

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        zxbcdt = h @ t(p + "ssm_in.weight").T
        z = zxbcdt[:, :D]
        xBC = zxbcdt[:, D:D + conv_w]
        dt_raw = zxbcdt[:, D + conv_w:]
        # causal depthwise conv over the xBC stream
        cw = t(p + "ssm_conv1d.weight")
        cb = t(p + "ssm_conv1d.bias")
        padded = np.concatenate([np.zeros((K - 1, conv_w)), xBC], axis=0)
        conv = np.zeros((T, conv_w))
        for k in range(K):
            conv += padded[k:k + T] * cw[:, k]
        xBC = silu(conv + cb)
        xin = xBC[:, :D].reshape(T, H, hd)
        Bm = xBC[:, D:D + G * S].reshape(T, G, S)
        Cm = xBC[:, D + G * S:].reshape(T, G, S)
        dt = softplus(dt_raw + t(p + "ssm_dt.bias"))
        A = t(p + "ssm_a")  # stored as -exp(A_log)
        hstate = np.zeros((H, hd, S))
        y = np.zeros((T, H, hd))
        reps = H // G
        for n in range(T):
            for hh in range(H):
                g = hh // reps
                a = np.exp(dt[n, hh] * A[hh])
                hstate[hh] = a * hstate[hh] + dt[n, hh] * np.outer(xin[n, hh], Bm[n, g])
                y[n, hh] = hstate[hh] @ Cm[n, g]
        y = y + xin * t(p + "ssm_d")[None, :, None]
        y = y.reshape(T, D) * silu(z)
        yg = y.reshape(T, G, D // G)
        wg = t(p + "ssm_norm.weight").reshape(G, D // G)
        yg = yg / np.sqrt((yg * yg).mean(-1, keepdims=True) + eps) * wg[None]
        y = yg.reshape(T, D)
        x = x + y @ t(p + "ssm_out.weight").T
    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


def test_mamba2_forward_matches_numpy(tmp_path):
    from tpullm.models.testing import make_tiny_mamba2_gguf

    path = make_tiny_mamba2_gguf(tmp_path / "m2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_mamba2_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_mamba2_decode_matches_prefill(tmp_path):
    from tpullm.models.testing import make_tiny_mamba2_gguf

    path = make_tiny_mamba2_gguf(tmp_path / "m2.gguf")
    toks = None
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    eng.reset()
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)
