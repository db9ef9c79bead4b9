"""Jamba hybrid correctness vs an independent numpy reference
(≡ llm_build_jamba: interleaved mamba/attention layers, dense/MoE FFN)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_jamba_gguf
from tpullm.runtime import Engine


def np_jamba_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = "jamba"
    n_head = md[f"{arch}.attention.head_count"]
    kv_arr = list(md[f"{arch}.attention.head_count_kv"])
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    D = md[f"{arch}.ssm.inner_size"]
    S = md[f"{arch}.ssm.state_size"]
    K = md[f"{arch}.ssm.conv_kernel"]
    R = md[f"{arch}.ssm.time_step_rank"]
    n_used = md[f"{arch}.expert_used_count"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def silu(z):
        return z / (1 + np.exp(-z))

    T = len(tokens)
    x = t("token_embd.weight")[tokens]
    for i, nkv in enumerate(kv_arr):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        if nkv == 0:  # mamba layer with dt/B/C norms
            xz = h @ t(p + "ssm_in.weight").T
            xin, z = xz[:, :D], xz[:, D:]
            cw, cb = t(p + "ssm_conv1d.weight"), t(p + "ssm_conv1d.bias")
            padded = np.concatenate([np.zeros((K - 1, D)), xin], axis=0)
            conv = np.zeros((T, D))
            for k in range(K):
                conv += padded[k:k + T] * cw[:, k]
            xc = silu(conv + cb)
            x_db = xc @ t(p + "ssm_x.weight").T
            dtr = rms(x_db[:, :R], t(p + "ssm_dt_norm.weight"))
            Bm = rms(x_db[:, R:R + S], t(p + "ssm_b_norm.weight"))
            Cm = rms(x_db[:, R + S:], t(p + "ssm_c_norm.weight"))
            dt = np.log1p(np.exp(dtr @ t(p + "ssm_dt.weight").T + t(p + "ssm_dt.bias")))
            A = t(p + "ssm_a")  # stored as -exp(A_log)
            hstate = np.zeros((D, S))
            y = np.zeros((T, D))
            for n in range(T):
                hstate = np.exp(dt[n][:, None] * A) * hstate \
                    + (dt[n] * xc[n])[:, None] * Bm[n][None, :]
                y[n] = hstate @ Cm[n]
            y = y + xc * t(p + "ssm_d")
            y = y * silu(z)
            out = y @ t(p + "ssm_out.weight").T
        else:
            q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
            k = (h @ t(p + "attn_k.weight").T).reshape(T, nkv, hd)
            v = (h @ t(p + "attn_v.weight").T).reshape(T, nkv, hd)
            g = n_head // nkv
            o = np.zeros((T, n_head, hd))
            for hh in range(n_head):
                kk, vv = k[:, hh // g], v[:, hh // g]
                scores = q[:, hh] @ kk.T / np.sqrt(hd)
                scores += np.triu(np.full((T, T), -np.inf), k=1)
                e = np.exp(scores - scores.max(-1, keepdims=True))
                o[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
            out = o.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        x = x + out

        h = rms(x, t(p + "ffn_norm.weight"))
        if p + "ffn_gate_inp.weight" in reader.tensors:
            logits = h @ t(p + "ffn_gate_inp.weight").T
            pr = np.exp(logits - logits.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            order = np.argsort(-pr, axis=-1, kind="stable")[:, :n_used]
            gate_e = t(p + "ffn_gate_exps.weight")
            up_e = t(p + "ffn_up_exps.weight")
            down_e = t(p + "ffn_down_exps.weight")
            ffn = np.zeros_like(h)
            for n in range(T):
                for j in range(n_used):
                    e_i = order[n, j]
                    ge = h[n] @ gate_e[e_i].T
                    ue = h[n] @ up_e[e_i].T
                    ffn[n] += pr[n, e_i] * ((silu(ge) * ue) @ down_e[e_i].T)
        else:
            gate = h @ t(p + "ffn_gate.weight").T
            up = h @ t(p + "ffn_up.weight").T
            ffn = (silu(gate) * up) @ t(p + "ffn_down.weight").T
        x = x + ffn

    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


def test_jamba_forward_matches_numpy(tmp_path):
    path = make_tiny_jamba_gguf(tmp_path / "jamba.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_head_kv_arr == (0, 2, 0, 2)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_jamba_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# slow: long decode-vs-prefill sweep; the jamba forward/state tests
# stay fast
@pytest.mark.slow
def test_jamba_decode_matches_prefill(tmp_path):
    path = make_tiny_jamba_gguf(tmp_path / "jamba.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_nemotron_h_generates_and_decode_matches_prefill(tmp_path):
    """nemotron_h: one block per layer (mamba2 | attention | ReLU² FFN)."""
    from tpullm.models.testing import make_tiny_hybrid2_gguf

    path = make_tiny_hybrid2_gguf(tmp_path / "nh.gguf", arch="nemotron_h")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_granitehybrid_multipliers_and_decode(tmp_path):
    from tpullm.models.testing import make_tiny_hybrid2_gguf

    path = make_tiny_hybrid2_gguf(tmp_path / "gh.gguf", arch="granitehybrid")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.residual_scale == 0.5 and eng.hp.logit_scale == 4.0
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_lfm2_generates_and_decode_matches_prefill(tmp_path):
    """lfm2: gated shortconv + attention hybrid (llm_build_lfm2)."""
    from tpullm.models.testing import make_tiny_lfm2_gguf

    path = make_tiny_lfm2_gguf(tmp_path / "lfm2.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_nemotron_h_moe_generates_and_decode_matches_prefill(tmp_path):
    """nemotron_h_moe: FFN slots become sigmoid-routed gateless ReLU²
    experts with selection bias + a gateless ReLU² shared expert."""
    from tpullm.models.testing import make_tiny_hybrid2_gguf

    path = make_tiny_hybrid2_gguf(tmp_path / "nhm.gguf", arch="nemotron_h_moe")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.expert_gating_func == "sigmoid"
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)


def test_falcon_h1_parallel_hybrid(tmp_path):
    """falcon-h1: attention + mamba2 run in parallel on every layer."""
    from tpullm.models.testing import make_tiny_falcon_h1_gguf

    path = make_tiny_falcon_h1_gguf(tmp_path / "fh1.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.rope.style == "neox"
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    full = eng.prefill_all_logits(toks)
    assert np.isfinite(full).all()
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)
