"""Qwen3-Next hybrid correctness vs an independent numpy reference
(≡ llm_build_qwen3next: gated DeltaNet linear layers + full attention with
fused per-head query gate, MoE + sigmoid-gated shared expert)."""

import numpy as np

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_qwen3next_gguf
from tpullm.runtime import Engine


def np_qwen3next_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    arch = "qwen3next"
    n_head = md[f"{arch}.attention.head_count"]
    kv_arr = list(md[f"{arch}.attention.head_count_kv"])
    n_embd = md[f"{arch}.embedding_length"]
    hd = md[f"{arch}.attention.key_length"]
    rope_dim = md[f"{arch}.rope.dimension_count"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    Dk = md[f"{arch}.ssm.state_size"]
    Hk = md[f"{arch}.ssm.group_count"]
    Hv = md[f"{arch}.ssm.time_step_rank"]
    D = md[f"{arch}.ssm.inner_size"]
    K = md[f"{arch}.ssm.conv_kernel"]
    n_used = md[f"{arch}.expert_used_count"]
    Dv = D // Hv
    r = Hv // Hk

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def silu(z):
        return z / (1 + np.exp(-z))

    def sigmoid(z):
        return 1 / (1 + np.exp(-z))

    def rope_neox(x, pos):
        # partial neox rotation over the first rope_dim dims of each head
        out = x.copy()
        half = rope_dim // 2
        inv = 10000.0 ** (-np.arange(half) * 2.0 / rope_dim)
        ang = pos[:, None] * inv[None, :]
        cos, sin = np.cos(ang), np.sin(ang)
        a = x[..., :half]
        b = x[..., half:rope_dim]
        out[..., :half] = a * cos[:, None, :] - b * sin[:, None, :]
        out[..., half:rope_dim] = a * sin[:, None, :] + b * cos[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T, dtype=np.float64)
    x = t("token_embd.weight")[tokens]
    for i, nkv in enumerate(kv_arr):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        if nkv == 0:  # gated DeltaNet linear attention
            qkv = h @ t(p + "attn_qkv.weight").T  # [T, 2*Hk*Dk + Hv*Dv]
            z = h @ t(p + "attn_gate.weight").T  # [T, D]
            ba = (h @ t(p + "ssm_ba.weight").T).reshape(T, Hk, 2 * r)
            beta = sigmoid(ba[:, :, :r].reshape(T, Hv))
            alpha = ba[:, :, r:].reshape(T, Hv)
            g = t(p + "ssm_a") * np.log1p(np.exp(alpha + t(p + "ssm_dt.bias")))
            cw = t(p + "ssm_conv1d.weight")  # [C, K]
            C = qkv.shape[-1]
            padded = np.concatenate([np.zeros((K - 1, C)), qkv], axis=0)
            conv = np.zeros((T, C))
            for kk in range(K):
                conv += padded[kk:kk + T] * cw[:, kk]
            mix = silu(conv)
            nqk = Hk * Dk
            q = mix[:, :nqk].reshape(T, Hk, Dk)
            k = mix[:, nqk:2 * nqk].reshape(T, Hk, Dk)
            v = mix[:, 2 * nqk:].reshape(T, Hv, Dv)
            q = np.repeat(q, r, axis=1)
            k = np.repeat(k, r, axis=1)
            q = q / np.sqrt((q * q).sum(-1, keepdims=True) + eps) / np.sqrt(Dv)
            k = k / np.sqrt((k * k).sum(-1, keepdims=True) + eps)
            S = np.zeros((Hv, Dv, Dk))
            out = np.zeros((T, Hv, Dv))
            for n in range(T):
                S = S * np.exp(g[n])[:, None, None]
                kv_mem = np.einsum("hvk,hk->hv", S, k[n])
                delta = (v[n] - kv_mem) * beta[n][:, None]
                S = S + delta[:, :, None] * k[n][:, None, :]
                out[n] = np.einsum("hvk,hk->hv", S, q[n])
            o = rms(out, t(p + "ssm_norm.weight"))
            o = o * silu(z.reshape(T, Hv, Dv))
            cur = o.reshape(T, D) @ t(p + "ssm_out.weight").T
        else:  # full attention, fused per-head [q|gate]
            qg = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, 2 * hd)
            q, gate = qg[..., :hd], qg[..., hd:]
            k = (h @ t(p + "attn_k.weight").T).reshape(T, nkv, hd)
            v = (h @ t(p + "attn_v.weight").T).reshape(T, nkv, hd)
            q = rms(q, t(p + "attn_q_norm.weight"))
            k = rms(k, t(p + "attn_k_norm.weight"))
            q = rope_neox(q, pos)
            k = rope_neox(k, pos)
            grp = n_head // nkv
            o = np.zeros((T, n_head, hd))
            for hh in range(n_head):
                kk, vv = k[:, hh // grp], v[:, hh // grp]
                scores = q[:, hh] @ kk.T / np.sqrt(hd)
                scores += np.triu(np.full((T, T), -np.inf), k=1)
                e = np.exp(scores - scores.max(-1, keepdims=True))
                o[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
            o = o * sigmoid(gate)
            cur = o.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        x = x + cur

        h = rms(x, t(p + "post_attention_norm.weight"))
        logits = h @ t(p + "ffn_gate_inp.weight").T
        pr = np.exp(logits - logits.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        order = np.argsort(-pr, axis=-1, kind="stable")[:, :n_used]
        gate_e = t(p + "ffn_gate_exps.weight")
        up_e = t(p + "ffn_up_exps.weight")
        down_e = t(p + "ffn_down_exps.weight")
        ffn = np.zeros_like(h)
        for n in range(T):
            wsel = pr[n, order[n]]
            wsel = wsel / wsel.sum()  # norm_topk_prob renormalization
            for j in range(n_used):
                e_i = order[n, j]
                ge = h[n] @ gate_e[e_i].T
                ue = h[n] @ up_e[e_i].T
                ffn[n] += wsel[j] * ((silu(ge) * ue) @ down_e[e_i].T)
        sh_g = h @ t(p + "ffn_gate_shexp.weight").T
        sh_u = h @ t(p + "ffn_up_shexp.weight").T
        sh = (silu(sh_g) * sh_u) @ t(p + "ffn_down_shexp.weight").T
        gsc = sigmoid(h @ t(p + "ffn_gate_inp_shexp.weight"))[:, None]
        x = x + ffn + sh * gsc

    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


def test_qwen3next_forward_matches_numpy(tmp_path):
    path = make_tiny_qwen3next_gguf(tmp_path / "q3n.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.n_head_kv_arr == (0, 0, 0, 2)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_qwen3next_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_qwen3next_decode_matches_prefill(tmp_path):
    path = make_tiny_qwen3next_gguf(tmp_path / "q3n.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    full = eng.prefill_all_logits(toks)
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, eng.batch, eng.max_seq, jnp.float32)
    eng.prefill(toks[:-1])
    last = eng.decode_step(toks[-1])
    np.testing.assert_allclose(last, full[-1], rtol=2e-3, atol=2e-3)
