"""T5 encoder-decoder correctness vs an independent numpy reference
(≡ llm_build_t5_enc / llm_build_t5_dec, src/models/t5-{enc,dec}.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_t5_gguf
from tpullm.runtime import Engine


def _rel_bucket(rel, n_buckets, bidirectional):
    # llama_relative_position_bucket (llama-graph.cpp:2601)
    max_distance = 128
    nb = n_buckets // 2 if bidirectional else n_buckets
    out = 0
    if bidirectional:
        out += (rel > 0) * nb
        rel = abs(rel)
    else:
        rel = -min(rel, 0)
    max_exact = nb // 2
    if rel < max_exact:
        return out + rel
    large = int(max_exact + np.floor(
        np.log(rel / max_exact) * (nb - max_exact) / np.log(max_distance / max_exact)))
    return out + min(large, nb - 1)


def np_t5(reader: GGUFReader, enc_tokens, dec_tokens):
    md = reader.metadata
    n_layer = md["t5.block_count"]
    n_head = md["t5.attention.head_count"]
    n_embd = md["t5.embedding_length"]
    eps = md["t5.attention.layer_norm_rms_epsilon"]
    nb = md["t5.attention.relative_buckets_count"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def gelu(z):
        from scipy.special import erf
        return 0.5 * z * (1 + erf(z / np.sqrt(2)))

    def attn(q, k, v, bias, causal):
        # kq_scale = 1.0 (T5)
        T, S = q.shape[0], k.shape[0]
        out = np.zeros((T, n_head, hd))
        for h in range(n_head):
            scores = q[:, h] @ k[:, h].T
            if bias is not None:
                scores = scores + bias[h]
            if causal:
                scores += np.triu(np.full((T, S), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, h] = (e / e.sum(-1, keepdims=True)) @ v[:, h]
        return out.reshape(T, n_embd)

    def bias_table(rel_b, qpos, kpos, bidir):
        # HF convention: bucket(memory_pos - context_pos) = bucket(k - q)
        b = np.zeros((n_head, len(qpos), len(kpos)))
        for i, qp in enumerate(qpos):
            for j, kp in enumerate(kpos):
                b[:, i, j] = rel_b[_rel_bucket(kp - qp, nb, bidir)]
        return b

    def ffn(prefix, x):
        h = rms(x, t(prefix + "ffn_norm.weight"))
        up = h @ t(prefix + "ffn_up.weight").T
        if prefix + "ffn_gate.weight" in reader.tensors:
            act = gelu(h @ t(prefix + "ffn_gate.weight").T) * up
        else:
            act = np.maximum(up, 0.0)
        return x + act @ t(prefix + "ffn_down.weight").T

    emb = t("token_embd.weight")
    # encoder
    S = len(enc_tokens)
    x = emb[enc_tokens]
    rel0 = t("enc.blk.0.attn_rel_b.weight")
    epos = np.arange(S)
    for i in range(n_layer):
        p = f"enc.blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        q = (h @ t(p + "attn_q.weight").T).reshape(S, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(S, n_head, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(S, n_head, hd)
        bias = bias_table(rel0, epos, epos, True)
        x = x + attn(q, k, v, bias, causal=False) @ t(p + "attn_o.weight").T
        x = ffn(p, x)
    enc = rms(x, t("enc.output_norm.weight"))

    # decoder
    T = len(dec_tokens)
    x = emb[dec_tokens]
    drel0 = t("dec.blk.0.attn_rel_b.weight")
    dpos = np.arange(T)
    for i in range(n_layer):
        p = f"dec.blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head, hd)
        bias = bias_table(drel0, dpos, dpos, False)
        x = x + attn(q, k, v, bias, causal=True) @ t(p + "attn_o.weight").T
        h = rms(x, t(p + "cross_attn_norm.weight"))
        qc = (h @ t(p + "cross_attn_q.weight").T).reshape(T, n_head, hd)
        kc = (enc @ t(p + "cross_attn_k.weight").T).reshape(S, n_head, hd)
        vc = (enc @ t(p + "cross_attn_v.weight").T).reshape(S, n_head, hd)
        x = x + attn(qc, kc, vc, None, causal=False) @ t(p + "cross_attn_o.weight").T
        x = ffn(p, x)
    x = rms(x, t("dec.output_norm.weight"))
    return x @ t("output.weight").T


@pytest.mark.parametrize("gated", [True, False])
def test_t5_enc_dec_matches_numpy(tmp_path, gated):
    path = make_tiny_t5_gguf(tmp_path / "t5.gguf", gated=gated)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    enc_toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    # engine: encode + decoder steps over [start=1, a, b]
    logits0 = eng.prefill(enc_toks)
    a, b = 5, 9
    logits1 = eng.decode_step(a)
    logits2 = eng.decode_step(b)

    ref = np_t5(eng.reader, np.asarray(enc_toks), np.asarray([1, a, b]))
    np.testing.assert_allclose(logits0, ref[0], rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(logits1, ref[1], rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(logits2, ref[2], rtol=5e-3, atol=5e-3)


def test_t5_generate_runs(tmp_path):
    path = make_tiny_t5_gguf(tmp_path / "t5.gguf")
    eng = Engine(path, mode="dense", max_seq=64)
    out = eng.generate("translate: hello", max_new_tokens=6)
    assert isinstance(out, str)


def test_t5encoder_embeddings(tmp_path):
    path = make_tiny_t5_gguf(tmp_path / "t5e.gguf", arch="t5encoder")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    emb = eng.embed("hello world", pooling="mean")
    assert emb.shape == (eng.hp.n_embd,)
    assert np.isfinite(emb).all()
