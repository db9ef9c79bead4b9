"""DeepSeek2 (MLA + bias-gated MoE) vs numpy reference
(≡ reference src/models/deepseek2.cpp non-absorbed branch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_deepseek2_gguf
from tpullm.runtime import Engine


def np_ds2_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    g = lambda k: md[f"deepseek2.{k}"]
    n_layer = g("block_count")
    H = g("attention.head_count")
    E = g("embedding_length")
    eps = g("attention.layer_norm_rms_epsilon")
    base = g("rope.freq_base")
    dk = g("attention.key_length")
    dv = g("attention.value_length")
    n_rot = g("rope.dimension_count")
    n_nope = dk - n_rot
    kvr = g("attention.kv_lora_rank")
    n_dense = g("leading_dense_block_count")
    n_used = g("expert_used_count")
    w_scale = g("expert_weights_scale")

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def silu(x):
        return x / (1 + np.exp(-x))

    def rope_norm(x, pos):  # interleaved pairs over full last dim
        T, Hh, D = x.shape
        inv = base ** (-np.arange(0, D // 2) * 2.0 / D)
        theta = pos[:, None] * inv
        c, s = np.cos(theta), np.sin(theta)
        out = x.copy()
        x0, x1 = x[..., 0::2], x[..., 1::2]
        out[..., 0::2] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., 1::2] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        qa = rms(h @ t(p + "attn_q_a.weight").T, t(p + "attn_q_a_norm.weight"))
        q = (qa @ t(p + "attn_q_b.weight").T).reshape(T, H, dk)
        q_nope, q_pe = q[..., :n_nope], q[..., n_nope:]
        q_pe = rope_norm(q_pe, pos)

        kv_pe = h @ t(p + "attn_kv_a_mqa.weight").T
        kv_cmpr = rms(kv_pe[:, :kvr], t(p + "attn_kv_a_norm.weight"))
        k_pe = rope_norm(kv_pe[:, kvr:].reshape(T, 1, n_rot), pos)

        kv = (kv_cmpr @ t(p + "attn_kv_b.weight").T).reshape(T, H, n_nope + dv)
        k_nope, v = kv[..., :n_nope], kv[..., n_nope:]

        qf = np.concatenate([q_nope, q_pe], axis=-1)
        kf = np.concatenate([k_nope, np.broadcast_to(k_pe, (T, H, n_rot))], axis=-1)

        out = np.zeros((T, H, dv))
        for hh in range(H):
            scores = qf[:, hh] @ kf[:, hh].T / np.sqrt(dk)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ v[:, hh]
        x = x + out.reshape(T, H * dv) @ t(p + "attn_output.weight").T

        h = rms(x, t(p + "ffn_norm.weight"))
        if i < n_dense:
            gate = h @ t(p + "ffn_gate.weight").T
            up = h @ t(p + "ffn_up.weight").T
            x = x + (silu(gate) * up) @ t(p + "ffn_down.weight").T
        else:
            logits = h @ t(p + "ffn_gate_inp.weight").T
            probs = 1 / (1 + np.exp(-logits))  # sigmoid gating
            bias = t(p + "exp_probs_b.bias")
            sel = np.argsort(-(probs + bias), axis=-1, kind="stable")[:, :n_used]
            moe = np.zeros_like(h)
            for n in range(T):
                ws = probs[n, sel[n]]
                ws = ws / ws.sum()  # expert_weights_norm
                ws = ws * w_scale
                for j, ex in enumerate(sel[n]):
                    gg = h[n] @ t(p + "ffn_gate_exps.weight")[ex].T
                    uu = h[n] @ t(p + "ffn_up_exps.weight")[ex].T
                    moe[n] += ws[j] * ((silu(gg) * uu) @ t(p + "ffn_down_exps.weight")[ex].T)
            gsh = h @ t(p + "ffn_gate_shexp.weight").T
            ush = h @ t(p + "ffn_up_shexp.weight").T
            sh = (silu(gsh) * ush) @ t(p + "ffn_down_shexp.weight").T
            x = x + moe + sh
    x = rms(x, t("output_norm.weight"))
    return x @ t("output.weight").T


@pytest.fixture(scope="module")
def ds2_model(tmp_path_factory):
    return make_tiny_deepseek2_gguf(tmp_path_factory.mktemp("ds2") / "ds2.gguf")


def test_deepseek2_forward_matches_numpy(ds2_model):
    eng = Engine(ds2_model, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    got = eng.prefill_all_logits(toks)
    ref = np_ds2_forward(eng.reader, np.asarray(toks))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_deepseek2_decode_matches_prefill(ds2_model):
    eng = Engine(ds2_model, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown", add_special=True)
    all_logits = eng.prefill_all_logits(toks)
    eng2 = Engine(ds2_model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    eng2.prefill(toks[:-1])
    last = eng2.decode_step(toks[-1])
    np.testing.assert_allclose(last, all_logits[-1], rtol=2e-3, atol=2e-3)


def test_deepseek2_generation_runs(ds2_model):
    eng = Engine(ds2_model, mode="dense", max_seq=64)
    assert isinstance(eng.generate("the quick", max_new_tokens=6), str)


def test_mla_absorbed_matches_decompressed(ds2_model, monkeypatch):
    """The absorbed-latent MQA path (MLACache, reference is_mla=true) must
    produce the decompressed-MHA oracle's logits (is_mla=false): absorption
    only reassociates the wkv_b matmuls."""
    from tpullm.runtime.kvcache import KVCache, MLACache

    eng = Engine(ds2_model, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert isinstance(eng.cache, MLACache)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    absorbed = eng.prefill(toks)
    step_abs = eng.decode_step(int(np.argmax(absorbed)))

    monkeypatch.setenv("TPULLM_MLA", "0")
    ref = Engine(ds2_model, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert isinstance(ref.cache, KVCache)
    oracle = ref.prefill(toks)
    step_ref = ref.decode_step(int(np.argmax(oracle)))
    np.testing.assert_allclose(absorbed, oracle, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(step_abs, step_ref, rtol=2e-3, atol=2e-3)


def test_mla_cache_stores_latent_width(ds2_model, monkeypatch):
    """KV bytes: the absorbed cache holds kvr+n_rot floats per token-layer
    vs the decompressed cache's n_head·(Dk+Dv) — the reference's MLA memory
    win (llama-kv-cache.cpp:138 caches the latent)."""
    eng = Engine(ds2_model, mode="dense", max_seq=64)
    hp = eng.hp
    latent = hp.n_lora_kv + hp.rope.dims
    assert eng.cache.c.shape[2:] == (1, 64, latent)
    abs_bytes = eng.cache.c.size * eng.cache.c.dtype.itemsize

    monkeypatch.setenv("TPULLM_MLA", "0")
    ref = Engine(ds2_model, mode="dense", max_seq=64)
    ref_bytes = (ref.cache.k.size * ref.cache.k.dtype.itemsize
                 + ref.cache.v.size * ref.cache.v.dtype.itemsize)
    dk = hp.head_dim_k_mla or hp.head_dim
    dv = hp.head_dim_v_mla or hp.head_dim_v
    assert ref_bytes / abs_bytes == pytest.approx(
        hp.n_head * (dk + dv) / latent)


def test_minicpm3_rides_mla_graph(tmp_path):
    """minicpm3 = deepseek2's MLA graph + minicpm multipliers
    (llm_build_minicpm3: scale_embd=12, scale_depth residuals, scaled head)."""
    from tpullm.models.testing import make_tiny_deepseek2_gguf

    path = make_tiny_deepseek2_gguf(tmp_path / "m3.gguf", arch="minicpm3",
                                    n_dense_lead=10**6)  # all layers dense
    eng = Engine(path, mode="dense", max_seq=64)
    assert eng.hp.embd_scale == 12.0
    assert abs(eng.hp.logit_scale - 256.0 / eng.hp.n_embd) < 1e-9
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)
