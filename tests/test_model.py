"""Model correctness: JAX llama forward vs an independent numpy reference,
prefill/decode consistency, quantized and tied-embedding variants, generation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGMLType, GGUFReader
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.runtime import Engine, Sampler, SamplerParams


# ---------------------------------------------------------------------------
# independent numpy reference implementation (second opinion on the math)
# ---------------------------------------------------------------------------

def np_forward(reader: GGUFReader, tokens: np.ndarray) -> np.ndarray:
    md = reader.metadata
    arch = md["general.architecture"]
    n_layer = md[f"{arch}.block_count"]
    n_head = md[f"{arch}.attention.head_count"]
    n_head_kv = md[f"{arch}.attention.head_count_kv"]
    n_embd = md[f"{arch}.embedding_length"]
    eps = md[f"{arch}.attention.layer_norm_rms_epsilon"]
    base = md[f"{arch}.rope.freq_base"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope(x, pos):  # x: [T, H, D], "norm" style: adjacent pairs
        T, H, D = x.shape
        out = x.copy()
        inv = base ** (-np.arange(0, D // 2) * 2.0 / D)
        theta = pos[:, None] * inv  # [T, D/2]
        c, s = np.cos(theta), np.sin(theta)
        x0, x1 = x[..., 0::2], x[..., 1::2]
        out[..., 0::2] = x0 * c[:, None, :] - x1 * s[:, None, :]
        out[..., 1::2] = x0 * s[:, None, :] + x1 * c[:, None, :]
        return out

    T = len(tokens)
    pos = np.arange(T)
    x = t("token_embd.weight")[tokens]  # [T, E]
    for i in range(n_layer):
        p = f"blk.{i}."
        h = rms(x, t(p + "attn_norm.weight"))
        q = (h @ t(p + "attn_q.weight").T).reshape(T, n_head, hd)
        k = (h @ t(p + "attn_k.weight").T).reshape(T, n_head_kv, hd)
        v = (h @ t(p + "attn_v.weight").T).reshape(T, n_head_kv, hd)
        q, k = rope(q, pos), rope(k, pos)
        g = n_head // n_head_kv
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            kk, vv = k[:, hh // g], v[:, hh // g]
            scores = q[:, hh] @ kk.T / np.sqrt(hd)
            scores += np.triu(np.full((T, T), -np.inf), k=1)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ vv
        x = x + out.reshape(T, n_embd) @ t(p + "attn_output.weight").T
        h = rms(x, t(p + "ffn_norm.weight"))
        gate = h @ t(p + "ffn_gate.weight").T
        up = h @ t(p + "ffn_up.weight").T
        act = gate / (1 + np.exp(-gate)) * up
        x = x + act @ t(p + "ffn_down.weight").T
    x = rms(x, t("output_norm.weight"))
    if "output.weight" in reader.tensors:
        return x @ t("output.weight").T
    return x @ t("token_embd.weight").T


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    return make_tiny_llama_gguf(path)


def test_forward_matches_numpy_reference(tiny_model):
    eng = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=128, kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    ref = np_forward(eng.reader, np.asarray(toks))
    got = eng.prefill(toks)
    np.testing.assert_allclose(got, ref[-1], rtol=2e-4, atol=2e-4)


def test_prefill_decode_consistency(tiny_model):
    eng = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=128, kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("hello world the", add_special=True)
    full = eng.prefill(toks)

    eng2 = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=128, kv_dtype=jnp.float32)
    eng2.prefill(toks[:-1])
    step = eng2.decode_step(toks[-1])
    np.testing.assert_allclose(full, step, rtol=2e-4, atol=2e-4)


def test_multi_step_decode_matches_prefill(tiny_model):
    eng = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=128, kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("the quick brown fox jumps over", add_special=True)
    split = 3
    eng.prefill(toks[:split])
    for t in toks[split:-1]:
        eng.decode_step(t)
    step = eng.decode_step(toks[-1])

    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, 1, 128, eng.kv_dtype)
    full = eng.prefill(toks)
    np.testing.assert_allclose(full, step, rtol=5e-4, atol=5e-4)


def test_tied_embeddings(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "tied.gguf", tie_embeddings=True)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64, kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("hello", add_special=True)
    ref = np_forward(eng.reader, np.asarray(toks))
    got = eng.prefill(toks)
    np.testing.assert_allclose(got, ref[-1], rtol=2e-4, atol=2e-4)


def test_quantized_weights_close_to_f32(tmp_path):
    kw = dict(n_embd=256, n_head=4, n_head_kv=2, n_ff=256, n_layer=2, seed=3)
    p32 = make_tiny_llama_gguf(tmp_path / "f32.gguf", weight_type=GGMLType.F32, **kw)
    pq = make_tiny_llama_gguf(tmp_path / "q4k.gguf", weight_type=GGMLType.Q4_K, **kw)
    e32 = Engine(p32, mode="dense", dtype=jnp.float32, max_seq=64, kv_dtype=jnp.float32)
    eq = Engine(pq, mode="quant", dtype=jnp.float32, max_seq=64)
    toks = e32.tokenizer.tokenize("the quick brown", add_special=True)
    l32 = e32.prefill(toks)
    lq = eq.prefill(toks)
    # 4-bit quantization noise bounded: logits correlate strongly
    cos = np.dot(l32, lq) / (np.linalg.norm(l32) * np.linalg.norm(lq))
    assert cos > 0.95, f"Q4_K cosine {cos}"

    p8 = make_tiny_llama_gguf(tmp_path / "q8.gguf", weight_type=GGMLType.Q8_0, **kw)
    e8 = Engine(p8, mode="quant", dtype=jnp.float32, max_seq=64, kv_dtype=jnp.float32)
    l8 = e8.prefill(toks)
    cos8 = np.dot(l32, l8) / (np.linalg.norm(l32) * np.linalg.norm(l8))
    assert cos8 > 0.999, f"Q8_0 cosine {cos8}"


def test_greedy_generation_deterministic(tiny_model):
    eng = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=128, kv_dtype=jnp.float32)
    ids = eng.tokenizer.tokenize("the quick", add_special=True)
    out1 = list(eng.generate_tokens(ids, max_new_tokens=8))
    eng.reset()
    eng.cache = type(eng.cache).new(eng.hp, 1, 128, eng.kv_dtype)
    out2 = list(eng.generate_tokens(ids, max_new_tokens=8))
    assert out1 == out2
    assert len(out1) > 0


def test_yarn_rope_runs(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "yarn.gguf", rope_scaling="yarn")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64, kv_dtype=jnp.float32)
    toks = eng.tokenizer.tokenize("hello world", add_special=True)
    logits = eng.prefill(toks)
    assert np.isfinite(logits).all()


def test_sampler_top_p_top_k():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=1000).astype(np.float32)
    s = Sampler(SamplerParams(temp=1.0, top_k=10, top_p=0.9, seed=7))
    picks = {s.sample(logits) for _ in range(50)}
    top10 = set(np.argsort(-logits)[:10])
    assert picks <= top10
    # greedy
    g = Sampler(SamplerParams(temp=0.0))
    assert g.sample(logits) == int(np.argmax(logits))


def test_repetition_penalty():
    logits = np.ones(10, dtype=np.float32)
    logits[3] = 5.0
    s = Sampler(SamplerParams(temp=0.0, penalty_repeat=1000.0, penalty_last_n=8))
    assert s.sample(logits) == 3
    s.accept(3)
    assert s.sample(logits) != 3


# slow: end-to-end q8-KV-vs-dense sweep; the flash_q8 kernel parity
# test covers the numerics in the fast suite
@pytest.mark.slow
def test_q8_kv_cache_close_to_dense(tiny_model):
    """Q8_0-quantized KV cache (≡ -ctk q8_0, the fork's headline config):
    logits stay close to the bf16-cache path, decode matches prefill."""
    import jax.numpy as jnp

    from tpullm.runtime.kvcache import QuantKVCache

    eng_f = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=64,
                   kv_dtype=jnp.float32)
    eng_q = Engine(tiny_model, mode="dense", dtype=jnp.float32, max_seq=64,
                   kv_dtype="q8_0")
    assert isinstance(eng_q.cache, QuantKVCache)
    toks = eng_f.tokenizer.tokenize("the quick brown fox jumps", add_special=True)
    lf = eng_f.prefill_all_logits(toks)
    lq = eng_q.prefill_all_logits(toks)
    # int8 KV costs well under 1% relative error on logits
    np.testing.assert_allclose(lq, lf, rtol=0.05, atol=0.05)

    # greedy generations agree for a few steps
    eng_f2 = Engine(tiny_model, mode="dense", max_seq=64)
    eng_q2 = Engine(tiny_model, mode="dense", max_seq=64, kv_dtype="q8_0")
    ids = eng_f2.tokenizer.tokenize("the quick", add_special=True)
    out_f = list(eng_f2.generate_tokens(ids, 8, stop_on_eog=False))
    out_q = list(eng_q2.generate_tokens(ids, 8, stop_on_eog=False))
    assert out_f == out_q


def test_q8_kv_batch_engine(tiny_model):
    from tpullm.runtime.batch_engine import BatchEngine

    eng = BatchEngine(tiny_model, n_slots=2, max_seq=64, mode="dense",
                      kv_dtype="q8_0", prefill_chunk=32)
    toks = eng.tokenizer.tokenize("hello world", add_special=True)
    l0 = eng.prefill_slot(0, toks)
    l1 = eng.prefill_slot(1, toks)
    np.testing.assert_allclose(l0, l1, rtol=2e-2, atol=2e-2)
    out = eng.decode_batch({0: 7, 1: 7})
    np.testing.assert_allclose(out[0], out[1], rtol=2e-2, atol=2e-2)


def test_self_extend_group_attention(tmp_path):
    """Self-extend (≡ passkey --grp-attn-n): rope positions compress to
    slot//G while cache slots and the causal mask stay dense, so logits
    with G=2 equal a manual forward at positions//2."""
    import jax.numpy as jnp
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime import Engine

    path = make_tiny_llama_gguf(tmp_path / "m.gguf")
    toks = list(range(3, 19))

    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32, grp_attn_n=2)
    got = eng.prefill_all_logits(toks)

    # manual reference: same forward with explicitly halved positions
    ref_eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                     kv_dtype=jnp.float32)
    n = len(toks)
    bucket = ref_eng._bucket(n)
    toks_a = np.zeros((1, bucket), dtype=np.int32)
    toks_a[0, :n] = toks
    pos = (np.arange(bucket, dtype=np.int32) // 2)[None]
    logits, _ = ref_eng._step(
        ref_eng.params, jnp.asarray(toks_a), jnp.asarray(pos), ref_eng.cache,
        jnp.int32(0),
    )
    ref = np.asarray(logits[0, :n])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # decode continues the compressed position stream
    last = eng.decode_step(5)
    assert np.isfinite(last).all()
