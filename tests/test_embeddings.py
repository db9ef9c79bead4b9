"""Embeddings: BERT encoder vs numpy reference, pooling, causal-model
embeddings, server endpoints (≡ reference test_embedding.py + llm_build_bert)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models.testing import make_tiny_bert_gguf, make_tiny_llama_gguf
from tpullm.runtime import Engine


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def np_bert_forward(reader: GGUFReader, tokens):
    md = reader.metadata
    n_layer = md["bert.block_count"]
    n_head = md["bert.attention.head_count"]
    n_embd = md["bert.embedding_length"]
    eps = md["bert.attention.layer_norm_epsilon"]
    hd = n_embd // n_head

    def t(name):
        return reader.tensors[name].to_numpy().astype(np.float64)

    T = len(tokens)
    x = t("token_embd.weight")[tokens] + t("position_embd.weight")[:T]
    x = x + t("token_types.weight")[0]
    x = _ln(x, t("token_embd_norm.weight"), t("token_embd_norm.bias"), eps)
    for i in range(n_layer):
        p = f"blk.{i}."
        q = (x @ t(p + "attn_q.weight").T + t(p + "attn_q.bias")).reshape(T, n_head, hd)
        k = (x @ t(p + "attn_k.weight").T + t(p + "attn_k.bias")).reshape(T, n_head, hd)
        v = (x @ t(p + "attn_v.weight").T + t(p + "attn_v.bias")).reshape(T, n_head, hd)
        out = np.zeros((T, n_head, hd))
        for hh in range(n_head):
            scores = q[:, hh] @ k[:, hh].T / np.sqrt(hd)  # bidirectional
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out[:, hh] = (e / e.sum(-1, keepdims=True)) @ v[:, hh]
        attn = out.reshape(T, n_embd) @ t(p + "attn_output.weight").T + t(p + "attn_output.bias")
        x = _ln(x + attn, t(p + "attn_output_norm.weight"),
                t(p + "attn_output_norm.bias"), eps)
        up = x @ t(p + "ffn_up.weight").T + t(p + "ffn_up.bias")
        down = _gelu_tanh(up) @ t(p + "ffn_down.weight").T + t(p + "ffn_down.bias")
        x = _ln(x + down, t(p + "layer_output_norm.weight"),
                t(p + "layer_output_norm.bias"), eps)
    return x


@pytest.fixture(scope="module")
def bert_model(tmp_path_factory):
    return make_tiny_bert_gguf(tmp_path_factory.mktemp("bert") / "bert.gguf")


def test_bert_hidden_matches_numpy(bert_model):
    eng = Engine(bert_model, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    ids = eng.tokenizer.tokenize("the quick brown fox", add_special=True)
    assert ids[0] == 2 and ids[-1] == 3  # [CLS] ... [SEP]
    v = eng.embed_tokens(ids, pooling="mean", normalize=False)
    ref = np_bert_forward(eng.reader, np.asarray(ids)).mean(axis=0)
    np.testing.assert_allclose(v, ref, rtol=5e-3, atol=5e-3)


def test_bert_padding_invariance(bert_model):
    """Embedding must not depend on the bucket padding (mask correctness):
    same text at different bucket sizes → same vector."""
    eng = Engine(bert_model, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    v1 = eng.embed_tokens(ids)
    # force a bigger bucket by embedding a long text first (warm another shape)
    long_ids = eng.tokenizer.tokenize(
        "the quick brown fox and the lazy dog and a cat of the world",
        add_special=True)
    eng.embed_tokens(long_ids)
    v2 = eng.embed_tokens(ids + [0] * 0)  # same tokens again
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)


def test_bert_similarity_sanity(bert_model):
    eng = Engine(bert_model, mode="dense", max_seq=64)
    a = eng.embed("the quick brown fox")
    b = eng.embed("the quick brown fox")
    c = eng.embed("hello world")
    assert np.dot(a, b) == pytest.approx(1.0, abs=1e-3)
    assert np.dot(a, c) < np.dot(a, b)
    assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)


def test_causal_model_embeddings(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "m.gguf", n_embd=64, n_head=4,
                                n_head_kv=2, n_ff=128, n_layer=2)
    eng = Engine(path, mode="dense", max_seq=64)
    v = eng.embed("the quick brown", pooling="last")
    assert v.shape == (64,)
    m = eng.embed("the quick brown", pooling="mean")
    assert not np.allclose(v, m)
    # embedding pass must not corrupt generation state
    assert eng.n_past == 0
    out = eng.generate("the quick", max_new_tokens=4)
    assert isinstance(out, str)


def test_server_embeddings_and_rerank(bert_model):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.server.api import Server
    from tpullm.server.scheduler import Scheduler

    engine = BatchEngine(bert_model, n_slots=2, max_seq=64, mode="dense",
                         prefill_chunk=32)
    sched = Scheduler(engine)
    sched.start()

    async def run():
        server = Server(sched, model_name="tiny-bert")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/embeddings",
                                  json={"input": ["hello world", "the fox"]})
            assert r.status == 200
            data = (await r.json())["data"]
            assert len(data) == 2
            assert len(data[0]["embedding"]) == 64

            r = await client.post("/v1/rerank", json={
                "query": "the quick brown fox",
                "documents": ["the quick brown fox", "hello world"],
                "top_n": 2,
            })
            assert r.status == 200
            results = (await r.json())["results"]
            assert results[0]["index"] == 0  # identical doc ranks first
            assert results[0]["relevance_score"] >= results[1]["relevance_score"]
        finally:
            await client.close()

    try:
        asyncio.run(run())
    finally:
        sched.stop()


def test_llama_embed_bidirectional(tmp_path):
    """llama-embed: non-causal llama used as an embedding model
    (LLM_ARCH_LLAMA_EMBED, mean pooling default)."""
    import jax.numpy as jnp
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime import Engine

    path = make_tiny_llama_gguf(tmp_path / "le.gguf", arch="llama-embed")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert not eng.hp.causal and eng.hp.pooling == "mean"
    emb = eng.embed("hello world")
    assert emb.shape == (eng.hp.n_embd,) and np.isfinite(emb).all()


def test_nomic_bert_moe_embed(tmp_path):
    """nomic-bert-moe: fused biased qkv + rope, GELU up/down MoE every 2nd
    layer; padding invariance proves the bidirectional mask + MoE wiring."""
    from tpullm.models.testing import make_tiny_nomic_moe_gguf

    path = make_tiny_nomic_moe_gguf(tmp_path / "nm.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.moe_every_n == 2 and not eng.hp.causal
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    v1 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    long_ids = eng.tokenizer.tokenize(
        "the quick brown fox and the lazy dog", add_special=True)
    eng.embed_tokens(long_ids)
    v2 = eng.embed_tokens(ids)
    assert np.isfinite(v1).all()
    np.testing.assert_allclose(v1, v2 * np.linalg.norm(v1), rtol=1e-4,
                               atol=1e-4)


def test_neo_bert_embed(tmp_path):
    from tpullm.models.testing import make_tiny_neo_bert_gguf

    path = make_tiny_neo_bert_gguf(tmp_path / "nb.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    v1 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    eng.embed_tokens(eng.tokenizer.tokenize(
        "the quick brown fox and the lazy dog", add_special=True))
    v2 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    assert np.isfinite(v1).all()
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)


def test_modern_bert_embed(tmp_path):
    """modern-bert: symmetric SWA on local layers + per-layer rope base."""
    from tpullm.models.testing import make_tiny_modern_bert_gguf

    path = make_tiny_modern_bert_gguf(tmp_path / "mb.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.sliding_window == 8 and eng.hp.swa_pattern == 3
    # dense-first: HF ModernBERT's layer 0 is GLOBAL (layer_id % 3 != 0 →
    # local, modeling_modernbert.py:464)
    assert not eng.hp.is_swa(0) and eng.hp.is_swa(2)
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    v1 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    eng.embed_tokens(eng.tokenizer.tokenize(
        "the quick brown fox and the lazy dog", add_special=True))
    v2 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    assert np.isfinite(v1).all()
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)


def test_gemma_embedding_embed(tmp_path):
    from tpullm.models.testing import make_tiny_gemma_embedding_gguf

    path = make_tiny_gemma_embedding_gguf(tmp_path / "ge.gguf")
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert not eng.hp.causal and eng.hp.swa_pattern == 6
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    v1 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    eng.embed_tokens(eng.tokenizer.tokenize(
        "the quick brown fox and the lazy dog", add_special=True))
    v2 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    assert np.isfinite(v1).all()
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)


def test_jina_bert_v3_embed(tmp_path):
    """jina-bert-v3: the bert graph + rope (no position embeddings)."""
    from tpullm.gguf import GGUFWriter as _W
    import numpy as _np
    from tpullm.models.testing import _encoder_header

    rng = _np.random.default_rng(3)
    n_embd, n_head, n_ff, n_layer = 64, 4, 96, 2
    path = str(tmp_path / "jv3.gguf")
    w = _W(path, architecture="jina-bert-v3")
    n_vocab = _encoder_header(w, "jina-bert-v3", n_layer=n_layer, n_ctx=128,
                              n_embd=n_embd, n_ff=n_ff, n_head=n_head)
    w.add_kv("jina-bert-v3.rope.freq_base", 10000.0)
    w.add_kv("jina-bert-v3.rope.dimension_count", n_embd // n_head)

    def rand(shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(_np.float32)

    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd)))
    w.add_tensor("token_embd_norm.weight", _np.ones(n_embd, _np.float32))
    w.add_tensor("token_embd_norm.bias", rand((n_embd,)))
    for i in range(n_layer):
        p = f"blk.{i}."
        for nm in ("attn_q", "attn_k", "attn_v"):
            w.add_tensor(p + nm + ".weight", rand((n_embd, n_embd)))
            w.add_tensor(p + nm + ".bias", rand((n_embd,)))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd)))
        w.add_tensor(p + "attn_output.bias", rand((n_embd,)))
        w.add_tensor(p + "attn_output_norm.weight", _np.ones(n_embd, _np.float32))
        w.add_tensor(p + "attn_output_norm.bias", rand((n_embd,)))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd)))
        w.add_tensor(p + "ffn_up.bias", rand((n_ff,)))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff)))
        w.add_tensor(p + "ffn_down.bias", rand((n_embd,)))
        w.add_tensor(p + "layer_output_norm.weight", _np.ones(n_embd, _np.float32))
        w.add_tensor(p + "layer_output_norm.bias", rand((n_embd,)))
    w.write()

    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                 kv_dtype=jnp.float32)
    assert eng.hp.rope.style == "neox"
    ids = eng.tokenizer.tokenize("hello world", add_special=True)
    v1 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    eng.embed_tokens(eng.tokenizer.tokenize(
        "the quick brown fox and the lazy dog", add_special=True))
    v2 = eng.embed_tokens(ids, pooling="mean", normalize=False)
    assert np.isfinite(v1).all()
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)
