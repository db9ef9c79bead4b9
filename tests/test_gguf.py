"""GGUF container roundtrip tests (the test-gguf.cpp analog) plus reading
files produced by the reference's own writer (oracle-gated)."""

import numpy as np
import pytest

from tpullm.gguf import GGMLType, GGUFReader, GGUFWriter
from tpullm.quant import codecs


def test_roundtrip_metadata_and_tensors(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.name", "test-model")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.embedding_length", 64)
    w.add_kv("llama.rope.freq_base", 10000.0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)
    w.add_kv("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "▁world"])
    w.add_kv("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.5, -3.0], dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([3, 3, 1, 1], dtype=np.int32))
    w.add_kv("big_number", 2**40)
    w.add_kv("negative", -5)

    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(8, 64)).astype(np.float32)
    f16 = rng.normal(size=(4, 32)).astype(np.float32)
    q8 = rng.normal(size=(16, 64)).astype(np.float32)
    q4k = rng.normal(size=(2, 256)).astype(np.float32)
    w.add_tensor("a.weight", f32, GGMLType.F32)
    w.add_tensor("b.weight", f16, GGMLType.F16)
    w.add_tensor("c.weight", q8, GGMLType.Q8_0)
    w.add_tensor("d.weight", q4k, GGMLType.Q4_K)
    w.write()

    r = GGUFReader(path)
    assert r.architecture == "llama"
    assert r.metadata["general.name"] == "test-model"
    assert r.metadata["llama.block_count"] == 2
    assert abs(r.metadata["llama.rope.freq_base"] - 10000.0) < 1e-3
    assert r.metadata["tokenizer.ggml.add_bos_token"] is True
    assert r.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello", "▁world"]
    np.testing.assert_allclose(
        r.metadata["tokenizer.ggml.scores"], [0.0, -1.0, -2.5, -3.0]
    )
    assert r.metadata["big_number"] == 2**40
    assert r.metadata["negative"] == -5

    # ne-order shapes: logical (8, 64) -> ne (64, 8)
    assert r.tensors["a.weight"].shape == (64, 8)
    np.testing.assert_array_equal(r.tensors["a.weight"].to_numpy(), f32)
    np.testing.assert_array_equal(
        r.tensors["b.weight"].to_numpy(), f16.astype(np.float16).astype(np.float32)
    )
    q8_ref = codecs.dequantize(
        codecs.quantize(q8.reshape(-1), GGMLType.Q8_0), GGMLType.Q8_0, q8.size
    ).reshape(q8.shape)
    np.testing.assert_array_equal(r.tensors["c.weight"].to_numpy(), q8_ref)
    assert r.tensors["d.weight"].ggml_type == GGMLType.Q4_K
    r.close()


def test_alignment(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, architecture="llama")
    # 3 tensors of awkward sizes to force padding
    for i, n in enumerate([32, 96, 32]):
        w.add_tensor(f"t{i}", np.arange(n, dtype=np.float32) + i)
    w.write()
    r = GGUFReader(path)
    assert r.data_start % 32 == 0
    for i, n in enumerate([32, 96, 32]):
        info = r.tensors[f"t{i}"]
        assert info.offset % 32 == 0
        np.testing.assert_array_equal(info.to_numpy(), np.arange(n, dtype=np.float32) + i)
    r.close()


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError):
        GGUFReader(p)


def test_read_reference_vocab_gguf():
    """Read a GGUF produced by the reference toolchain (fixture data file)."""
    import os

    path = "/root/reference/models/ggml-vocab-llama-spm.gguf"
    if not os.path.exists(path):
        pytest.skip("reference vocab fixture not available")
    r = GGUFReader(path)
    assert r.architecture == "llama"
    toks = r.metadata["tokenizer.ggml.tokens"]
    assert len(toks) == 32000
    assert toks[1] == "<s>"
    assert r.metadata["tokenizer.ggml.model"] == "llama"
    r.close()


def test_write_read_by_reference_reader(tmp_path, reference_gguf):
    """Files we write must parse with the reference gguf-py reader."""
    from gguf.gguf_reader import GGUFReader as RefReader

    path = tmp_path / "ours.gguf"
    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.name", "cross-check")
    x = np.arange(128, dtype=np.float32).reshape(2, 64)
    w.add_tensor("x.weight", x, GGMLType.F32)
    w.add_tensor("y.weight", x, GGMLType.Q8_0)
    w.write()

    rr = RefReader(str(path))
    fields = {f.name: f for f in rr.fields.values()}
    assert "general.name" in fields
    names = [t.name for t in rr.tensors]
    assert names == ["x.weight", "y.weight"]
    t0 = rr.tensors[0]
    np.testing.assert_array_equal(
        np.asarray(t0.data).reshape(2, 64), x
    )
