"""FusedLinear (QKV / gate+up plane-stream fusion) correctness.

Fusing output-concatenates same-type projections so the decode step reads
one long contiguous weight stream (≡ the fork's fewer-larger-MMQ-launches
discipline). Must be numerically exact vs the separate matmuls, and the
fused engine must reproduce the unfused engine's logits.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.models.weights import (
    DenseLinear,
    FusedLinear,
    fuse_linears,
)

from test_qmm import make_ql


@pytest.mark.parametrize("gtype", [GGMLType.Q4_0, GGMLType.Q4_K,
                                   GGMLType.Q8_0], ids=lambda t: t.name)
def test_fused_quant_matches_separate(gtype):
    n_in = 512
    parts = [make_ql(gtype, n, n_in, seed=i)
             for i, n in enumerate((256, 128, 128))]
    fused = fuse_linears(parts)
    assert isinstance(fused, FusedLinear)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, n_in)).astype(np.float32))
    outs = fused(x)
    assert len(outs) == 3
    for got, lin in zip(outs, parts):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(lin(x)), rtol=1e-5, atol=1e-5)


def test_fused_dense_matches_separate():
    rng = np.random.default_rng(1)
    parts = [DenseLinear(jnp.asarray(
        rng.normal(size=(64, n)).astype(np.float32))) for n in (32, 16)]
    fused = fuse_linears(parts)
    x = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
    a, b = fused(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(parts[0](x)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(parts[1](x)),
                               rtol=1e-5, atol=1e-5)


def test_fuse_rejects_mixed_types():
    # Q4_K_M-style per-layer mixing (wv at Q6_K) must not fuse
    a = make_ql(GGMLType.Q4_K, 256, 512, seed=0)
    b = make_ql(GGMLType.Q6_K, 256, 512, seed=1)
    assert fuse_linears([a, b]) is None
    d = DenseLinear(jnp.zeros((512, 256), jnp.float32))
    assert fuse_linears([a, d]) is None


def test_engine_fused_matches_unfused(tmp_path, monkeypatch):
    """End-to-end: Engine logits with fusion on == off (prefill + decode)."""
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime import Engine

    path = make_tiny_llama_gguf(
        tmp_path / "f.gguf", n_layer=2, n_embd=128, n_head=4, n_head_kv=2,
        n_ff=256, seed=7)

    def run(fuse: str):
        monkeypatch.setenv("TPULLM_FUSE_QKV", fuse)
        eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=32,
                     kv_dtype=jnp.float32)
        out = [eng.prefill([1, 5, 9, 2, 7])]
        out.append(eng.decode_step(int(np.argmax(out[0]))))
        return out

    ref = run("0")
    got = run("1")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_engine_fusion_applied(tmp_path):
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime import Engine

    path = make_tiny_llama_gguf(
        tmp_path / "g.gguf", n_layer=2, n_embd=128, n_head=4, n_head_kv=2,
        n_ff=256, seed=8)
    eng = Engine(path, mode="dense", dtype=jnp.float32, max_seq=32,
                 kv_dtype=jnp.float32)
    lyr = eng.params["layers"][0]
    assert isinstance(lyr.get("wqkv"), FusedLinear)
    assert isinstance(lyr.get("wgu"), FusedLinear)
    assert lyr["wq"] is None and lyr["w_gate"] is None
