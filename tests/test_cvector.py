"""Control vectors: load/apply/generate (≡ reference llama_adapter_cvec +
tools/cvector-generator)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.runtime import Engine
from tpullm.tools.cvector import (
    generate_control_vector,
    load_control_vector,
    save_control_vector,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("cv") / "m.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )


def test_cvec_roundtrip_and_strength(model, tmp_path):
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((2, 64)).astype(np.float32)
    f = tmp_path / "cv.gguf"
    save_control_vector(f, dirs)
    loaded = load_control_vector(f, n_layer=2, strength=0.5)
    np.testing.assert_allclose(loaded, dirs * 0.5, rtol=1e-6)
    # layers beyond the file stay zero
    loaded3 = load_control_vector(f, n_layer=3)
    assert not np.any(loaded3[2])


def test_cvec_apply_changes_logits(model, tmp_path):
    rng = np.random.default_rng(1)
    dirs = (rng.standard_normal((2, 64)) * 0.1).astype(np.float32)
    f = tmp_path / "cv.gguf"
    save_control_vector(f, dirs)

    eng0 = Engine(model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    ids = eng0.tokenizer.tokenize("the quick", add_special=True)
    base = eng0.prefill(ids)

    eng1 = Engine(model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32, control_vectors=[(str(f), 1.0)])
    steered = eng1.prefill(ids)
    assert np.abs(steered - base).max() > 1e-4

    eng2 = Engine(model, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32, control_vectors=[(str(f), 0.0)])
    zero = eng2.prefill(ids)
    np.testing.assert_allclose(zero, base, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", [
    # one generation e2e fast; pca differs only in the direction solve
    "mean", pytest.param("pca", marks=pytest.mark.slow)])
def test_cvec_generation(model, tmp_path, method):
    dirs = generate_control_vector(
        model,
        positive=["the happy dog", "a happy world"],
        negative=["the sad dog", "a sad world"],
        method=method,
    )
    assert dirs.shape == (2, 64)
    assert np.isfinite(dirs).all()
    assert np.any(dirs)
    # generated vector steers the model
    f = tmp_path / "gen.gguf"
    save_control_vector(f, dirs)
    eng = Engine(model, mode="dense", max_seq=64,
                 control_vectors=[(str(f), 2.0)])
    assert isinstance(eng.generate("the quick", max_new_tokens=4), str)
