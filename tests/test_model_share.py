"""Model/context separation (runtime/model.py ≡ llama_model vs
llama_context, reference include/llama.h:450-480): one loaded Model feeds
many engines; weights cross host→device once."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.runtime import Engine, Model
from tpullm.runtime.batch_engine import BatchEngine


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("share") / "m.gguf"
    return make_tiny_llama_gguf(
        path, n_layer=2, n_embd=64, n_head=4, n_head_kv=2, n_ff=128, seed=9)


def test_shared_model_matches_fresh_engine(model_path):
    mdl = Model(model_path, mode="dense", dtype=jnp.float32)
    ref = Engine(model_path, mode="dense", dtype=jnp.float32, max_seq=32)
    eng1 = Engine(mdl, max_seq=32)
    eng2 = Engine(mdl, max_seq=16)  # second context, same weights

    toks = [1, 5, 9, 2, 7]
    lr = ref.prefill(toks)
    l1 = eng1.prefill(toks)
    l2 = eng2.prefill(toks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(lr),
                               rtol=1e-5, atol=1e-5)
    # fused planes are shared (one fusion on the Model, both contexts see it)
    assert eng1.params is eng2.params


def test_shared_model_batch_engine(model_path):
    mdl = Model(model_path, mode="dense", dtype=jnp.float32)
    ref = BatchEngine(model_path, n_slots=2, max_seq=32, mode="dense",
                      dtype=jnp.float32, kv_dtype=jnp.float32)
    eng = BatchEngine(mdl, n_slots=2, max_seq=32, kv_dtype=jnp.float32)
    toks = [1, 5, 9, 2, 7, 6]
    lr = ref.prefill_slot(0, toks)
    lg = eng.prefill_slot(0, toks)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lr),
                               rtol=1e-5, atol=1e-5)


def test_shared_model_guards(model_path):
    mdl = Model(model_path, mode="dense", dtype=jnp.float32)
    with pytest.raises(ValueError, match="mode"):
        Engine(mdl, mode="quant", max_seq=16)
    Engine(mdl, max_seq=16)  # fuses the Model
    with pytest.raises(ValueError, match="already fused"):
        Engine(mdl, max_seq=16, lora=[("/nonexistent", 1.0)])
