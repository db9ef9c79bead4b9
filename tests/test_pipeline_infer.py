"""Pipeline-parallel inference parity on the 8-device CPU mesh.

The serving analog of the reference's --split-mode layer path: logits from a
pp-staged (and pp×tp) PipelineEngine must equal the single-device forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpullm.gguf import GGUFReader
from tpullm.models import get_arch, load_hparams
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.parallel.pipeline_infer import PipelineEngine
from tpullm.runtime.kvcache import KVCache


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    # 4 layers so pp=4 and pp=2 both divide; dims divide tp=2
    path = tmp_path_factory.mktemp("ppinf") / "pp.gguf"
    return make_tiny_llama_gguf(
        path, n_layer=4, n_embd=128, n_head=8, n_head_kv=4, n_ff=256, seed=3
    )


def _ref_logits(path, toks, max_seq=32):
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    cache = KVCache.new(hp, toks.shape[0], max_seq, jnp.float32)
    pos = np.broadcast_to(
        np.arange(toks.shape[1], dtype=np.int32), toks.shape)
    logits, cache = jax.jit(arch.forward, static_argnums=0)(
        hp, params, jnp.asarray(toks), jnp.asarray(pos), cache, 0
    )
    return np.asarray(logits), (hp, arch, params, cache)


@pytest.mark.parametrize("pp,tp", [(4, 1), (2, 2)])
def test_pipeline_prefill_matches_single_device(model_path, pp, tp):
    rng = np.random.default_rng(0)
    B, T = pp * 2, 6
    toks = rng.integers(3, 200, size=(B, T), dtype=np.int32)
    ref, _ = _ref_logits(model_path, toks)

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[: pp * tp]).reshape(pp, tp),
                ("pipe", "model"))
    eng = PipelineEngine(model_path, mesh=mesh, batch=B, max_seq=32,
                         dtype=jnp.float32)
    got = eng.forward_batch(toks)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pipeline_decode_steps_match(model_path):
    """Prefill then two decode steps: the stage-resident cache must carry
    state correctly across pipelined calls."""
    rng = np.random.default_rng(1)
    pp, B, T = 4, 4, 5
    toks = rng.integers(3, 200, size=(B, T), dtype=np.int32)

    # reference: sequential prefill + 2 single-token steps
    ref_logits, (hp, arch, params, cache) = _ref_logits(model_path, toks)
    refs = []
    n_past = T
    step_tok = rng.integers(3, 200, size=(B, 1), dtype=np.int32)
    step_tok2 = rng.integers(3, 200, size=(B, 1), dtype=np.int32)
    for st in (step_tok, step_tok2):
        pos = np.full((B, 1), n_past, dtype=np.int32)
        lg, cache = jax.jit(arch.forward, static_argnums=0)(
            hp, params, jnp.asarray(st), jnp.asarray(pos), cache,
            jnp.int32(n_past))
        refs.append(np.asarray(lg))
        n_past += 1

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4, 1),
                ("pipe", "model"))
    eng = PipelineEngine(model_path, mesh=mesh, batch=B, max_seq=32,
                         dtype=jnp.float32)
    got_prefill = eng.forward_batch(toks)
    np.testing.assert_allclose(got_prefill, ref_logits, rtol=2e-4, atol=2e-4)
    got1 = eng.forward_batch(step_tok)
    got2 = eng.forward_batch(step_tok2)
    np.testing.assert_allclose(got1, refs[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got2, refs[1], rtol=2e-4, atol=2e-4)
