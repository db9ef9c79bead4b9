"""Tensor-parallel sharding + training-step tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpullm.gguf import GGUFReader
from tpullm.models import get_arch, load_hparams
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.parallel import make_mesh, shard_cache, shard_params
from tpullm.runtime.kvcache import KVCache
from tpullm.training import OptimConfig, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def model8(tmp_path_factory):
    # dims divisible by tp=4: heads 8/8, embd 256
    path = tmp_path_factory.mktemp("m") / "tp.gguf"
    return make_tiny_llama_gguf(
        path, n_layer=2, n_embd=256, n_head=8, n_head_kv=8, n_ff=512, seed=1
    )


def _load(path):
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    params = arch.build_params(r, hp, mode="dense", dtype=jnp.float32)
    return r, hp, arch, params


def test_tp_forward_matches_single_device(model8):
    r, hp, arch, params = _load(model8)
    toks = np.array([[1, 5, 9, 2, 7, 3, 8, 4]], dtype=np.int32)
    pos = np.arange(8, dtype=np.int32)[None]

    cache = KVCache.new(hp, 1, 32, jnp.float32)
    ref_logits, _ = jax.jit(arch.forward, static_argnums=0)(
        hp, params, jnp.asarray(toks), jnp.asarray(pos), cache, 0
    )

    mesh = make_mesh(tp=4, dp=2)
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(KVCache.new(hp, 1, 32, jnp.float32), mesh)
        tp_logits, _ = jax.jit(arch.forward, static_argnums=0)(
            hp, sp, jnp.asarray(toks), jnp.asarray(pos), sc, 0
        )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(tp_logits), rtol=2e-4, atol=2e-4
    )


def test_tp_param_shardings(model8):
    r, hp, arch, params = _load(model8)
    mesh = make_mesh(tp=8, dp=1)
    sp = shard_params(params, mesh)
    wq = sp["layers"][0]["wq"].w
    wo = sp["layers"][0]["wo"].w
    # column-parallel q: sharded on n_out; row-parallel o: sharded on n_in
    assert wq.sharding.spec == P(None, "model")
    assert wo.sharding.spec == P("model", None)
    down = sp["layers"][0]["w_down"].w
    assert down.sharding.spec == P("model", None)


@pytest.mark.slow
def test_quant_tp_forward(model8, tmp_path):
    from tpullm.gguf.constants import GGMLType

    path = make_tiny_llama_gguf(
        tmp_path / "q8.gguf", n_layer=2, n_embd=256, n_head=8, n_head_kv=8,
        n_ff=512, seed=1, weight_type=GGMLType.Q8_0,
    )
    r = GGUFReader(path)
    hp = load_hparams(r)
    arch = get_arch(hp.arch)
    params = arch.build_params(r, hp, mode="quant")
    toks = np.array([[1, 5, 9, 2]], dtype=np.int32)
    pos = np.arange(4, dtype=np.int32)[None]
    cache = KVCache.new(hp, 1, 16, jnp.float32)
    ref, _ = jax.jit(arch.forward, static_argnums=0)(
        hp, params, jnp.asarray(toks), jnp.asarray(pos), cache, 0
    )
    mesh = make_mesh(tp=2, dp=4)
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(KVCache.new(hp, 1, 16, jnp.float32), mesh)
        got, _ = jax.jit(arch.forward, static_argnums=0)(
            hp, sp, jnp.asarray(toks), jnp.asarray(pos), sc, 0
        )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=5e-3, atol=5e-3)


def test_train_step_decreases_loss(model8):
    r, hp, arch, params = _load(model8)
    opt = make_optimizer(OptimConfig(lr=3e-3))
    opt_state = opt.init(params)
    step = make_train_step(arch.forward, hp, opt)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, 250, size=(2, 16), dtype=np.int32))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_sharded_train_step(model8):
    r, hp, arch, params = _load(model8)
    mesh = make_mesh(tp=4, dp=2)
    with mesh:
        params = shard_params(params, mesh)
        opt = make_optimizer(OptimConfig(lr=1e-3))
        opt_state = opt.init(params)
        step = make_train_step(arch.forward, hp, opt)
        tokens = jax.device_put(
            np.ones((4, 16), np.int32), NamedSharding(mesh, P("data", None))
        )
        params, opt_state, loss = step(params, opt_state, tokens)
    assert np.isfinite(float(loss))


def test_graft_entry_compiles():
    """entry() must stay jittable (the driver compile-checks it every
    round); eval_shape catches tracing/API breakage in seconds."""
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[-1] > 0


# slow: the driver runs dryrun_multichip(8) every round (MULTICHIP_r*)
# — in-suite it was the 670s long pole; entry-compile stays fast above
@pytest.mark.slow
def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] > 0
    g.dryrun_multichip(8)


# -- 4D pipeline parallelism -------------------------------------------------------


@pytest.mark.slow
def test_pipeline_train_step_matches_single_device(tmp_path):
    """dp×pp×tp shard_map pipeline loss == plain single-device loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpullm.gguf import GGUFReader
    from tpullm.models import get_arch, load_hparams
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.parallel.pipeline import (
        make_mesh3,
        make_pipeline_train_step,
        place_stacked,
        stack_llama_params,
    )
    from tpullm.training import loss_fn

    path = make_tiny_llama_gguf(
        tmp_path / "p.gguf", n_layer=4, n_embd=64, n_head=4, n_head_kv=2,
        n_ff=128,
    )
    reader = GGUFReader(path)
    hp = load_hparams(reader)
    arch = get_arch(hp.arch)
    params = arch.build_params(reader, hp, mode="dense", dtype=jnp.float32)

    rng = np.random.default_rng(0)
    B, T = 4, 16
    tokens = rng.integers(3, 200, size=(B, T)).astype(np.int32)

    ref_loss = float(loss_fn(arch.forward, hp, params, jnp.asarray(tokens)))

    mesh = make_mesh3(dp=2, pp=2, tp=2, devices=jax.devices()[:8])
    stacked = stack_llama_params(params)
    with mesh:
        placed = place_stacked(stacked, hp, mesh)
        step = make_pipeline_train_step(hp, mesh, lr=0.0)
        new_params, loss = step(placed, jnp.asarray(tokens))
    assert abs(float(loss) - ref_loss) < 2e-3, (float(loss), ref_loss)


@pytest.mark.slow
def test_pipeline_train_step_learns(tmp_path):
    """A few SGD steps through the pipeline reduce the loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpullm.gguf import GGUFReader
    from tpullm.models import get_arch, load_hparams
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.parallel.pipeline import (
        make_mesh3,
        make_pipeline_train_step,
        place_stacked,
        stack_llama_params,
    )

    path = make_tiny_llama_gguf(
        tmp_path / "p.gguf", n_layer=2, n_embd=64, n_head=4, n_head_kv=2,
        n_ff=128,
    )
    reader = GGUFReader(path)
    hp = load_hparams(reader)
    arch = get_arch(hp.arch)
    params = arch.build_params(reader, hp, mode="dense", dtype=jnp.float32)

    tokens = np.tile(np.arange(3, 19, dtype=np.int32), (4, 1))
    mesh = make_mesh3(dp=2, pp=2, tp=2, devices=jax.devices()[:8])
    with mesh:
        placed = place_stacked(stack_llama_params(params), hp, mesh)
        step = make_pipeline_train_step(hp, mesh, lr=0.5)
        losses = []
        for _ in range(5):
            placed, loss = step(placed, jnp.asarray(tokens))
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_engine_tp_inference_matches_single_device(model8):
    """Engine(mesh=...) runs sharded inference that matches unsharded logits
    (the serving analog of LLAMA_SPLIT_MODE_ROW)."""
    import jax

    from tpullm.runtime import Engine

    eng1 = Engine(model8, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    ids = eng1.tokenizer.tokenize("the quick brown fox", add_special=True)
    ref = eng1.prefill(ids)
    eng1.reset()
    ref_gen = list(eng1.generate_tokens(
        eng1.tokenizer.tokenize("hello", add_special=True), 6,
        stop_on_eog=False))

    mesh = make_mesh(tp=4, dp=1, devices=jax.devices()[:4])
    eng2 = Engine(model8, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32, mesh=mesh)
    got = eng2.prefill(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    eng2.reset()
    got_gen = list(eng2.generate_tokens(
        eng2.tokenizer.tokenize("hello", add_special=True), 6,
        stop_on_eog=False))
    assert got_gen == ref_gen


@pytest.mark.slow
def test_engine_ep_moe_matches_single_device(tmp_path):
    """Expert-parallel inference: stacked expert tensors shard over the
    'expert' mesh axis; logits match the unsharded engine (the dense
    all-experts combine contracts over E → GSPMD psum over 'expert')."""
    import jax

    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.parallel import EXPERT_AXIS, make_mesh_ep
    from tpullm.runtime import Engine

    path = make_tiny_moe_gguf(tmp_path / "moe.gguf")
    eng1 = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32)
    # >16 tokens → all-experts (dense) MoE regime, the EP-parallel path
    ids = list(range(2, 26))
    ref = eng1.prefill(ids)

    mesh = make_mesh_ep(ep=2, tp=2, dp=2)
    eng2 = Engine(path, mode="dense", dtype=jnp.float32, max_seq=64,
                  kv_dtype=jnp.float32, mesh=mesh)
    # expert stacks actually sharded over the expert axis
    lyr = eng2.params["layers"][0]
    spec = lyr["w_gate_exps"].sharding.spec
    assert spec and spec[0] == EXPERT_AXIS, spec
    got = eng2.prefill(ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    # decode (gather regime) stays correct under EP sharding too
    eng1.reset(); eng2.reset()
    g1 = list(eng1.generate_tokens([2, 3, 4], 4, stop_on_eog=False))
    g2 = list(eng2.generate_tokens([2, 3, 4], 4, stop_on_eog=False))
    assert g1 == g2


def test_ring_attention_matches_single_device():
    """Sequence-parallel ring attention over an 8-way seq mesh must equal
    plain causal attention (online-softmax merge exactness)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from tpullm.parallel.sequence import make_seq_mesh, ring_attention

    B, T, H, Hkv, D = 2, 64, 4, 2, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    scale = D ** -0.5

    mesh = make_seq_mesh(8)
    got = np.asarray(ring_attention(q, k, v, mesh, scale))

    # single-device reference
    G = H // Hkv
    qf = np.asarray(q).reshape(B, T, Hkv, G, D)
    s = np.einsum("bqhgd,bkhd->bhgqk", qf, np.asarray(k)) * scale
    mask = np.tril(np.ones((T, T), bool))
    s = np.where(mask[None, None, None], s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhgqk,bkhd->bqhgd", p, np.asarray(v)).reshape(B, T, H, D)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ring_attention_sp2():
    """Ring works at any axis size that divides T (here sp=2)."""
    import numpy as np
    import jax.numpy as jnp
    from tpullm.parallel.sequence import make_seq_mesh, ring_attention

    B, T, H, D = 1, 32, 2, 8
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    mesh = make_seq_mesh(2)
    got = np.asarray(ring_attention(q, k, v, mesh, D ** -0.5))
    assert np.isfinite(got).all() and got.shape == (B, T, H, D)


# -- mesh-sharded serving (BatchEngine) --------------------------------------------


def test_batch_engine_mesh_matches_unsharded(model8):
    """Sharded BatchEngine prefill+decode logits == unsharded run
    (≡ the reference serving through split-mode row, but over the mesh)."""
    from tpullm.runtime.batch_engine import BatchEngine

    def run(mesh):
        eng = BatchEngine(model8, n_slots=4, max_seq=64, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        out = []
        lg0 = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        lg1 = eng.prefill_slot(1, [3, 8, 4])
        out.append(lg0)
        out.append(lg1)
        step = eng.decode_batch({0: int(np.argmax(lg0)), 1: int(np.argmax(lg1))})
        out.append(step[0])
        out.append(step[1])
        return out

    ref = run(None)
    mesh = make_mesh(tp=4, dp=2)
    with mesh:
        got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_batch_engine_mesh_q8_kv(model8):
    """Sharded serving with q8_0 KV storage stays numerically aligned."""
    from tpullm.runtime.batch_engine import BatchEngine

    def run(mesh):
        eng = BatchEngine(model8, n_slots=2, max_seq=64, mode="dense",
                          dtype=jnp.float32, kv_dtype="q8_0", mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7, 6, 11, 12])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = make_mesh(tp=4, dp=2)
    with mesh:
        got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_batch_engine_ep_moe_serving(tmp_path):
    """Continuous-batching MoE serving on a dp×ep×tp mesh (≡ north-star
    Mixtral EP serving): expert stacks shard over 'expert', slots over
    'data', and logits match the unsharded batch engine."""
    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.parallel import make_mesh_ep
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_moe_gguf(tmp_path / "moe.gguf")

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=64, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, list(range(2, 20)))
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    got = run(make_mesh_ep(dp=2, ep=2, tp=2))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-4, atol=3e-4)


def test_shard_cache_specs(model8):
    from jax.sharding import PartitionSpec as P

    from tpullm.runtime.kvcache import QuantKVCache

    r = GGUFReader(model8)
    hp = load_hparams(r)
    mesh = make_mesh(tp=4, dp=2)
    c = shard_cache(KVCache.new(hp, 4, 32, jnp.float32), mesh, data_batch=True)
    assert c.k.sharding.spec == P(None, "data", "model", None, None)
    q = shard_cache(QuantKVCache.new(hp, 4, 32), mesh, data_batch=True)
    assert q.k_q.sharding.spec == P(None, "data", "model", None, None)
    assert q.k_s.sharding.spec == P(None, "data", "model", None)


def test_recurrent_dp_serving_matches_unsharded(tmp_path):
    """Recurrent-state serving on a dp mesh: mamba slots shard over the
    data axis, per-slot logits equal the unsharded engine (mesh-sharded
    recurrent serving, VERDICT r3 weak 7)."""
    import numpy as np

    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_mamba_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_mamba_gguf(tmp_path / "m.gguf")

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        lg1 = eng.prefill_slot(1, [3, 8, 4])
        step = eng.decode_batch({0: int(np.argmax(lg)),
                                 1: int(np.argmax(lg1))})
        return [lg, lg1, step[0], step[1]]

    ref = run(None)
    from tpullm.parallel import make_mesh

    mesh = make_mesh(tp=1, dp=2, devices=jax.devices()[:2])
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
