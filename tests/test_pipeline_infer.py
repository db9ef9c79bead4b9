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


@pytest.mark.slow
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


@pytest.mark.parametrize("pp,tp", [
    # (2,1) is subsumed by (2,2) plus the dedicated tp tests; keep the
    # fuller mesh fast and the redundant one in the slow tier
    pytest.param(2, 1, marks=pytest.mark.slow), (2, 2)])
def test_batch_engine_pipe_mesh_matches_unsharded(model_path, pp, tp):
    """Continuous-batching serving on a ('pipe','model') mesh: staggered
    per-slot prefills, partial-batch decode, and a speculative verify step
    must reproduce the unsharded BatchEngine (≡ the reference server over a
    --split-mode layer model)."""
    from jax.sharding import Mesh

    from tpullm.runtime.batch_engine import BatchEngine

    def run(mesh):
        eng = BatchEngine(model_path, n_slots=4, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        out = []
        out.append(eng.prefill_slot(0, [1, 5, 9, 2, 7]))
        out.append(eng.prefill_slot(2, [3, 8, 4]))  # slots at staggered n_past
        step = eng.decode_batch({0: 11, 2: 13})  # slots 1/3 idle (offset −1)
        out.append(step[0])
        out.append(step[2])
        ver = eng.verify_batch({0: [4, 6, 2], 2: [9, 1, 5]}, width=3)
        out.append(ver[0])
        out.append(ver[2])
        return out

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[: pp * tp]).reshape(pp, tp),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_scheduler_on_pipe_mesh(model_path):
    """The continuous-batching scheduler end-to-end on a layer-split mesh:
    greedy generations must match the unsharded engine token-for-token."""
    from jax.sharding import Mesh

    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.runtime.sampling import SamplerParams
    from tpullm.server.scheduler import GenRequest, Scheduler

    def gen(mesh):
        eng = BatchEngine(model_path, n_slots=2, max_seq=64, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        sched = Scheduler(eng)
        sched.start()
        try:
            ids = eng.tokenizer.tokenize("the quick brown", add_special=True)
            req = sched.submit(GenRequest(
                prompt_ids=ids, max_tokens=8,
                sampling=SamplerParams(temp=0.0)))
            toks = []
            while True:
                ev = req.out.get(timeout=120)
                if ev[0] != "token":
                    break
                toks.append(ev[1])
            return toks
        finally:
            sched.stop()

    ref = gen(None)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("pipe", "model"))
    got = gen(mesh)
    assert got == ref and len(got) > 0


@pytest.mark.slow
def test_pipe_mesh_quantized_weights(model_path, tmp_path):
    """mode=quant on the pipe mesh: uniform-type weights stay packed (fused
    qmm stage-locally) and logits match the unsharded quant engine."""
    from jax.sharding import Mesh

    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.tools.quantize import quantize_model

    qpath = tmp_path / "pp_q8.gguf"
    quantize_model(str(model_path), str(qpath), "Q8_0", verbose=False)

    def run(mesh):
        eng = BatchEngine(qpath, n_slots=2, max_seq=32, mode="quant",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]], eng

    ref, _ = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got, eng = run(mesh)
    # the packed names really are packed (plane dicts in the stack)
    assert isinstance(eng.params["stack"]["wq"], dict)
    # the pipeline widens head/embd to f32 while the unsharded kernel casts
    # dequantized weights to bf16, so parity is format-noise-bounded
    for r, g in zip(ref, got):
        assert int(np.argmax(g)) == int(np.argmax(r))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-2, atol=1e-2)


def test_batch_engine_pipe_mesh_guards(model_path):
    from jax.sharding import Mesh

    from tpullm.runtime.batch_engine import BatchEngine

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    with pytest.raises(ValueError, match="divisible by pp"):
        BatchEngine(model_path, n_slots=3, max_seq=32, mode="dense",
                    dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)


@pytest.mark.slow
def test_pipe_mesh_moe(tmp_path):
    """Mixtral-style MoE through the layer-split pipeline: router + expert
    stacks live stage-resident, logits match the unsharded engine."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_moe_gguf(tmp_path / "mix.gguf", arch="llama",
                              n_layer=2, n_embd=64, n_head=4, n_head_kv=2,
                              n_expert=4, n_expert_used=2, n_ff_exp=96)

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ["nemotron_h", "granitehybrid", "jamba",
                                  "falcon_h1"])
def test_pipe_mesh_hybrid(tmp_path, arch):
    """Hybrid attention+SSM archs through layer-split pipeline stages:
    union-stacked layers with per-layer kind dispatch (attn / mamba2 SSD /
    ffn-only), stage-resident KV + conv/ssm state. Prefill + decode match
    the unsharded engine (pipeline_hybrid.py; reference: the ggml
    scheduler splitting any arch's graph, ggml-backend.cpp:1157)."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_hybrid2_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    if arch == "jamba":  # mamba1 mixers + paired dense FFN (with_moe off)
        from tpullm.models.testing import make_tiny_jamba_gguf

        pp = 2
        path = make_tiny_jamba_gguf(tmp_path / "jamba.gguf", with_moe=False)
    elif arch == "falcon_h1":  # parallel attn+mamba2 per layer
        from tpullm.models.testing import make_tiny_falcon_h1_gguf

        pp = 2
        path = make_tiny_falcon_h1_gguf(tmp_path / "fh1.gguf")
    else:
        pp = 3 if arch == "nemotron_h" else 2  # one stage per kind mix
        path = make_tiny_hybrid2_gguf(tmp_path / f"{arch}.gguf", arch=arch)

    def run(mesh):
        eng = BatchEngine(path, n_slots=pp, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32,
                          mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        steps = [lg]
        cur = int(np.argmax(lg))
        for _ in range(3):  # a few decode steps exercise the carried state
            out = eng.decode_batch({0: cur})
            steps.append(out[0])
            cur = int(np.argmax(out[0]))
        return steps

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:pp]).reshape(pp, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-4, atol=3e-4)


def _moe_tp2_fixture(tmp_path):
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_moe_gguf

    path = make_tiny_moe_gguf(tmp_path / "mtp.gguf", arch="qwen3moe",
                              n_layer=2, n_embd=256, n_head=4, n_head_kv=2,
                              n_expert=4, n_expert_used=2, n_ff_exp=256)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("pipe", "model"))
    return path, mesh


def _moe_tp2_run(mesh_, mode, src):
    from tpullm.runtime.batch_engine import BatchEngine

    eng = BatchEngine(src, n_slots=2, max_seq=32, mode=mode,
                      dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh_)
    lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
    step = eng.decode_batch({0: int(np.argmax(lg))})
    return [lg, step[0]], eng


def test_pipe_mesh_moe_tp2(tmp_path):
    """MoE pipeline stages with tp=2: experts shard over the stage model
    axis (expert parallelism inside a stage — non-local routing weights
    zeroed, psum combine), attention head-shards as usual. Dense f32 run
    must match the unsharded engine tightly."""
    path, mesh = _moe_tp2_fixture(tmp_path)
    ref, _ = _moe_tp2_run(None, "dense", path)
    got, eng = _moe_tp2_run(mesh, "dense", path)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-4, atol=3e-4)


# slow: the packed-quant variant re-compiles both engines (~130s extra);
# the EP math is identical to the fast dense case above and the packed
# stage path is fast-covered by test_pipe_mesh_moe_packed (tp=1)
@pytest.mark.slow
def test_pipe_mesh_moe_tp2_packed(tmp_path):
    from tpullm.tools.quantize import quantize_model

    path, mesh = _moe_tp2_fixture(tmp_path)
    qpath = tmp_path / "mtp-q8.gguf"
    quantize_model(str(path), str(qpath), "Q8_0", verbose=False)
    refq, _ = _moe_tp2_run(None, "quant", qpath)
    gotq, engq = _moe_tp2_run(mesh, "quant", qpath)
    assert isinstance(engq.params["stack"]["w_up_exps"], dict)  # packed
    # packed kernels run bf16 MXU dots in different sharding regimes on
    # the two sides — format-noise bounded
    for r, g in zip(refq, gotq):
        assert int(np.argmax(g)) == int(np.argmax(r))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-2, atol=3e-2)


def test_pipe_mesh_moe_packed(tmp_path):
    """Quantized MoE through the pipeline with experts kept GGUF-PACKED in
    stage HBM ([L, E, rows, N] plane stacks decoded by the stack/gather
    kernels — ≡ MUL_MAT_ID running quantized experts in place, mmid.cu):
    logits match the unsharded packed engine; nothing widens to bf16."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.tools.quantize import quantize_model

    path = make_tiny_moe_gguf(tmp_path / "mixp.gguf", arch="qwen3moe",
                              n_layer=2, n_embd=256, n_head=4, n_head_kv=2,
                              n_expert=4, n_expert_used=2, n_ff_exp=256)
    qpath = tmp_path / "mixp-q8.gguf"
    quantize_model(str(path), str(qpath), "Q8_0", verbose=False)

    def run(mesh):
        eng = BatchEngine(qpath, n_slots=2, max_seq=32, mode="quant",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]], eng

    ref, eng0 = run(None)
    # unsharded engine holds QuantExpertStacks (no widened arrays)
    from tpullm.models.weights import QuantExpertStack

    assert isinstance(eng0.params["layers"][0]["w_up_exps"],
                      QuantExpertStack)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got, eng = run(mesh)
    # the expert stacks really are packed plane dicts with qmeta entries
    assert isinstance(eng.params["stack"]["w_up_exps"], dict)
    assert eng._qmeta["w_up_exps"][3] == 4  # (gtype, n_out, n_in, E)
    for r, g in zip(ref, got):
        assert int(np.argmax(g)) == int(np.argmax(r))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-2, atol=1e-2)


@pytest.mark.slow
@pytest.mark.parametrize("pp,tp,kind", [(2, 1, "bias"), (2, 2, "bias"),
                                        (2, 1, "qknorm")])
def test_pipe_mesh_qwen_variants(tmp_path, pp, tp, kind):
    """qwen2-style attn biases (column-sharded with the projections) and
    qwen3-style per-head qk norms through the pipeline."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_llama_gguf(
        tmp_path / f"{kind}.gguf", arch="qwen2" if kind == "bias" else "qwen3",
        n_layer=2, n_embd=128, n_head=8, n_head_kv=4, n_ff=128, seed=9,
        with_qkv_bias=kind == "bias", with_qk_norm=kind == "qknorm")

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[: pp * tp]).reshape(pp, tp),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def _strip_gate(src_path, dst_path, arch, extra_kv=None):
    """Copy a fixture minus ffn_gate tensors (gateless-FFN archs)."""
    from tpullm.gguf import GGUFReader
    from tpullm.gguf.writer import GGUFWriter

    r = GGUFReader(src_path)
    w = GGUFWriter(str(dst_path), architecture=arch)
    for key, val in r.metadata.items():
        if key != "general.architecture":
            w.add_kv(key, val)
    for key, val in (extra_kv or {}).items():
        w.add_kv(key, val)
    for name, info in r.tensors.items():
        if name.endswith("ffn_gate.weight"):
            continue
        w.add_tensor(name, info.to_numpy())
    w.write()
    return str(dst_path)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["refact", "arcee", "apertus"])
def test_pipe_mesh_alibi_and_gateless(tmp_path, variant):
    """refact (ALiBi, no rope), arcee (gateless ReLU² FFN), and apertus
    (per-head qk norms + xIELU) through the pipeline."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    if variant == "refact":
        path = make_tiny_llama_gguf(
            tmp_path / "r.gguf", arch="refact", n_layer=2, n_embd=64,
            n_head=4, n_head_kv=2, n_ff=128, seed=11)
    elif variant == "arcee":
        base = make_tiny_llama_gguf(
            tmp_path / "a0.gguf", arch="arcee", n_layer=2, n_embd=64,
            n_head=4, n_head_kv=2, n_ff=128, seed=11)
        path = _strip_gate(base, tmp_path / "a.gguf", "arcee")
    else:
        base = make_tiny_llama_gguf(
            tmp_path / "x0.gguf", arch="apertus", n_layer=2, n_embd=64,
            n_head=4, n_head_kv=2, n_ff=128, seed=11, with_qk_norm=True)
        path = _strip_gate(base, tmp_path / "x.gguf", "apertus", extra_kv={
            "xielu.alpha_n": [0.8, 0.7], "xielu.alpha_p": [0.8, 0.9],
            "xielu.beta": [0.5, 0.5], "xielu.eps": [-1e-6, -1e-6]})

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipe_mesh_full_projection_qk_norms(tmp_path):
    """Full-width qk norms (olmoe/minimax style, llama.forward's
    full_qk_norm branch) through the pipeline at tp=1."""
    from jax.sharding import Mesh

    from tpullm.gguf import GGUFReader
    from tpullm.gguf.writer import GGUFWriter
    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    base = make_tiny_llama_gguf(
        tmp_path / "f0.gguf", n_layer=2, n_embd=64, n_head=4, n_head_kv=2,
        n_ff=128, seed=12)
    r = GGUFReader(base)
    path = str(tmp_path / "f.gguf")
    w = GGUFWriter(path, architecture="llama")
    for key, val in r.metadata.items():
        if key != "general.architecture":
            w.add_kv(key, val)
    rng = np.random.default_rng(12)
    for name, info in r.tensors.items():
        w.add_tensor(name, info.to_numpy())
    for i in range(2):
        w.add_tensor(f"blk.{i}.attn_q_norm.weight",
                     (rng.normal(size=64) * 0.1 + 1.0).astype(np.float32))
        w.add_tensor(f"blk.{i}.attn_k_norm.weight",
                     (rng.normal(size=32) * 0.1 + 1.0).astype(np.float32))
    w.write()

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r_, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["granite", "smollm3"])
def test_pipe_mesh_scaled_variants(tmp_path, variant):
    """llama-graph variants with hparam multipliers (granite scales) or
    per-layer rope gates (smollm3 NoPE layers) through the pipeline."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    if variant == "granite":
        extra = {"granite.residual_scale": 0.5,
                 "granite.embedding_scale": 4.0,
                 "granite.logit_scale": 2.0}
        path = make_tiny_llama_gguf(
            tmp_path / "g.gguf", arch="granite", n_layer=2, n_embd=64,
            n_head=4, n_head_kv=2, n_ff=128, seed=6, extra_kv=extra)
    else:
        # smollm3 defaults to no_rope_step=4 (every 4th layer skips rope)
        path = make_tiny_llama_gguf(
            tmp_path / "s.gguf", arch="smollm3", n_layer=4, n_embd=64,
            n_head=4, n_head_kv=2, n_ff=128, seed=6)

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    pp = 2
    mesh = Mesh(np.asarray(jax.devices()[:pp]).reshape(pp, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipe_mesh_sliding_window(tmp_path):
    """SWA llama (mistral-style) through the pipeline: the stage mask must
    window the full-size stage cache exactly like ops.attention.causal_mask."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_llama_gguf(
        tmp_path / "swa.gguf", n_layer=2, n_embd=64, n_head=4, n_head_kv=2,
        n_ff=128, seed=5,
        extra_kv={"llama.attention.sliding_window": 4})

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        assert eng.hp.sliding_window == 4
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7, 6, 11, 12, 3, 8])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipe_mesh_q8_kv(model_path):
    """q8_0 KV on the pipe mesh (the fork's -ctk q8_0 headline config):
    int8 codes + scales stay stage-resident; logits track the unsharded
    q8-KV engine within quantization noise."""
    from jax.sharding import Mesh

    from tpullm.runtime.batch_engine import BatchEngine

    def run(mesh):
        eng = BatchEngine(model_path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype="q8_0", mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7, 6, 11, 12])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        assert int(np.argmax(g)) == int(np.argmax(r))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_pipe_mesh_embedding_prompt_and_embed(model_path):
    """Plain precomputed-embedding prompts and the pooled-embeddings
    endpoint both run on the pipe mesh (VERDICT r2 #9: the reference's
    --split-mode layer serves embedding requests too); M-RoPE/deepstack
    multimodal streams remain a documented structural boundary of the
    uniform stacked-layer scan."""
    from jax.sharding import Mesh

    from tpullm.runtime.batch_engine import BatchEngine

    rng = np.random.default_rng(7)
    embds = (rng.normal(size=(5, 128)) * 0.02).astype(np.float32)

    def run(mesh):
        eng = BatchEngine(model_path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot_embeddings(0, embds)
        step = eng.decode_batch({0: int(np.argmax(lg))})
        vec = eng.embed_tokens(1, [3, 9, 4, 2])
        return [lg, step[0], vec]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)

    # the structural boundary still raises, with an actionable message
    eng = BatchEngine(model_path, n_slots=2, max_seq=32, mode="dense",
                      dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
    pos4 = np.zeros((4, 5), np.int32)
    with pytest.raises(NotImplementedError, match="M-RoPE"):
        eng.prefill_slot_embeddings(0, embds, positions=pos4)


@pytest.mark.parametrize("garch", ["gemma2", "gemma3"])
def test_pipe_mesh_gemma_family(tmp_path, garch):
    """Gemma through the pipeline (VERDICT r2 #9 widening): gelu FFN,
    sandwich post-norms, per-layer SWA interleave + dual rope base (g3),
    qk-norms (g3), attn/final softcaps (g2), sqrt(E) embedding scale —
    logits must equal the single-device gemma.forward over a full cache
    (the pipe stage cache is full-size ≡ --swa-full)."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_gemma_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_gemma_gguf(
        tmp_path / f"{garch}.gguf", arch=garch, n_layer=4, n_embd=64,
        n_head=4, n_head_kv=2, n_ff=128, sliding_window=4, seed=11)

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32,
                          mesh=mesh)
        if mesh is None:
            assert eng.hp.sliding_window == 4
            assert eng.hp.swa_pattern > 1  # the interleave is exercised
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7, 6, 11, 12, 3, 8])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kind", [
    # one fast representative; the structural variants (shared expert,
    # selection bias/scale) cover the same scan plumbing in the slow tier
    "qwen3moe",
    pytest.param("qwen2moe_shexp", marks=pytest.mark.slow),
    pytest.param("probs_bias_scale", marks=pytest.mark.slow)])
def test_pipe_mesh_qwen_moe_family(tmp_path, kind):
    """qwen-moe family through the layer-split pipeline: hparams-driven
    routing (renorm policy, gating func, scale, selection bias) and the
    shared expert (gated and plain) all stage-resident."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_moe_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    if kind == "qwen3moe":  # renormalized top-k via arch policy
        path = make_tiny_moe_gguf(tmp_path / "m.gguf", arch="qwen3moe",
                                  n_layer=2)
    elif kind == "qwen2moe_shexp":  # sigmoid-gated shared expert, no renorm
        path = make_tiny_moe_gguf(tmp_path / "m.gguf", arch="qwen2moe",
                                  n_layer=2, n_ff_shexp=48,
                                  gated_shexp=True)
    else:  # selection bias ranks, unbiased weights + router scale
        path = make_tiny_moe_gguf(tmp_path / "m.gguf", arch="qwen3moe",
                                  n_layer=2, with_probs_bias=True,
                                  expert_weights_scale=1.5)

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_pipe_mesh_mla_deepseek2(tmp_path):
    """deepseek2 absorbed-MLA through the layer-split pipeline: dense-lead
    layers run replicated as a prologue, the MoE+MLA layers rotate through
    stages with a pipe-sharded latent cache. Logits match the unsharded
    MLA engine."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_deepseek2_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    path = make_tiny_deepseek2_gguf(tmp_path / "ds2.gguf")

    def run(mesh):
        eng = BatchEngine(path, n_slots=2, max_seq=32, mode="dense",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]]

    ref = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_pipe_mesh_mla_deepseek2_packed_experts(tmp_path):
    """Quantized deepseek2 MLA pipeline with PACKED expert stacks: the MoE
    layers' experts ride [L, E, rows, N] plane dicts through the MLA scan
    (qmeta-routed to the stack/gather kernels) while attention widens."""
    from jax.sharding import Mesh

    from tpullm.models.testing import make_tiny_deepseek2_gguf
    from tpullm.runtime.batch_engine import BatchEngine
    from tpullm.tools.quantize import quantize_model

    path = make_tiny_deepseek2_gguf(
        tmp_path / "ds2p.gguf", n_embd=256, n_ff=256, n_ff_exp=256,
        n_ff_shexp=256)
    qpath = tmp_path / "ds2p-q8.gguf"
    quantize_model(str(path), str(qpath), "Q8_0", verbose=False)

    def run(mesh):
        eng = BatchEngine(qpath, n_slots=2, max_seq=32, mode="quant",
                          dtype=jnp.float32, kv_dtype=jnp.float32, mesh=mesh)
        lg = eng.prefill_slot(0, [1, 5, 9, 2, 7])
        step = eng.decode_batch({0: int(np.argmax(lg))})
        return [lg, step[0]], eng

    ref, _ = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("pipe", "model"))
    got, eng = run(mesh)
    assert isinstance(eng.params["stack"]["w_up_exps"], dict)
    assert eng._qmeta["w_up_exps"][3] == 4  # (gtype, n_out, n_in, E)
    # both sides run packed kernels but in different regimes (pipeline
    # microbatch padding vs single-slot): bf16-MXU noise bounded
    for r, g in zip(ref, got):
        assert int(np.argmax(g)) == int(np.argmax(r))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-2, atol=2e-2)
