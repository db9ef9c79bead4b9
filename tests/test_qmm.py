"""Conformance of the fused dequant-matmul (Pallas kernel, interpret mode on
CPU) against the jnp dequant-then-matmul reference — the test-backend-ops
analog: per-type NMSE tolerances on random data."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType
from tpullm.models.weights import QuantLinear
from tpullm.ops import qmatmul
from tpullm.ops.pallas import qmm
from tpullm.quant import codecs

# Interpret-mode Pallas on CPU costs tens of seconds per case, so the full
# type×M sweep carries the `slow` mark and the default (-m "not slow") run
# keeps one representative per layout family (simple f16-scale block,
# K-quant superblock) at M=1 — the decode shape. Run the full matrix with
# `pytest -m slow tests/test_qmm.py` (CI) or on real TPU.
_FAST = {(GGMLType.Q4_0, 1), (GGMLType.Q4_K, 1), (GGMLType.Q6_K, 1)}


def _ktype_params(types, Ms):
    for t in types:
        for m in Ms:
            marks = [] if (t, m) in _FAST else [pytest.mark.slow]
            yield pytest.param(t, m, marks=marks, id=f"{t.name}-M{m}")


KERNEL_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.MXFP4,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
]


def make_ql(gtype, n_out, n_in, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n_out, n_in)).astype(np.float32) * 0.1
    if gtype in codecs._QUANT:
        packed = codecs.quantize(w.reshape(-1), gtype)
    else:
        # decode-only types: synthesize valid blocks
        from tpullm.gguf.constants import TYPE_TRAITS

        tt = TYPE_TRAITS[gtype]
        nb = w.size // tt.block_size
        raw = rng.integers(0, 256, size=(nb, tt.type_size), dtype=np.uint8)
        sb = rng.uniform(0.001, 0.05, size=nb).astype(np.float16).view(np.uint8).reshape(nb, 2)
        offs = {GGMLType.Q2_K: (80, 82), GGMLType.Q3_K: (108,)}[gtype]
        for off in offs:  # every f16 scale field needs valid (finite) bits
            raw[:, off : off + 2] = sb
        packed = raw.reshape(-1)
    planes = qmatmul.repack(packed, gtype, n_out, n_in)
    return QuantLinear(gtype, n_out, n_in, planes)


def nmse(a, b):
    return float(np.mean((a - b) ** 2) / (np.mean(b**2) + 1e-12))


@pytest.mark.parametrize("gtype,M", _ktype_params(KERNEL_TYPES, [1, 16]))
def test_kernel_matches_reference(gtype, M):
    n_in, n_out = 512, 256
    ql = make_ql(gtype, n_out, n_in)
    assert qmm.supports(gtype, n_in, n_out)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, n_in)).astype(np.float32))

    ref = qmatmul.matmul_reference(x, ql)
    got = qmm.qmatmul(x, ql)
    assert got.shape == (M, n_out)
    # kernel computes in bf16 on the MXU; reference is f32
    err = nmse(np.asarray(got), np.asarray(ref))
    assert err < 2e-4, f"{gtype.name} M={M}: NMSE {err}"


@pytest.mark.slow
def test_kernel_batched_shape():
    ql = make_ql(GGMLType.Q8_0, 256, 512)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 3, 512)).astype(np.float32))
    got = qmm.qmatmul(x, ql)
    assert got.shape == (2, 3, 256)
    ref = qmatmul.matmul_reference(x, ql)
    assert nmse(np.asarray(got), np.asarray(ref)) < 2e-4


@pytest.mark.slow
def test_kernel_multi_ktile():
    """K larger than one tile exercises the accumulation loop."""
    ql = make_ql(GGMLType.Q4_K, 128, 2 * qmm.TILE_K)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 2 * qmm.TILE_K)).astype(np.float32))
    got = qmm.qmatmul(x, ql)
    ref = qmatmul.matmul_reference(x, ql)
    assert nmse(np.asarray(got), np.asarray(ref)) < 2e-4


# -- i-quant / ternary plane path (VERDICT item: IQ/TQ weights must not
# widen to bf16 in HBM; ≡ ggml-cuda/vecdotq.cuh per-type dot paths) --------

IQ_TYPES = [
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]


@pytest.mark.parametrize("gtype", IQ_TYPES, ids=lambda t: t.name)
def test_iq_plane_decode_bit_exact(gtype):
    """scale[g]·map(code) must reproduce the codec dequant bit-for-bit
    (before the bf16 plane upload): the affine plane decomposition is
    lossless for the codebook formats."""
    rng = np.random.default_rng(7)
    n_out, n_in = 4, 512
    w = rng.normal(size=(n_out, n_in)).astype(np.float32) * 0.1
    packed = codecs.quantize(w.reshape(-1), gtype)
    ref = codecs.dequantize(packed, gtype, n_out * n_in).reshape(n_out, n_in).T  # [K, N]
    codes, scale, minus = qmatmul._decode_blocks(packed, gtype, n_out, n_in)
    assert minus is None
    meta = qmatmul._SCHEMA[gtype]
    G = meta["G"]
    if "lut" in meta:
        vals = np.asarray(meta["lut"], np.float32)[codes]
    else:
        vals = (codes.astype(np.int32) - meta["bias"]).astype(np.float32)
    got = (vals.reshape(-1, G, n_out)
           * scale.reshape(-1, 1, n_out)).reshape(n_in, n_out)
    assert np.array_equal(got, ref), f"{gtype.name}: plane decode not exact"


@pytest.mark.parametrize(
    "gtype,M",
    [pytest.param(t, m,
                  marks=[] if (t, m) == (GGMLType.IQ2_XXS, 1)
                  else [pytest.mark.slow],
                  id=f"{t.name}-M{m}")
     for t in IQ_TYPES for m in (1, 16)])
def test_iq_kernel_matches_reference(gtype, M):
    # TQ scale groups span 256 rows; the scale plane needs ≥8 sublanes
    n_in = 2048 if gtype in (GGMLType.TQ1_0, GGMLType.TQ2_0) else 512
    n_out = 256
    ql = make_ql(gtype, n_out, n_in, seed=11)
    assert qmm.supports(gtype, n_in, n_out)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(M, n_in)).astype(np.float32))
    ref = qmatmul.matmul_reference(x, ql)
    got = qmm.qmatmul(x, ql)
    err = nmse(np.asarray(got), np.asarray(ref))
    assert err < 2e-4, f"{gtype.name} M={M}: NMSE {err}"


def test_q6k_wide_repack_bit_exact():
    """The wide int8 "qw" plane (bias pre-folded at repack) must decode to
    exactly the same values as the packed qs/qh planes: scale planes are
    shared, so dequant equality reduces to code equality."""
    import jax.numpy as jnp_

    rng = np.random.default_rng(5)
    n_out, n_in = 8, 512
    w = rng.normal(size=(n_out, n_in)).astype(np.float32) * 0.1
    packed = codecs.quantize(w.reshape(-1), GGMLType.Q6_K)

    codes, scale, minus = qmatmul._decode_blocks(packed, GGMLType.Q6_K,
                                                 n_out, n_in)
    assert minus is None
    U = qmatmul.split_unit(GGMLType.Q6_K)
    planes_np = {
        "qs": qmatmul._half_split_pack4(codes & 0x0F, U),
        "qh": qmatmul._bitplane_pack(codes >> 4, 2, U),
        "scale": scale,
    }
    wide = qmatmul._widen_planes(planes_np, GGMLType.Q6_K, n_out, n_in)
    got = wide["qw"].view(np.int8).astype(np.int32)
    expect = codes.astype(np.int32) - 32
    assert np.array_equal(got, expect)
    np.testing.assert_array_equal(wide["scale"], scale)

    # and the full repack → reference dequant matches the codec dequant
    # within the bf16 scale-plane rounding
    planes = qmatmul.repack(packed, GGMLType.Q6_K, n_out, n_in)
    assert "qw" in planes  # Q6_K defaults to the wide layout
    deq = np.asarray(qmatmul.dequant_planes(planes, GGMLType.Q6_K,
                                            n_out, n_in))
    ref = codecs.dequantize(packed, GGMLType.Q6_K, n_out * n_in).reshape(
        n_out, n_in).T
    np.testing.assert_allclose(deq, ref, rtol=4.5e-3, atol=1e-6)
