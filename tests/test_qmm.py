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


@pytest.mark.parametrize("gtype", KERNEL_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("M", [1, 16])
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


def test_kernel_batched_shape():
    ql = make_ql(GGMLType.Q8_0, 256, 512)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 3, 512)).astype(np.float32))
    got = qmm.qmatmul(x, ql)
    assert got.shape == (2, 3, 256)
    ref = qmatmul.matmul_reference(x, ql)
    assert nmse(np.asarray(got), np.asarray(ref)) < 2e-4


def test_kernel_multi_ktile():
    """K larger than one tile exercises the accumulation loop."""
    ql = make_ql(GGMLType.Q4_K, 128, 2 * qmm.TILE_K)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 2 * qmm.TILE_K)).astype(np.float32))
    got = qmm.qmatmul(x, ql)
    ref = qmatmul.matmul_reference(x, ql)
    assert nmse(np.asarray(got), np.asarray(ref)) < 2e-4
