"""Device-side repack (ops/device_repack.py) must be bit-identical to the
host repack path (ops/qmatmul.repack_np + upload_planes) for every type it
claims: the qmm kernel, the disk cache and the on-chip transform are
interchangeable representations of the same weights.

Runs on the CPU backend (conftest pins JAX_PLATFORMS=cpu); the on-TPU run
is exercised by the bench conformance sweep.
"""

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType, TYPE_TRAITS
from tpullm.ops import device_repack, qmatmul
from tpullm.quant import codecs


class _FakeInfo:
    def __init__(self, data, gtype, n_out, n_in):
        self.data = data
        self.ggml_type = gtype
        self.shape = (n_in, n_out)  # GGUF order: (n_in, n_out)
        self.name = "test.weight"


def _packed(gtype: GGMLType, n_out: int, n_in: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n_out, n_in)).astype(np.float32)
    return codecs.quantize(w.reshape(-1), gtype).reshape(n_out, -1)


@pytest.mark.parametrize("gtype", sorted(device_repack.DEVICE_TYPES,
                                         key=int))
def test_device_repack_bit_exact(gtype):
    n_out, n_in = 8, 512
    data = _packed(gtype, n_out, n_in)
    host = qmatmul.upload_planes(qmatmul.repack_np(data, gtype, n_out, n_in))
    dev = device_repack.repack_device(data, gtype, n_out, n_in)
    assert set(host) == set(dev), (gtype, sorted(host), sorted(dev))
    for nm in host:
        h = np.asarray(host[nm])
        d = np.asarray(dev[nm])
        assert h.dtype == d.dtype, (gtype, nm, h.dtype, d.dtype)
        assert h.shape == d.shape, (gtype, nm, h.shape, d.shape)
        np.testing.assert_array_equal(
            h.view(np.uint8), d.view(np.uint8),
            err_msg=f"{gtype.name} plane {nm} differs",
        )


def test_device_repack_roundtrip_matches_codec():
    """Planes from the device path must dequantize to the codec reference."""
    import jax.numpy as jnp

    gtype = GGMLType.Q4_K
    n_out, n_in = 8, 512
    data = _packed(gtype, n_out, n_in, seed=3)
    planes = device_repack.repack_device(data, gtype, n_out, n_in)
    got = np.asarray(qmatmul.dequant_planes(
        planes, gtype, n_out, n_in, dtype=jnp.float32))
    ref = codecs.dequantize(data.reshape(-1), gtype,
                            n_out * n_in).reshape(n_out, n_in).T
    # scale planes ride bf16 on both paths; tolerance covers that rounding
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_quant_from_info_uses_device_path(monkeypatch):
    """With TPULLM_DEVICE_REPACK=1 the loader must route through the device
    repack (no host planes, no disk cache) and produce a working linear."""
    import jax.numpy as jnp

    from tpullm.models.weights import quant_from_info

    monkeypatch.setenv("TPULLM_DEVICE_REPACK", "1")
    n_out, n_in = 8, 512
    data = _packed(GGMLType.Q6_K, n_out, n_in, seed=7)
    ql = quant_from_info(_FakeInfo(data, GGMLType.Q6_K, n_out, n_in))
    x = jnp.ones((2, n_in), jnp.float32)
    y = np.asarray(qmatmul.matmul_reference(x, ql))
    ref = codecs.dequantize(data.reshape(-1), GGMLType.Q6_K,
                            n_out * n_in).reshape(n_out, n_in)
    np.testing.assert_allclose(y, ref.sum(axis=1)[None, :].repeat(2, 0),
                               rtol=3e-2, atol=3e-1)
