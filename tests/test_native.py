"""Native C++ quant codecs vs the numpy oracle (≡ reference
test-quantize-fns.cpp over ggml-quants.c; here numpy is the reference and
native/quants.cpp the accelerated implementation)."""

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType, TYPE_TRAITS
from tpullm.quant import codecs, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return (rng.standard_normal(256 * 64) * 0.25).astype(np.float32)


@pytest.mark.parametrize("gtype", sorted(native.NATIVE_DEQUANT_TYPES))
def test_native_dequant_bitexact(data, gtype):
    """Native dequant must be BIT-exact against the numpy codec."""
    if gtype in codecs._QUANT:
        packed = codecs._QUANT[gtype](data)
    else:  # types we can't encode: synthesize random packed payloads
        tt = TYPE_TRAITS[gtype]
        rng = np.random.default_rng(0)
        packed = rng.integers(0, 256, size=tt.type_size * 32, dtype=np.uint8)
    tt = TYPE_TRAITS[gtype]
    n_elem = (packed.size // tt.type_size) * tt.block_size
    nat = native.dequantize(packed, gtype, n_elem)
    ref = codecs._DEQUANT[gtype](codecs._blocks(packed, tt.type_size)).reshape(-1)
    # random payloads can carry NaN f16 scales — NaN placement must match too
    assert np.array_equal(nat, ref, equal_nan=True), f"{gtype.name} dequant mismatch"


@pytest.mark.parametrize("gtype", [GGMLType.Q4_0, GGMLType.Q8_0])
def test_native_quantize_bitexact(data, gtype):
    nat = native.quantize(data, gtype)
    ref = codecs._QUANT[gtype](data)
    assert np.array_equal(nat, ref), f"{gtype.name} quantize mismatch"


@pytest.mark.parametrize("gtype", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K])
def test_native_quantize_kquant_error_parity(data, gtype):
    """K-quant searches use float accumulations whose order differs from
    numpy (pairwise vs sequential sums); require equal-or-better
    reconstruction error instead of bit equality."""
    tt = TYPE_TRAITS[gtype]
    nat = native.quantize(data, gtype)
    ref = codecs._QUANT[gtype](data)

    def rmse(packed):
        y = codecs._DEQUANT[gtype](codecs._blocks(packed, tt.type_size)).reshape(-1)
        return float(np.sqrt(np.mean((y - data) ** 2)))

    assert rmse(nat) <= rmse(ref) * 1.02 + 1e-9


def test_dispatch_uses_native(monkeypatch, data):
    """codecs.quantize/dequantize route through native when available."""
    calls = []
    orig = native.quantize

    def spy(values, gtype):
        calls.append(gtype)
        return orig(values, gtype)

    monkeypatch.setattr(native, "quantize", spy)
    codecs.quantize(data, GGMLType.Q8_0)
    assert calls == [GGMLType.Q8_0]


def test_no_native_env_fallback(monkeypatch, data):
    monkeypatch.setenv("TPULLM_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.get_lib() is None
    # codecs still work through numpy
    out = codecs.quantize(data[:256], GGMLType.Q4_K)
    assert out.size == 144


def test_native_speedup_quantize(data):
    """The point of the native path: K-quant encode must beat numpy clearly."""
    import time

    big = np.tile(data, 8)
    t0 = time.perf_counter()
    native.quantize(big, GGMLType.Q4_K)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    codecs._QUANT[GGMLType.Q4_K](big)
    t_np = time.perf_counter() - t0
    assert t_nat < t_np, f"native {t_nat:.3f}s not faster than numpy {t_np:.3f}s"


@pytest.mark.parametrize("gtype", sorted(native.NATIVE_REPACK_TYPES))
def test_native_repack_bitexact(gtype):
    """Native blocks→planes repack must match the numpy repack bit-exactly."""
    import os

    from tpullm.ops import qmatmul

    rng = np.random.default_rng(7)
    n_out, n_in = 8, 512
    x = (rng.standard_normal(n_out * n_in) * 0.2).astype(np.float32)
    packed = codecs.quantize(x, gtype)

    nat = native.repack(packed, gtype, n_out, n_in)
    assert nat is not None
    os.environ["TPULLM_NO_NATIVE"] = "1"
    try:
        import importlib

        # numpy reference path (native.repack returns None under the env)
        codes, scale, minus = qmatmul._decode_blocks(packed, gtype, n_out, n_in)
        meta = qmatmul._SCHEMA[gtype]
        U = qmatmul.split_unit(gtype)
        ref = {}
        if meta["bits"] == 4:
            ref["qs"] = qmatmul._half_split_pack4(codes, U)
        elif meta["bits"] == 5:
            ref["qs"] = qmatmul._half_split_pack4(codes & 0x0F, U)
            ref["qh"] = qmatmul._bitplane_pack(codes >> 4, 1, U)
        elif meta["bits"] == 6:
            ref["qs"] = qmatmul._half_split_pack4(codes & 0x0F, U)
            ref["qh"] = qmatmul._bitplane_pack(codes >> 4, 2, U)
        else:
            ref["qs"] = codes
        ref["scale"] = scale
        if minus is not None:
            ref["minus"] = minus
    finally:
        os.environ.pop("TPULLM_NO_NATIVE", None)

    assert set(nat) == set(ref), (set(nat), set(ref))
    for k in ref:
        assert nat[k].shape == ref[k].shape, (k, nat[k].shape, ref[k].shape)
        assert np.array_equal(nat[k], ref[k]), f"{gtype.name} plane {k} mismatch"
