"""Quant codec tests: roundtrip error bounds (the test-quantize-fns.cpp analog)
and bit-exact dequantization vs the reference gguf-py oracle."""

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType, TYPE_TRAITS, QK_K
from tpullm.quant import codecs

# Max normalized RMSE per type on the smooth synthetic signal (role of the
# reference tests/test-quantize-fns.cpp total_error bounds, expressed as
# rmse(x, dq)/rms(x); values are measured-current + ~15% headroom so codec
# quality regressions fail the suite).
RMSE_BOUNDS = {
    GGMLType.Q4_0: 0.058,
    GGMLType.Q4_1: 0.059,
    GGMLType.Q5_0: 0.031,
    GGMLType.Q5_1: 0.029,
    GGMLType.Q8_0: 0.0039,
    GGMLType.Q8_1: 0.0039,
    GGMLType.Q2_K: 0.245,
    GGMLType.Q3_K: 0.131,
    GGMLType.Q4_K: 0.051,
    GGMLType.Q5_K: 0.028,
    GGMLType.Q6_K: 0.0135,
    GGMLType.Q8_K: 0.0044,
    GGMLType.MXFP4: 0.098,
}


def synthetic(n: int, offset: float = 0.0) -> np.ndarray:
    # smooth synthetic data like test-quantize-fns.cpp generate_data()
    i = np.arange(n, dtype=np.float32)
    return 0.1 + 2.0 * np.cos(i + offset)


def rmse(a, b):
    return np.sqrt(np.mean((a - b) ** 2))


@pytest.mark.parametrize("gtype", sorted(RMSE_BOUNDS.keys(), key=int))
def test_roundtrip_error_bound(gtype):
    x = synthetic(1024)
    packed = codecs.quantize(x, gtype)
    tt = TYPE_TRAITS[gtype]
    assert packed.size == x.size // tt.block_size * tt.type_size
    y = codecs.dequantize(packed, gtype, x.size)
    err = rmse(x, y) / rmse(x, np.zeros_like(x))
    bound = RMSE_BOUNDS[gtype]
    assert err < bound, f"{gtype.name}: normalized RMSE {err:.6f} >= {bound}"


@pytest.mark.parametrize("gtype", sorted(RMSE_BOUNDS.keys(), key=int))
def test_roundtrip_random_data(gtype):
    rng = np.random.default_rng(0)
    x = rng.normal(size=2048).astype(np.float32)
    packed = codecs.quantize(x, gtype)
    y = codecs.dequantize(packed, gtype, x.size)
    err = rmse(x, y) / rmse(x, np.zeros_like(x))
    assert err < 6 * RMSE_BOUNDS[gtype], f"{gtype.name}: {err}"


def test_bf16_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=512).astype(np.float32)
    bits = codecs.f32_to_bf16_bits(x)
    y = codecs.bf16_bits_to_f32(bits)
    assert np.max(np.abs(x - y)) < 0.01
    # bf16-representable values roundtrip exactly
    x2 = codecs.bf16_bits_to_f32(bits)
    assert np.array_equal(codecs.f32_to_bf16_bits(x2), bits)


def test_q8_0_exact_integers():
    # integers well within range must be exactly representable
    x = np.arange(-16, 16, dtype=np.float32)
    packed = codecs.quantize(x, GGMLType.Q8_0)
    y = codecs.dequantize(packed, GGMLType.Q8_0, 32)
    d = np.float32(np.float16(16.0 / 127.0))
    assert np.allclose(x, y, atol=float(d) / 2 + 1e-6)


# ---------------------------------------------------------------------------
# bit-exact dequant vs the reference gguf-py oracle
# ---------------------------------------------------------------------------

ORACLE_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.MXFP4,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
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


def _synth_packed(gtype: GGMLType, n_blocks: int, rng: np.random.Generator) -> np.ndarray:
    """Build valid random packed blocks: random payload bytes with sane fp16
    scale fields, so dequant exercises every code path."""
    tt = TYPE_TRAITS[gtype]
    raw = rng.integers(0, 256, size=(n_blocks, tt.type_size), dtype=np.uint8)
    scale = rng.uniform(0.001, 2.0, size=n_blocks).astype(np.float16)
    sb = scale.view(np.uint8).reshape(n_blocks, 2)
    offsets = {
        GGMLType.Q4_0: [0], GGMLType.Q4_1: [0, 2], GGMLType.Q5_0: [0],
        GGMLType.Q5_1: [0, 2], GGMLType.Q8_0: [0],
        GGMLType.Q2_K: [80, 82], GGMLType.Q3_K: [108],
        GGMLType.Q4_K: [0, 2], GGMLType.Q5_K: [0, 2], GGMLType.Q6_K: [208],
        GGMLType.IQ4_NL: [0], GGMLType.IQ4_XS: [0],
        GGMLType.IQ2_XXS: [0], GGMLType.IQ2_XS: [0], GGMLType.IQ2_S: [0],
        GGMLType.IQ3_XXS: [0], GGMLType.IQ3_S: [0], GGMLType.IQ1_S: [0],
        GGMLType.TQ1_0: [52], GGMLType.TQ2_0: [64],
    }
    if gtype == GGMLType.MXFP4:
        raw[:, 0] = rng.integers(110, 140, size=n_blocks, dtype=np.uint8)
    elif gtype == GGMLType.IQ1_M:
        # the block f16 scale lives in the top nibble of each of the 4 scale
        # words (bytes 48..56); plant a sane value nibble by nibble
        dbits = scale.view(np.uint16)
        words = raw[:, 48:56].copy().view("<u2").reshape(n_blocks, 4)
        for k in range(4):
            words[:, k] = (words[:, k] & 0x0FFF) | (
                ((dbits >> (4 * k)) & 0xF).astype(np.uint16) << 12
            )
        raw[:, 48:56] = words.view(np.uint8).reshape(n_blocks, 8)
    else:
        for off in offsets[gtype]:
            raw[:, off : off + 2] = sb
    return raw.reshape(-1)


@pytest.mark.parametrize("gtype", ORACLE_TYPES, ids=lambda t: t.name)
def test_dequant_bitexact_vs_reference(gtype, reference_gguf):
    import gguf.quants as refq

    rng = np.random.default_rng(int(gtype) + 7)
    packed = _synth_packed(gtype, 64, rng)
    ours = codecs.dequantize(packed, gtype, 64 * TYPE_TRAITS[gtype].block_size)
    theirs = refq.dequantize(
        packed.copy(), reference_gguf.GGMLQuantizationType(int(gtype))
    ).reshape(-1)
    np.testing.assert_array_equal(
        ours, theirs.astype(np.float32), err_msg=f"{gtype.name} dequant mismatch"
    )


@pytest.mark.parametrize(
    "gtype",
    [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
     GGMLType.TQ1_0, GGMLType.TQ2_0],
    ids=lambda t: t.name,
)
def test_quantize_bitexact_vs_reference(gtype, reference_gguf):
    """For simple formats our encoder must match gguf-py's bit for bit."""
    import gguf.quants as refq

    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    ours = codecs.quantize(x.reshape(-1), gtype)
    theirs = refq.quantize(x.copy(), reference_gguf.GGMLQuantizationType(int(gtype)))
    np.testing.assert_array_equal(ours, theirs.reshape(-1))


@pytest.mark.parametrize(
    "gtype",
    [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K],
    ids=lambda t: t.name,
)
def test_kquant_encode_quality_vs_reference_decode(gtype, reference_gguf):
    """Our K-quant encoder output must decode (by the reference) to data with
    error comparable to the roundtrip bound — validates pack layout."""
    import gguf.quants as refq

    rng = np.random.default_rng(5)
    x = rng.normal(size=4 * QK_K).astype(np.float32)
    packed = codecs.quantize(x, gtype)
    theirs = refq.dequantize(
        packed, reference_gguf.GGMLQuantizationType(int(gtype))
    ).reshape(-1).astype(np.float32)
    ours = codecs.dequantize(packed, gtype, x.size)
    np.testing.assert_array_equal(ours, theirs)  # same bytes, same decode
    err = rmse(x, theirs) / rmse(x, np.zeros_like(x))
    assert err < 6 * RMSE_BOUNDS[gtype]


@pytest.mark.parametrize(
    "gtype",
    [GGMLType.IQ2_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.TQ2_0],
    ids=lambda t: t.name,
)
def test_iq_tensor_roundtrip_through_gguf(gtype, tmp_path, reference_gguf):
    """Raw-packed i-quant tensor written to a GGUF reads back (via the
    container's to_numpy dequant path) matching the gguf-py oracle."""
    import gguf.quants as refq

    from tpullm.gguf import GGUFReader
    from tpullm.gguf.writer import GGUFWriter

    rng = np.random.default_rng(int(gtype))
    rows, cols = 4, 512
    tt = TYPE_TRAITS[gtype]
    packed = _synth_packed(gtype, rows * cols // tt.block_size, rng)

    path = tmp_path / "iq.gguf"
    w = GGUFWriter(path, architecture="llama")
    w.add_packed_tensor("w.weight", (cols, rows), gtype, packed.tobytes())
    w.write()

    r = GGUFReader(path)
    got = r.tensors["w.weight"].to_numpy()
    assert got.shape == (rows, cols)
    ref = refq.dequantize(
        packed.copy(), reference_gguf.GGMLQuantizationType(int(gtype))
    ).reshape(rows, cols)
    np.testing.assert_array_equal(got, ref.astype(np.float32))


@pytest.mark.parametrize(
    "gtype,bound",
    [(GGMLType.Q2_K, 0.0075), (GGMLType.Q3_K, 0.0040), (GGMLType.Q4_K, 0.002),
     (GGMLType.Q5_K, 0.002), (GGMLType.Q6_K, 0.002),
     (GGMLType.IQ4_NL, 0.002), (GGMLType.IQ4_XS, 0.002),
     (GGMLType.TQ1_0, 0.01), (GGMLType.TQ2_0, 0.01)],
    ids=lambda v: v.name if isinstance(v, GGMLType) else str(v),
)
def test_kquant_encoders_meet_ggml_error_bounds(gtype, bound):
    """Our encoders must clear the reference's own acceptance thresholds
    (tests/test-quantize-fns.cpp MAX_QUANTIZATION_TOTAL_ERROR*, exact
    sqrt(Σdiff²)/n metric on its synthetic signal)."""
    n = 1024 * 32
    i = np.arange(n, dtype=np.float32)
    x = (0.1 + 2.0 * np.cos(i)).astype(np.float32)
    y = codecs.dequantize(codecs.quantize(x, gtype), gtype, n)
    err = np.sqrt(np.sum((x.astype(np.float64) - y) ** 2)) / n
    assert err < bound, f"{gtype.name}: {err} >= {bound}"


@pytest.mark.parametrize("gtype", [GGMLType.IQ4_NL, GGMLType.IQ4_XS],
                         ids=lambda t: t.name)
def test_iq4_encode_decodes_by_reference(gtype, reference_gguf):
    """Layout check: gguf-py must decode our IQ4 packings to the same values
    our own decoder sees, with sane error vs the source."""
    import gguf.quants as refq

    rng = np.random.default_rng(11)
    x = rng.normal(size=4 * QK_K).astype(np.float32)
    packed = codecs.quantize(x, gtype)
    theirs = refq.dequantize(
        packed, reference_gguf.GGMLQuantizationType(int(gtype))
    ).reshape(-1).astype(np.float32)
    ours = codecs.dequantize(packed, gtype, x.size)
    np.testing.assert_array_equal(ours, theirs)
    err = rmse(x, theirs) / rmse(x, np.zeros_like(x))
    assert err < 0.15  # 4-bit non-linear on gaussian data


# -- i-quant encoders (grid search; test-quantize-fns-style error bounds) -----


@pytest.mark.parametrize("gtype,bound", [
    (GGMLType.IQ2_XXS, 0.37),
    (GGMLType.IQ2_XS, 0.33),
    (GGMLType.IQ2_S, 0.28),
    (GGMLType.IQ3_XXS, 0.23),
    (GGMLType.IQ3_S, 0.17),
    (GGMLType.IQ1_S, 0.50),
    (GGMLType.IQ1_M, 0.47),
])
def test_iq_encoder_roundtrip_error_bound(gtype, bound):
    """Encode→decode relative RMSE stays within each format's bit budget
    (≡ test-quantize-fns total-error thresholds, scaled for gaussian data)."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(256 * 64) * 0.7).astype(np.float32)
    packed = codecs.quantize(x, gtype)
    tt = TYPE_TRAITS[gtype]
    assert packed.size == x.size // tt.block_size * tt.type_size
    back = codecs.dequantize(packed, gtype, x.size)
    rmse = float(np.sqrt(((x - back) ** 2).sum() / (x * x).sum()))
    assert rmse < bound, f"{gtype.name}: {rmse:.3f} >= {bound}"


def test_iq_encoder_exact_codewords_roundtrip():
    """Vectors lying on the lattice (grid rows × representable scales ×
    valid signs) survive encode→decode almost exactly (scale-field rounding
    only)."""
    from tpullm.quant.iq_codecs import GRID_IQ3XXS, KSIGNS

    rng = np.random.default_rng(3)
    rows = rng.integers(0, 256, size=(8, 8))
    vals = GRID_IQ3XXS[rows].reshape(8, 32)
    signs = KSIGNS[rng.integers(0, 128, size=(8, 4))].reshape(8, 32)
    db = rng.uniform(0.5, 2.0, size=(8, 1)).astype(np.float32)
    x = (vals * signs * db).reshape(-1).astype(np.float32)
    packed = codecs.quantize(x, GGMLType.IQ3_XXS)
    back = codecs.dequantize(packed, GGMLType.IQ3_XXS, x.size)
    rmse = float(np.sqrt(((x - back) ** 2).sum() / (x * x).sum()))
    assert rmse < 0.07  # scale-grid rounding only


def test_iq_encoder_bitrate_ladder():
    """More bits → lower error across the i-quant ladder."""
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(256 * 32)).astype(np.float32)

    def rmse(t):
        back = codecs.dequantize(codecs.quantize(x, t), t, x.size)
        return float(np.sqrt(((x - back) ** 2).sum() / (x * x).sum()))

    e1 = rmse(GGMLType.IQ1_S)
    e2 = rmse(GGMLType.IQ2_XXS)
    e3 = rmse(GGMLType.IQ3_XXS)
    assert e3 < e2 < e1


@pytest.mark.parametrize("gtype", [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
], ids=lambda t: t.name)
def test_iq_encoder_interop_with_reference_decoder(gtype, reference_gguf):
    """Our i-quant encodings decode bit-identically through the reference
    gguf-py decoder (the strongest cross-implementation check)."""
    import gguf.quants as refq

    rng = np.random.default_rng(int(gtype))
    x = (rng.standard_normal(256 * 8) * 0.7).astype(np.float32)
    packed = codecs.quantize(x, gtype)
    mine = codecs.dequantize(packed, gtype, x.size)
    theirs = refq.dequantize(
        packed.copy(), reference_gguf.GGMLQuantizationType(int(gtype))
    ).reshape(-1)
    np.testing.assert_array_equal(mine, theirs.astype(np.float32))


def test_native_f16_subnormal_decode():
    """Subnormal f16 superblock scales must decode exactly (a biased-exp
    off-by-one in the native half→float path silently HALVED every
    subnormal d; real-model K-quant scales routinely sit below the 6.1e-5
    f16 normal threshold). Round-trip error must be scale-invariant."""
    from tpullm.quant import native

    rng = np.random.default_rng(11)
    base = rng.normal(size=4 * 256).astype(np.float32)
    for gtype in (GGMLType.Q6_K, GGMLType.Q5_K, GGMLType.Q4_K, GGMLType.Q8_0):
        rels = []
        for s in (1.0, 0.02, 0.001):
            w = base * s
            packed = np.asarray(native.quantize(w, gtype))
            nat = np.asarray(native.dequantize(packed, gtype, w.size))
            py = codecs.dequantize_py(packed, gtype, w.size) if hasattr(
                codecs, "dequantize_py") else None
            rels.append(float(np.sqrt(np.mean((nat - w) ** 2)) / s))
        # scale invariance: tiny-magnitude blocks may not be materially
        # worse than unit-magnitude ones
        assert max(rels) < 1.5 * min(rels) + 1e-6, (gtype.name, rels)


def test_native_f16_conversion_subnormals():
    """native f16→f32 of subnormal halves must match numpy bit-for-bit."""
    from tpullm.quant import native

    # craft Q8_0 blocks whose d spans normal and subnormal halves
    halves = np.asarray([6.0e-8, 1.5e-5, 5.9e-5, 6.2e-5, 1.0, -1.5e-5],
                        dtype=np.float16)
    for d in halves:
        block = np.zeros(34, dtype=np.uint8)
        block[0:2] = np.asarray([d], dtype=np.float16).view(np.uint8)
        block[2:] = 1  # qs = 1 everywhere
        out = np.asarray(native.dequantize(block, GGMLType.Q8_0, 32))
        np.testing.assert_array_equal(out, np.full(32, np.float32(d) * 1.0))
