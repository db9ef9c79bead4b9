"""Fused dequantize×matmul: weight repacking + compute paths.

This is the TPU analog of the reference's MMQ/MMVQ kernels
(ggml-cuda/mmq.cu, mmvq.cu and the fork's gfx906 warp-coop variants):
weights stay packed in HBM; codes are expanded and scaled in VMEM on the way
into the MXU.

## Plane schema (v2 — unified affine form)

At load time ggml block formats are repacked into column-major planes
(K = n_in rows × N = n_out lanes) reducing EVERY type to one kernel form:

    w[k, n] = scale[k//G, n] · map(code[k, n]) − minus[k//G, n]

- code planes: 4-bit codes use *half-split* packing (byte[r] = q[r] | q[r + U/2] << 4
  within each U-row unit); extra high bits (Q5_*, Q6_K, Q3_K) use bit-plane
  packing; Q8_0 keeps int8 rows. Unpack in-kernel is shift/mask only.
- `scale` [K/G, N] f32 is the PRE-MULTIPLIED effective group scale
  (d·sc for K-quants, d for simple blocks, 2^(e-128) for MXFP4): the factored
  f16×int math of ggml-quants.c is evaluated exactly once at repack, in f32,
  so the hot kernel does a single FMA per element and no sub-scale decoding.
- `minus` [K/G, N] f32 folds both the K-quant min term (dmin·m) and the
  symmetric-type bias (d·8 for Q4_0 etc.): absent for purely scaled types.
- `map` is identity or a small LUT (MXFP4/IQ4_NL nonlinear grids).

Scale planes cost (4+4)/G bytes per weight (≈0.25 B at G=32) on top of the
packed codes — a deliberate trade: the kernel streams at HBM speed instead
of stalling on per-element scale decode (measured 28 → ~800 GB/s on v5e).

`dequant_planes` is the jnp reference used both as the CPU fallback and the
conformance oracle for the Pallas kernel (tpullm/ops/pallas/qmm.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..gguf.constants import GGMLType, IQ4_NL_VALUES, MXFP4_VALUES, QK_K, TYPE_TRAITS
from ..quant import codecs

F32 = np.float32


# ---------------------------------------------------------------------------
# host-side repack: packed ggml blocks -> planes
# ---------------------------------------------------------------------------

def _half_split_pack4(codes: np.ndarray, unit: int) -> np.ndarray:
    """codes: (K, N) uint8 in 0..15 -> (K/2, N), split *within* each `unit`-row
    chunk: packed row r of chunk c = codes[c·U + r] | codes[c·U + U/2 + r] << 4.
    Keeps every kernel K-tile self-contained (tile size a multiple of U)."""
    K, N = codes.shape
    c = codes.reshape(K // unit, unit, N)
    return (c[:, : unit // 2] | (c[:, unit // 2 :] << 4)).astype(np.uint8).reshape(K // 2, N)


def _bitplane_pack(bits: np.ndarray, width: int, unit: int) -> np.ndarray:
    """bits: (K, N) values < 2**width -> (K*width//8, N) uint8, fields split
    within each `unit`-row chunk: field j of packed row r (of a chunk) holds
    bits[chunk·U + j·U·width/8 + r]."""
    K, N = bits.shape
    fields = 8 // width
    rows = unit * width // 8  # packed rows per chunk
    c = bits.reshape(K // unit, fields, rows, N)
    out = np.zeros((K // unit, rows, N), dtype=np.uint8)
    for j in range(fields):
        out |= (c[:, j] << (j * width)).astype(np.uint8)
    return out.reshape(K * width // 8, N)


def _decode_blocks(data: np.ndarray, gtype: GGMLType, n_out: int, n_in: int):
    """Packed ggml blocks → (codes (K, N) uint8, scale (K/G, N) f32,
    minus (K/G, N) f32 | None). All factored scales are resolved here."""
    tt = TYPE_TRAITS[gtype]
    nb = n_in // tt.block_size  # blocks per row
    b = np.ascontiguousarray(data, dtype=np.uint8).reshape(n_out, nb, tt.type_size)

    def col(x):  # (n_out, groups...) -> (K', n_out) K-major planes
        x = np.moveaxis(x, 0, -1)
        return np.ascontiguousarray(x.reshape(-1, n_out))

    def f16(x):
        return x.copy().view("<f2").astype(F32)

    if gtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        off = 2 if gtype == GGMLType.Q4_0 else 4
        qs = b[..., off : off + 16]
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2)
        d = f16(b[..., 0:2])[..., 0]  # (n_out, nb)
        if gtype == GGMLType.Q4_0:
            return col(codes), col(d), None  # bias 8 folded in-kernel
        m = f16(b[..., 2:4])[..., 0]
        return col(codes), col(d), col((-m).astype(F32))

    if gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        off = 6 if gtype == GGMLType.Q5_0 else 8
        qs = b[..., off : off + 16]
        qh = b[..., off - 4 : off].copy().view("<u4")[..., 0]
        shifts = np.arange(32, dtype=np.uint32)
        hbits = ((qh[..., None] >> shifts) & 1).astype(np.uint8)
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2) | (hbits << 4)
        d = f16(b[..., 0:2])[..., 0]
        if gtype == GGMLType.Q5_0:
            return col(codes), col(d), None  # bias 16 folded in-kernel
        m = f16(b[..., 2:4])[..., 0]
        return col(codes), col(d), col((-m).astype(F32))

    if gtype == GGMLType.Q8_0:
        codes = b[..., 2:34].copy()  # int8 bits stored as u8
        d = f16(b[..., 0:2])[..., 0]
        return col(codes), col(d), None

    if gtype == GGMLType.MXFP4:
        qs = b[..., 1:17]
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2)
        e = b[..., 0].astype(np.int32)
        scale = np.exp2(e.astype(F32) - 128.0)
        return col(codes), col(scale), None

    if gtype == GGMLType.IQ4_NL:
        qs = b[..., 2:18]
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2)
        return col(codes), col(f16(b[..., 0:2])[..., 0]), None

    if gtype in (GGMLType.Q4_K, GGMLType.Q5_K):
        d = f16(b[..., 0:2])[..., 0]  # (n_out, nb)
        dmin = f16(b[..., 2:4])[..., 0]
        sc, mi = codecs._get_scale_min_k4(b[..., 4:16].reshape(-1, 12))
        sc = sc.reshape(n_out, nb, 8).astype(F32)
        mi = mi.reshape(n_out, nb, 8).astype(F32)
        scale = (d[..., None] * sc).astype(F32)  # exact ggml d1 = d·sc
        minus = (dmin[..., None] * mi).astype(F32)
        if gtype == GGMLType.Q4_K:
            qs = b[..., 16:144]
        else:
            qs = b[..., 48:176]
        qs = qs.reshape(n_out, nb, 4, 32)
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=3).reshape(n_out, nb, 256)
        if gtype == GGMLType.Q5_K:
            qh = b[..., 16:48]
            hb = np.stack([((qh >> j) & 1) for j in range(8)], axis=2).reshape(
                n_out, nb, 8, 32
            )
            codes = codes | (hb.reshape(n_out, nb, 256) << 4)
        return col(codes), col(scale), col(minus)

    if gtype == GGMLType.Q6_K:
        ql = b[..., 0:128].reshape(n_out, nb, 2, 64)
        qh = b[..., 128:192].reshape(n_out, nb, 2, 32)
        sc = b[..., 192:208].copy().view(np.int8).astype(F32)  # (n_out, nb, 16)
        d = f16(b[..., 208:210])[..., 0]
        lo = np.concatenate([ql & 0x0F, ql >> 4], axis=3)
        hi = np.stack([(qh >> (2 * j)) & 3 for j in range(4)], axis=3).reshape(
            n_out, nb, 2, 128
        )
        codes = (lo | (hi << 4)).reshape(n_out, nb, 256)
        scale = (d[..., None] * sc.reshape(n_out, nb, 16)).astype(F32)
        return col(codes), col(scale), None  # bias 32 folded in-kernel

    if gtype == GGMLType.Q2_K:
        scales = b[..., 0:16]
        qs = b[..., 16:80].reshape(n_out, nb, 2, 32)
        d = f16(b[..., 80:82])[..., 0]
        dmin = f16(b[..., 82:84])[..., 0]
        codes = np.stack([(qs >> s) & 3 for s in (0, 2, 4, 6)], axis=3).reshape(
            n_out, nb, 256
        )
        scale = (d[..., None] * (scales & 0x0F).astype(F32)).astype(F32)
        minus = (dmin[..., None] * (scales >> 4).astype(F32)).astype(F32)
        return col(codes), col(scale), col(minus)

    if gtype == GGMLType.Q3_K:
        hmask = b[..., 0:32]
        qs = b[..., 32:96].reshape(n_out, nb, 2, 32)
        sc = codecs._q3_k_scales(b[..., 96:108].reshape(-1, 12)).reshape(n_out, nb, 16)
        d = f16(b[..., 108:110])[..., 0]
        lo = np.stack([(qs >> s) & 3 for s in (0, 2, 4, 6)], axis=3).reshape(
            n_out, nb, 256
        )
        hb = np.stack([(hmask >> j) & 1 for j in range(8)], axis=2).reshape(
            n_out, nb, 256
        )
        codes = lo | (hb << 2)  # 3-bit code, value = code - 4
        scale = (d[..., None] * sc.astype(F32)).astype(F32)
        return col(codes), col(scale), None  # bias 4 folded in-kernel

    if gtype == GGMLType.IQ4_XS:
        d = f16(b[..., 0:2])[..., 0]
        scales_h = b[..., 2:4].copy().view("<u2")[..., 0]
        scales_l = b[..., 4:8]
        qs = b[..., 8:136].reshape(n_out, nb, 8, 16)
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=3).reshape(n_out, nb, 256)
        ls = np.zeros((n_out, nb, 8), dtype=np.int32)
        for ib in range(8):
            lsl = (scales_l[..., ib // 2] >> (4 * (ib & 1))) & 0x0F
            lsh = (scales_h >> (2 * ib)) & 3
            ls[..., ib] = (lsl.astype(np.int32) | (lsh.astype(np.int32) << 4)) - 32
        scale = (d[..., None] * ls.astype(F32)).astype(F32)
        return col(codes), col(scale), None

    if gtype in _IQ_TYPES:
        # i-quant / ternary formats: the codebook structure collapses to the
        # affine plane form because every decoded value is
        # group_scale · v with v from a small signed set (the IQ2 grids hold
        # {8,25,43}, IQ3_XXS {4..62}, IQ3_S odd 1..15, IQ1 {-1,0,1}±0.125;
        # sign flips and the IQ1 delta are exact in f32). Codes are
        # recovered by nearest-LUT match of value/scale — bit-exact
        # reconstruction is asserted in tests/test_qmm.py.
        from ..quant.iq_codecs import IQ_DEQUANT, iq_group_scales

        meta = _SCHEMA[gtype]
        G = meta["G"]
        lut = np.asarray(
            meta["lut"] if "lut" in meta
            else [i - meta["bias"] for i in range(3)],  # ternary bias form
            dtype=F32,
        )
        blocks = b.reshape(n_out * nb, tt.type_size)
        v = IQ_DEQUANT[gtype](blocks)  # (n_out·nb, 256) f32
        scale = iq_group_scales(blocks, gtype)  # (n_out·nb, 256/G)
        vr = v.reshape(v.shape[0], -1, G)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.nan_to_num(vr / scale[..., None])
        codes = np.abs(ratio[..., None] - lut).argmin(-1).astype(np.uint8)
        codes = codes.reshape(n_out, nb * QK_K)
        scale = scale.reshape(n_out, -1)
        return col(codes), col(scale), None

    raise NotImplementedError(f"repack of {gtype.name} not supported")


_IQ2_VALUES = (8.0, 25.0, 43.0, -8.0, -25.0, -43.0)
_IQ3XXS_VALUES = tuple(float(s * m) for s in (1, -1)
                       for m in (4, 12, 20, 28, 36, 44, 52, 62))
_IQ3S_VALUES = tuple(float(s * m) for s in (1, -1)
                     for m in (1, 3, 5, 7, 9, 11, 13, 15))
# IQ1 grid value g ∈ {-1,0,1} plus the per-group ±0.125 delta, both folded
# into one 6-entry map: code = (g+1) + 3·[delta<0]
_IQ1_VALUES = (-0.875, 0.125, 1.125, -1.125, -0.125, 0.875)

_IQ_TYPES = (
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
    GGMLType.TQ1_0, GGMLType.TQ2_0,
)

# metadata: code bits, scale-group size G, split unit U, optional LUT/sign
_SCHEMA = {
    GGMLType.Q4_0: dict(bits=4, G=32, bias=8),
    GGMLType.Q4_1: dict(bits=4, G=32),
    GGMLType.Q5_0: dict(bits=5, G=32, bias=16),
    GGMLType.Q5_1: dict(bits=5, G=32),
    GGMLType.Q8_0: dict(bits=8, G=32, signed=True),  # bias folded by sign-extension
    GGMLType.MXFP4: dict(bits=4, G=32, lut=MXFP4_VALUES),
    GGMLType.IQ4_NL: dict(bits=4, G=32, lut=IQ4_NL_VALUES),
    GGMLType.Q4_K: dict(bits=4, G=32, SB=256),
    GGMLType.Q5_K: dict(bits=5, G=32, SB=256),
    GGMLType.Q6_K: dict(bits=6, G=16, SB=256, bias=32),
    GGMLType.Q2_K: dict(bits=2, G=16, SB=256),
    GGMLType.Q3_K: dict(bits=3, G=16, SB=256, bias=4),
    GGMLType.IQ4_XS: dict(bits=4, G=32, SB=256, lut=IQ4_NL_VALUES),
    GGMLType.IQ2_XXS: dict(bits=3, G=32, SB=256, lut=_IQ2_VALUES),
    GGMLType.IQ2_XS: dict(bits=3, G=16, SB=256, lut=_IQ2_VALUES),
    GGMLType.IQ2_S: dict(bits=3, G=16, SB=256, lut=_IQ2_VALUES),
    GGMLType.IQ3_XXS: dict(bits=4, G=32, SB=256, lut=_IQ3XXS_VALUES),
    GGMLType.IQ3_S: dict(bits=4, G=32, SB=256, lut=_IQ3S_VALUES),
    GGMLType.IQ1_S: dict(bits=3, G=32, SB=256, lut=_IQ1_VALUES),
    GGMLType.IQ1_M: dict(bits=3, G=16, SB=256, lut=_IQ1_VALUES),
    GGMLType.TQ1_0: dict(bits=2, G=256, SB=256, bias=1),
    GGMLType.TQ2_0: dict(bits=2, G=256, SB=256, bias=1),
}


def supports(gtype: GGMLType) -> bool:
    return gtype in _SCHEMA


def split_unit(gtype: GGMLType) -> int:
    """Row chunk within which code planes are split (kernel K-tiles must be
    a multiple of this)."""
    return _SCHEMA[gtype].get("SB", _SCHEMA[gtype]["G"])


# Types repacked to WIDE int8 code planes ("qw": one signed byte per weight,
# bias pre-folded) instead of packed sub-byte codes. Q6_K's 4+2-bit unpack
# (nibble split + 2-bit plane + shift/or + bias sub) is VPU-bound on v5e:
# measured ~480 GB/s vs ~950 for the int8 single-plane decode at the same
# shapes (tools/profile_qmm.py, llama-8B ffn_down/head) — a ~2× kernel win
# for +28% plane bytes (6.56→8.5 bpw), net ≈1.5× on the Q4_K_M decode
# stream's Q6_K share. Override with TPULLM_QMM_WIDE=Q6_K,Q3_K or =''.
WIDE_TYPES: set = {GGMLType.Q6_K}
_wide_env = __import__("os").environ.get("TPULLM_QMM_WIDE")
if _wide_env is not None:
    WIDE_TYPES = {GGMLType[t.strip()] for t in _wide_env.split(",")
                  if t.strip()}


def _widen_planes(planes: dict[str, np.ndarray], gtype: GGMLType,
                  n_out: int, n_in: int) -> dict[str, np.ndarray]:
    """Packed qs/qh code planes → one signed int8 "qw" plane with the
    symmetric bias folded (numpy mirror of _expand_codes for bits=6)."""
    meta = _SCHEMA[gtype]
    assert meta["bits"] == 6 and "minus" not in planes, gtype
    U = split_unit(gtype)
    K = n_in
    qs = planes["qs"].reshape(K // U, U // 2, n_out)
    lo = np.concatenate([qs & 0x0F, qs >> 4], axis=1)  # (K/U, U, N)
    qh = planes["qh"].reshape(K // U, U // 4, n_out)
    hi = np.concatenate([(qh >> (2 * j)) & 3 for j in range(4)], axis=1)
    codes = (lo | (hi << 4)).reshape(K, n_out).astype(np.int16)
    out = {"qw": (codes - meta["bias"]).astype(np.int8).view(np.uint8),
           "scale": planes["scale"]}
    return out


# bump when the plane layout produced by repack_np changes (invalidates the
# on-disk repack cache in models/weights.py)
REPACK_SCHEMA_VERSION = 2


def upload_planes(planes_np: dict[str, np.ndarray]) -> dict[str, jax.Array]:
    """Host plane arrays → device arrays.

    scale/minus planes ride HBM at bf16: halves the per-group overhead
    (8→4 bytes per G weights per lane, ~20% less decode traffic for Q4_K)
    at ≤2^-9 relative scale rounding — far below the block formats' own
    quantization error."""
    return {
        k: (jnp.asarray(v, jnp.bfloat16) if k in ("scale", "minus")
            else jnp.asarray(v))
        for k, v in planes_np.items()
    }


def repack_np(data: np.ndarray, gtype: GGMLType, n_out: int,
              n_in: int) -> dict[str, np.ndarray]:
    """Repack ggml blocks (row-major packed bytes) into host plane arrays.

    Pure CPU work (native C++ fast path, numpy fallback) — the expensive
    half of weight loading; models/weights.py caches its result on disk and
    runs it thread-parallel across tensors (the ctypes call and the numpy
    bit ops release the GIL)."""
    from ..quant import native

    def widen(planes_np):
        if gtype in WIDE_TYPES and "qs" in planes_np:
            return _widen_planes(planes_np, gtype, n_out, n_in)
        return planes_np

    nat = native.repack(data, gtype, n_out, n_in)
    if nat is not None:
        return widen(nat)
    codes, scale, minus = _decode_blocks(data, gtype, n_out, n_in)
    meta = _SCHEMA[gtype]
    bits = meta["bits"]
    U = split_unit(gtype)
    planes: dict[str, np.ndarray] = {}
    if bits == 4:
        planes["qs"] = _half_split_pack4(codes, U)
    elif bits == 5:
        planes["qs"] = _half_split_pack4(codes & 0x0F, U)
        planes["qh"] = _bitplane_pack(codes >> 4, 1, U)
    elif bits == 6:
        planes["qs"] = _half_split_pack4(codes & 0x0F, U)
        planes["qh"] = _bitplane_pack(codes >> 4, 2, U)
    elif bits == 3:
        planes["qs"] = _bitplane_pack(codes & 0x03, 2, U)
        planes["qh"] = _bitplane_pack(codes >> 2, 1, U)
    elif bits == 2:
        planes["qs"] = _bitplane_pack(codes, 2, U)
    elif bits == 8:
        planes["qs"] = codes
    planes["scale"] = scale
    if minus is not None:
        planes["minus"] = minus
    return widen(planes)


def repack(data: np.ndarray, gtype: GGMLType, n_out: int, n_in: int) -> dict[str, jax.Array]:
    """Repack ggml blocks (row-major packed bytes) into TPU planes (host→device)."""
    return upload_planes(repack_np(data, gtype, n_out, n_in))


def repack_on_device(info) -> dict[str, jax.Array] | None:
    """Device-side repack when available: uploads the *packed* blocks (the
    smallest bytes that exist) and runs the plane transform on-chip —
    replaces hundreds of seconds of single-core host bit-twiddling with
    ~ms of VPU work (see ops/device_repack.py). None → host path."""
    import time

    from . import device_repack

    if not (device_repack.enabled()
            and device_repack.supports(info.ggml_type)):
        return None
    from ..models.weights import load_stats

    n_out, n_in = info.shape[1], info.shape[0]
    t0 = time.perf_counter()
    planes = device_repack.repack_device(info.data, info.ggml_type,
                                         n_out, n_in)
    load_stats.add("upload", time.perf_counter() - t0)
    load_stats.add_bytes(int(np.asarray(info.data).nbytes))
    return planes


# ---------------------------------------------------------------------------
# jnp reference: planes -> dequantized weight tile (also the CPU fallback)
# ---------------------------------------------------------------------------

# All in-kernel integer work happens in int32: Mosaic (the Pallas TPU
# compiler) does not lower u8→f32 casts or sub-word sign casts, so planes are
# widened on load and int8-stored-as-u8 fields are sign-extended arithmetically.

def _u32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.int32)


def _sign8(x_i32: jax.Array) -> jax.Array:
    """Sign-extend an int8 value held in the low byte of an int32."""
    return x_i32 - ((x_i32 & 0x80) << 1)


def _half_split_unpack4(qs: jax.Array, unit: int) -> jax.Array:
    rows, N = qs.shape
    half = unit // 2
    c = _u32(qs).reshape(rows // half, half, N)
    return jnp.concatenate([c & 0x0F, c >> 4], axis=1).reshape(rows * 2, N)


def _bitplane_unpack(q: jax.Array, width: int, unit: int) -> jax.Array:
    rows, N = q.shape
    fields = 8 // width
    mask = (1 << width) - 1
    chunk_rows = unit * width // 8
    c = _u32(q).reshape(rows // chunk_rows, chunk_rows, N)
    return jnp.concatenate(
        [(c >> (j * width)) & mask for j in range(fields)], axis=1
    ).reshape(rows * fields, N)


def _expand_codes(planes: dict[str, jax.Array], gtype: GGMLType) -> jax.Array:
    """(K, N) integer codes from packed planes (int32)."""
    meta = _SCHEMA[gtype]
    bits = meta["bits"]
    U = split_unit(gtype)
    if bits == 4:
        c = _half_split_unpack4(planes["qs"], U)
    elif bits == 5:
        c = _half_split_unpack4(planes["qs"], U) | (_bitplane_unpack(planes["qh"], 1, U) << 4)
    elif bits == 6:
        c = _half_split_unpack4(planes["qs"], U) | (_bitplane_unpack(planes["qh"], 2, U) << 4)
    elif bits == 3:
        c = _bitplane_unpack(planes["qs"], 2, U) | (_bitplane_unpack(planes["qh"], 1, U) << 2)
    elif bits == 2:
        c = _bitplane_unpack(planes["qs"], 2, U)
    elif bits == 8:
        c = _sign8(_u32(planes["qs"]))
    return c


def _plane_values(planes: dict[str, jax.Array], gtype: GGMLType,
                  dtype=jnp.float32) -> jax.Array:
    """(K, N) unscaled values from code planes — wide int8 "qw" planes
    (bias pre-folded at repack) or packed codes through the type map.
    dtype=bfloat16 is exact for code types (|code| ≤ 256 < 2^9); LUT types
    keep f32 (their table values need the mantissa)."""
    if "qw" in planes:
        return _sign8(_u32(planes["qw"])).astype(dtype)
    return _mapped_values(_expand_codes(planes, gtype), gtype, dtype)


def _mapped_values(codes: jax.Array, gtype: GGMLType,
                   dtype=jnp.float32) -> jax.Array:
    """codes (int32) → float values through the type's code map (bias for
    symmetric types subtracted here, in int — ≡ ggml's (q − 8)·d form)."""
    meta = _SCHEMA[gtype]
    bias = meta.get("bias")
    if bias:
        return (codes - bias).astype(dtype)
    if meta.get("lut"):
        lut = meta["lut"]
        # branchless LUT via where-chain (16-entry gathers don't vectorize)
        out = jnp.full(codes.shape, float(lut[0]), dtype=jnp.float32)
        for i in range(1, len(lut)):
            out = jnp.where(codes == i, float(lut[i]), out)
        return out.astype(dtype) if dtype != jnp.float32 else out
    return codes.astype(dtype)


def dequant_planes(planes: dict[str, jax.Array], gtype: GGMLType, n_out: int, n_in: int,
                   dtype=jnp.float32) -> jax.Array:
    """Reference dequant of the full plane set -> dense [K, N] = [n_in, n_out]."""
    meta = _SCHEMA[gtype]
    G = meta["G"]
    vals = _plane_values(planes, gtype)
    n_groups = n_in // G
    vals = vals.reshape(n_groups, G, n_out) * planes["scale"].reshape(n_groups, 1, n_out)
    if "minus" in planes:
        vals = vals - planes["minus"].reshape(n_groups, 1, n_out)
    return vals.reshape(n_in, n_out).astype(dtype)


def matmul_reference(x: jax.Array, ql) -> jax.Array:
    """Dequant-then-matmul fallback (correct everywhere, memory-hungry)."""
    w = dequant_planes(ql.planes, ql.gtype, ql.n_out, ql.n_in, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def matmul(x: jax.Array, ql) -> jax.Array:
    """Fused dequant matmul: x [..., n_in] -> [..., n_out].

    Dispatches to the Pallas kernel on TPU; jnp reference elsewhere.
    """
    from .pallas import qmm

    if qmm.available() and qmm.supports(ql.gtype, ql.n_in, ql.n_out):
        return qmm.qmatmul(x, ql)
    return matmul_reference(x, ql)


# ---------------------------------------------------------------------------
# packed expert stacks (3-D planes [E, rows, N]) — the MUL_MAT_ID analog
# ---------------------------------------------------------------------------


def _dequant_stack(stack, dtype) -> jax.Array:
    """Reference dequant of every expert: [E, n_in, n_out]."""
    return jax.vmap(
        lambda planes: dequant_planes(planes, stack.gtype, stack.n_out,
                                      stack.n_in, dtype=dtype)
    )(stack.planes)


def stack_matmul_reference(x: jax.Array, stack) -> jax.Array:
    w = _dequant_stack(stack, x.dtype)  # [E, K, N]
    if x.ndim == 3:  # per-expert inputs [E, M, K]
        return jnp.einsum("emk,ekn->emn", x, w,
                          preferred_element_type=x.dtype)
    return jnp.einsum("mk,ekn->emn", x, w, preferred_element_type=x.dtype)


def gather_matmul_reference(x: jax.Array, ids: jax.Array, stack) -> jax.Array:
    gathered = {k: v[ids] for k, v in stack.planes.items()}  # [T, rows, N]
    w = jax.vmap(
        lambda planes: dequant_planes(planes, stack.gtype, stack.n_out,
                                      stack.n_in, dtype=x.dtype)
    )(gathered)  # [T, K, N]
    return jnp.einsum("tk,tkn->tn", x, w, preferred_element_type=x.dtype)


def stack_matmul(x: jax.Array, stack) -> jax.Array:
    """All-experts packed matmul (prefill regime): x [M, K] (shared) or
    [E, M, K] (per-expert) → [E, M, n_out]. Weights stream packed through
    the Pallas stack kernel on TPU (≡ running every expert through mmq
    without widening); jnp reference elsewhere."""
    from .pallas import qmm

    if qmm.available() and qmm.supports(stack.gtype, stack.n_in,
                                        stack.n_out):
        return qmm.qmatmul_stack(x, stack)
    return stack_matmul_reference(x, stack)


def gather_matmul(x: jax.Array, ids: jax.Array, stack) -> jax.Array:
    """Expert-indexed packed matmul (decode regime): row t of x [T, K]
    through expert ids[t] → [T, n_out]. Reads only the routed experts'
    PACKED bytes (≡ mmid.cu consuming quantized experts in place — the
    decode bandwidth optimum, ~3.3x less expert-read traffic than a
    widened bf16 gather at Q4_K)."""
    from .pallas import qmm

    if qmm.available() and qmm.supports(stack.gtype, stack.n_in,
                                        stack.n_out):
        return qmm.qmatmul_gather(x, ids, stack)
    return gather_matmul_reference(x, ids, stack)
