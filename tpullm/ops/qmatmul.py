"""Fused dequantize×matmul: weight repacking + compute paths.

This is the TPU analog of the reference's MMQ/MMVQ kernels
(ggml-cuda/mmq.cu, mmvq.cu and the fork's gfx906 warp-coop variants):
weights stay packed in HBM; codes are expanded and scaled in VMEM on the way
into the MXU.

## Plane schema

At load time ggml block formats are repacked into column-major "planes"
(K = n_in rows × N = n_out lanes) chosen so a Pallas kernel can slice
(TK, TN) tiles directly and unpack with shift/mask only — no sublane
shuffles:

- 4-bit codes use *half-split* packing: byte[k, n] = q[k, n] | q[k + K/2, n] << 4
  so a tile unpacks to two K-ranges (low nibbles → k, high → k + K/2).
- high bits (Q5_*, Q6_K hi, Q3_K hi) use bit-plane packing: byte[k, n] bit j
  belongs to code[k + j·K/8, n] (2-bit fields: k + j·K/4).
- scales keep ggml's factored form (f16 super-scale × int sub-scale), so the
  effective scale d·sc is computed in f32 exactly as ggml-quants.c does:

    w[k, n] = super(f16)[k//SB, n] · sub(int)[k//G, n] · map(code[k, n]) [ − min term ]

Every type reduces to that affine/LUT form; `dequant_planes` is the jnp
reference used both as the CPU fallback and the conformance oracle for the
Pallas kernel (tpullm/ops/pallas/qmm.py).
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


def _fields(data: np.ndarray, gtype: GGMLType, n_out: int, n_in: int):
    """Decode packed blocks into (codes (K,N) uint8, plane dict of scale fields)."""
    tt = TYPE_TRAITS[gtype]
    nb = n_in // tt.block_size  # blocks per row
    b = np.ascontiguousarray(data, dtype=np.uint8).reshape(n_out, nb, tt.type_size)

    def col(x):  # (n_out, nb, ...) -> (nb*..., n_out) i.e. K-major planes
        x = np.moveaxis(x, 0, -1)  # (nb, ..., n_out)
        return np.ascontiguousarray(x.reshape(-1, n_out))

    if gtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        off = 2 if gtype == GGMLType.Q4_0 else 4
        qs = b[..., off : off + 16]
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2)  # (n_out, nb, 32)
        planes = {"d": col(b[..., 0:2].copy().view("<f2"))}
        if gtype == GGMLType.Q4_1:
            planes["m"] = col(b[..., 2:4].copy().view("<f2"))
        return col(codes), planes

    if gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        off = 6 if gtype == GGMLType.Q5_0 else 8
        hb_off = off - 4
        qs = b[..., off : off + 16]
        qh = b[..., hb_off : hb_off + 4].copy().view("<u4")[..., 0]  # (n_out, nb)
        shifts = np.arange(32, dtype=np.uint32)
        hbits = ((qh[..., None] >> shifts) & 1).astype(np.uint8)
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2) | (hbits << 4)
        planes = {"d": col(b[..., 0:2].copy().view("<f2"))}
        if gtype == GGMLType.Q5_1:
            planes["m"] = col(b[..., 2:4].copy().view("<f2"))
        return col(codes), planes

    if gtype == GGMLType.Q8_0:
        codes = b[..., 2:34].copy().view(np.int8)
        return col(codes.view(np.uint8)), {"d": col(b[..., 0:2].copy().view("<f2"))}

    if gtype == GGMLType.MXFP4:
        qs = b[..., 1:17]
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2)
        return col(codes), {"e": col(b[..., 0:1])}

    if gtype == GGMLType.IQ4_NL:
        qs = b[..., 2:18]
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=2)
        return col(codes), {"d": col(b[..., 0:2].copy().view("<f2"))}

    if gtype in (GGMLType.Q4_K, GGMLType.Q5_K):
        d = b[..., 0:2].copy().view("<f2")
        dmin = b[..., 2:4].copy().view("<f2")
        sc, mi = codecs._get_scale_min_k4(b[..., 4:16].reshape(-1, 12))
        sc = sc.reshape(n_out, nb, 8)
        mi = mi.reshape(n_out, nb, 8)
        if gtype == GGMLType.Q4_K:
            qs = b[..., 16:144]
        else:
            qs = b[..., 48:176]
        # chunk c of 32 bytes holds elems [64c, 64c+32) (lo) and [64c+32, 64c+64) (hi)
        qs = qs.reshape(n_out, nb, 4, 32)
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=3).reshape(n_out, nb, 256)
        if gtype == GGMLType.Q5_K:
            qh = b[..., 16:48]  # (n_out, nb, 32)
            hb = np.stack(
                [((qh >> j) & 1) for j in range(8)], axis=2
            ).reshape(n_out, nb, 8, 32)
            # bit 2c -> lo of chunk c (elems 64c..64c+32), bit 2c+1 -> hi
            codes = codes | (hb.reshape(n_out, nb, 256) << 4)
        return col(codes), {
            "d": col(d),
            "dmin": col(dmin),
            "sc": col(sc),
            "m": col(mi),
        }

    if gtype == GGMLType.Q6_K:
        ql = b[..., 0:128].reshape(n_out, nb, 2, 64)
        qh = b[..., 128:192].reshape(n_out, nb, 2, 32)
        sc = b[..., 192:208].copy().view(np.int8)
        d = b[..., 208:210].copy().view("<f2")
        lo = np.concatenate([ql & 0x0F, ql >> 4], axis=3)  # order q1,q2,q3,q4
        hi = np.stack(
            [(qh >> (2 * j)) & 3 for j in range(4)], axis=3
        )  # (n_out, nb, 2, 4, 32)
        hi = hi.reshape(n_out, nb, 2, 128)
        codes = (lo | (hi << 4)).reshape(n_out, nb, 256)
        return col(codes), {"d": col(d), "sc": col(sc.view(np.uint8))}

    if gtype == GGMLType.Q2_K:
        scales = b[..., 0:16]
        qs = b[..., 16:80].reshape(n_out, nb, 2, 32)
        d = b[..., 80:82].copy().view("<f2")
        dmin = b[..., 82:84].copy().view("<f2")
        codes = np.stack(
            [(qs >> s) & 3 for s in (0, 2, 4, 6)], axis=3
        ).reshape(n_out, nb, 256)
        return col(codes), {
            "d": col(d),
            "dmin": col(dmin),
            "sc": col(scales & 0x0F),
            "m": col(scales >> 4),
        }

    if gtype == GGMLType.Q3_K:
        hmask = b[..., 0:32]
        qs = b[..., 32:96].reshape(n_out, nb, 2, 32)
        sc = codecs._q3_k_scales(b[..., 96:108].reshape(-1, 12)).reshape(n_out, nb, 16)
        d = b[..., 108:110].copy().view("<f2")
        lo = np.stack([(qs >> s) & 3 for s in (0, 2, 4, 6)], axis=3).reshape(
            n_out, nb, 256
        )
        hb = np.stack([(hmask >> j) & 1 for j in range(8)], axis=2).reshape(
            n_out, nb, 256
        )
        codes = lo | (hb << 2)  # 3-bit code, value = code - 4 (hb=1 means +4)
        return col(codes), {"d": col(d), "sc": col(sc.view(np.uint8))}

    if gtype == GGMLType.IQ4_XS:
        d = b[..., 0:2].copy().view("<f2")
        scales_h = b[..., 2:4].copy().view("<u2")[..., 0]
        scales_l = b[..., 4:8]
        qs = b[..., 8:136].reshape(n_out, nb, 8, 16)
        codes = np.concatenate([qs & 0x0F, qs >> 4], axis=3).reshape(n_out, nb, 256)
        ls = np.zeros((n_out, nb, 8), dtype=np.int32)
        for ib in range(8):
            lsl = (scales_l[..., ib // 2] >> (4 * (ib & 1))) & 0x0F
            lsh = (scales_h >> (2 * ib)) & 3
            ls[..., ib] = (lsl.astype(np.int32) | (lsh.astype(np.int32) << 4)) - 32
        return col(codes), {"d": col(d), "sc": col(ls.astype(np.int8).view(np.uint8))}

    raise NotImplementedError(f"repack of {gtype.name} not supported")


# metadata: (code_bits, sub-block size G, superblock SB, has mins, LUT)
_SCHEMA = {
    GGMLType.Q4_0: dict(bits=4, G=32, bias=8),
    GGMLType.Q4_1: dict(bits=4, G=32, affine=True),
    GGMLType.Q5_0: dict(bits=5, G=32, bias=16),
    GGMLType.Q5_1: dict(bits=5, G=32, affine=True),
    GGMLType.Q8_0: dict(bits=8, G=32, signed=True),
    GGMLType.MXFP4: dict(bits=4, G=32, lut=MXFP4_VALUES, e8m0=True),
    GGMLType.IQ4_NL: dict(bits=4, G=32, lut=IQ4_NL_VALUES),
    GGMLType.Q4_K: dict(bits=4, G=32, SB=256, kscale=True, kmin=True),
    GGMLType.Q5_K: dict(bits=5, G=32, SB=256, kscale=True, kmin=True),
    GGMLType.Q6_K: dict(bits=6, G=16, SB=256, kscale=True, sc_signed=True, bias=32),
    GGMLType.Q2_K: dict(bits=2, G=16, SB=256, kscale=True, kmin=True),
    GGMLType.Q3_K: dict(bits=3, G=16, SB=256, kscale=True, sc_signed=True, bias=4),
    GGMLType.IQ4_XS: dict(bits=4, G=32, SB=256, kscale=True, sc_signed=True, lut=IQ4_NL_VALUES),
}


def supports(gtype: GGMLType) -> bool:
    return gtype in _SCHEMA


def split_unit(gtype: GGMLType) -> int:
    """Row chunk within which code planes are split (kernel K-tiles must be
    a multiple of this)."""
    return _SCHEMA[gtype].get("SB", _SCHEMA[gtype]["G"])


def repack(data: np.ndarray, gtype: GGMLType, n_out: int, n_in: int) -> dict[str, jax.Array]:
    """Repack ggml blocks (row-major packed bytes) into TPU planes (host→device)."""
    codes, extra = _fields(data, gtype, n_out, n_in)
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
    planes.update(extra)
    out = {}
    for k, v in planes.items():
        if v.dtype == np.dtype("<f2"):
            # store f16 scale fields as f32 planes (small: 1/G of the weight);
            # value is the exact f32 of the stored f16, matching ggml dequant
            out[k] = jnp.asarray(v.astype(np.float32))
        else:
            out[k] = jnp.asarray(v)
    return out


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


def _group_scales(planes: dict[str, jax.Array], gtype: GGMLType, K: int):
    """Effective per-sub-group (G rows) scale & min planes, f32 [K/G, N]."""
    meta = _SCHEMA[gtype]
    G = meta["G"]
    n_groups = K // G

    def rep_rows(x, rep):
        # repeat along rows via broadcast (Mosaic-friendly; no jnp.repeat)
        S, N = x.shape
        return jnp.broadcast_to(x[:, None, :], (S, rep, N)).reshape(S * rep, N)

    if meta.get("e8m0"):
        scale = jnp.exp2(_u32(planes["e"]).astype(jnp.float32) - 128.0)
        return scale, None
    d = planes["d"].astype(jnp.float32)  # [K/SB or K/G, N]
    if meta.get("kscale"):
        sc = _u32(planes["sc"])
        if meta.get("sc_signed"):
            sc = _sign8(sc)
        sc = sc.astype(jnp.float32)  # [K/G, N]
        rep = n_groups // d.shape[0]
        scale = rep_rows(d, rep) * sc
        if meta.get("kmin"):
            dmin = planes["dmin"].astype(jnp.float32)
            mins = rep_rows(dmin, rep) * _u32(planes["m"]).astype(jnp.float32)
            return scale, mins
        return scale, None
    # simple 32-block types: d (and m) are already per group
    if meta.get("affine"):
        return d, -planes["m"].astype(jnp.float32)  # w = d*q + m  ->  minus(-m)
    return d, None


def dequant_planes(planes: dict[str, jax.Array], gtype: GGMLType, n_out: int, n_in: int,
                   dtype=jnp.float32) -> jax.Array:
    """Reference dequant of the full plane set -> dense [K, N] = [n_in, n_out]."""
    meta = _SCHEMA[gtype]
    G = meta["G"]
    codes = _expand_codes(planes, gtype)  # [K, N] int32
    vals = codes.astype(jnp.float32)
    if meta.get("lut"):
        lut = jnp.asarray(meta["lut"], dtype=jnp.float32)
        vals = lut[codes]
    if meta.get("bias"):
        vals = vals - meta["bias"]
    scale, mins = _group_scales(planes, gtype, n_in)
    vals = vals.reshape(n_in // G, G, n_out) * scale[:, None, :]
    if mins is not None:
        vals = vals - mins[:, None, :]
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
