"""Numpy reference codecs for ggml block-quantized tensor types.

Dequantization is bit-compatible with the reference CPU implementations
(ggml/src/ggml-quants.c dequantize_row_*): same integer unpacking, same f32
operation order, so logits of a GGUF produced by llama.cpp match. These
routines are the *test oracle* for the Pallas fused-dequant kernels in
tpullm.ops (the role ggml's CPU backend plays for test-backend-ops).

Quantization follows the same algorithms (nearest-int rounding, the weighted
least-squares scale/min search of the K-quants) vectorized over blocks.

All functions operate on arrays of whole blocks:
  dequantize(data_u8, gtype, n_elements) -> float32[n_elements]
  quantize(values_f32[n], gtype) -> uint8[packed]
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import (
    GGMLType,
    IQ4_NL_VALUES,
    MXFP4_VALUES,
    QK_K,
    TYPE_TRAITS,
)

F32 = np.float32


# ---------------------------------------------------------------------------
# scalar-format helpers
# ---------------------------------------------------------------------------

def f16_to_f32(u8_pairs: np.ndarray) -> np.ndarray:
    """Interpret little-endian byte pairs as fp16 and widen to f32."""
    return u8_pairs.view("<f2").astype(F32)


def f32_to_f16_bytes(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype="<f2").view(np.uint8)


def bf16_bits_to_f32(bits_u16: np.ndarray) -> np.ndarray:
    out = np.zeros(bits_u16.shape, dtype=np.uint32)
    out |= bits_u16.astype(np.uint32) << 16
    return out.view(np.float32)


def f32_to_bf16_bits(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 bit pattern (as uint16)."""
    bits = np.asarray(x, dtype=np.float32).view(np.uint32)
    rounding = ((bits >> 16) & 1) + np.uint32(0x7FFF)
    rounded = bits + rounding
    nan = np.isnan(x)
    out = (rounded >> 16).astype(np.uint16)
    out[nan] = np.uint16(0x7FC0)
    return out


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """Round half to even (matches ggml's magic-number nearest_int)."""
    return np.rint(x).astype(np.int32)


def _blocks(data: np.ndarray, type_size: int) -> np.ndarray:
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    if data.size % type_size != 0:
        raise ValueError(f"payload size {data.size} not a multiple of block size {type_size}")
    return data.reshape(-1, type_size)


# ---------------------------------------------------------------------------
# 32-element block formats
# ---------------------------------------------------------------------------

def dequant_q4_0(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2])  # (n, 1) after view→(n,1)? view gives (n,1)
    d = d.reshape(-1, 1)
    qs = b[:, 2:18]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(F32)
    return d * q


def dequant_q4_1(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    m = f16_to_f32(b[:, 2:4]).reshape(-1, 1)
    qs = b[:, 4:20]
    lo = (qs & 0x0F).astype(F32)
    hi = (qs >> 4).astype(F32)
    q = np.concatenate([lo, hi], axis=1)
    return d * q + m


def _q5_high_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """Expand the 4-byte qh field to 32 bits per block: bit i -> elem i."""
    qh = qh_bytes.view("<u4").reshape(-1, 1)
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh >> shifts) & 1).astype(np.uint8)


def dequant_q5_0(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    hb = _q5_high_bits(b[:, 2:6])
    qs = b[:, 6:22]
    lo = (qs & 0x0F).astype(np.int16)
    hi = (qs >> 4).astype(np.int16)
    q = np.concatenate([lo, hi], axis=1)
    q = (q | (hb.astype(np.int16) << 4)) - 16
    return d * q.astype(F32)


def dequant_q5_1(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    m = f16_to_f32(b[:, 2:4]).reshape(-1, 1)
    hb = _q5_high_bits(b[:, 4:8])
    qs = b[:, 8:24]
    lo = (qs & 0x0F).astype(np.int16)
    hi = (qs >> 4).astype(np.int16)
    q = (np.concatenate([lo, hi], axis=1) | (hb.astype(np.int16) << 4)).astype(F32)
    return d * q + m


def dequant_q8_0(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    q = b[:, 2:34].view(np.int8).astype(F32)
    return d * q


def dequant_q8_1(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    q = b[:, 4:36].view(np.int8).astype(F32)
    return d * q


_MXFP4_LUT = np.array(MXFP4_VALUES, dtype=F32)


def dequant_mxfp4(b: np.ndarray) -> np.ndarray:
    e = b[:, 0].astype(np.int32)
    # GGML_E8M0_TO_FP32_HALF(e) = 2^(e-127) * 0.5
    d = np.exp2(e.astype(F32) - 128.0).reshape(-1, 1)
    qs = b[:, 1:17]
    lo = _MXFP4_LUT[qs & 0x0F]
    hi = _MXFP4_LUT[qs >> 4]
    return d * np.concatenate([lo, hi], axis=1)


_IQ4_NL_LUT = np.array(IQ4_NL_VALUES, dtype=F32)


def dequant_iq4_nl(b: np.ndarray) -> np.ndarray:
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    qs = b[:, 2:18]
    lo = _IQ4_NL_LUT[qs & 0x0F]
    hi = _IQ4_NL_LUT[qs >> 4]
    # reference interleaves: y[j] = kvalues[qs[j] & 0xf], y[j+16] = kvalues[qs[j] >> 4]
    return d * np.concatenate([lo, hi], axis=1)


# ---------------------------------------------------------------------------
# K-quants (256-element superblocks)
# ---------------------------------------------------------------------------

def _get_scale_min_k4(scales12: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte packed 6-bit scales/mins of Q4_K/Q5_K.

    scales12: (n, 12) uint8 -> (sc, m): each (n, 8) uint8.
    """
    q = scales12.astype(np.uint8)
    sc = np.empty((q.shape[0], 8), dtype=np.uint8)
    m = np.empty((q.shape[0], 8), dtype=np.uint8)
    for j in range(4):
        sc[:, j] = q[:, j] & 63
        m[:, j] = q[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (q[:, j + 4] & 0x0F) | ((q[:, j - 4] >> 6) << 4)
        m[:, j] = (q[:, j + 4] >> 4) | ((q[:, j] >> 6) << 4)
    return sc, m


def dequant_q4_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    dmin = f16_to_f32(b[:, 2:4]).reshape(-1, 1)
    sc, mi = _get_scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    out = np.empty((n, QK_K), dtype=F32)
    # qs: 4 chunks of 32 bytes; chunk c holds elems [64c, 64c+64):
    # low nibbles -> first 32, high nibbles -> next 32
    for c in range(4):
        chunk = qs[:, 32 * c : 32 * (c + 1)]
        lo = (chunk & 0x0F).astype(F32)
        hi = (chunk >> 4).astype(F32)
        d1 = (d[:, 0] * sc[:, 2 * c].astype(F32)).reshape(-1, 1)
        m1 = (dmin[:, 0] * mi[:, 2 * c].astype(F32)).reshape(-1, 1)
        d2 = (d[:, 0] * sc[:, 2 * c + 1].astype(F32)).reshape(-1, 1)
        m2 = (dmin[:, 0] * mi[:, 2 * c + 1].astype(F32)).reshape(-1, 1)
        out[:, 64 * c : 64 * c + 32] = d1 * lo - m1
        out[:, 64 * c + 32 : 64 * c + 64] = d2 * hi - m2
    return out


def dequant_q5_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = f16_to_f32(b[:, 0:2]).reshape(-1, 1)
    dmin = f16_to_f32(b[:, 2:4]).reshape(-1, 1)
    sc, mi = _get_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    ql = b[:, 48:176]
    out = np.empty((n, QK_K), dtype=F32)
    for c in range(4):
        chunk = ql[:, 32 * c : 32 * (c + 1)]
        hb1 = ((qh >> (2 * c)) & 1).astype(F32)
        hb2 = ((qh >> (2 * c + 1)) & 1).astype(F32)
        lo = (chunk & 0x0F).astype(F32) + 16.0 * hb1
        hi = (chunk >> 4).astype(F32) + 16.0 * hb2
        d1 = (d[:, 0] * sc[:, 2 * c].astype(F32)).reshape(-1, 1)
        m1 = (dmin[:, 0] * mi[:, 2 * c].astype(F32)).reshape(-1, 1)
        d2 = (d[:, 0] * sc[:, 2 * c + 1].astype(F32)).reshape(-1, 1)
        m2 = (dmin[:, 0] * mi[:, 2 * c + 1].astype(F32)).reshape(-1, 1)
        out[:, 64 * c : 64 * c + 32] = d1 * lo - m1
        out[:, 64 * c + 32 : 64 * c + 64] = d2 * hi - m2
    return out


def dequant_q6_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    sc = b[:, 192:208].view(np.int8).astype(F32)
    d = f16_to_f32(b[:, 208:210]).reshape(-1, 1)
    out = np.empty((n, QK_K), dtype=F32)
    for half in range(2):  # 128 elements each
        qlh = ql[:, 64 * half : 64 * (half + 1)]
        qhh = qh[:, 32 * half : 32 * (half + 1)]
        base = 128 * half
        sbase = 8 * half
        l = np.arange(32)
        is_ = l // 16  # 0 or 1
        q1 = ((qlh[:, 0:32] & 0x0F) | (((qhh >> 0) & 3) << 4)).astype(np.int8) - 32
        q2 = ((qlh[:, 32:64] & 0x0F) | (((qhh >> 2) & 3) << 4)).astype(np.int8) - 32
        q3 = ((qlh[:, 0:32] >> 4) | (((qhh >> 4) & 3) << 4)).astype(np.int8) - 32
        q4 = ((qlh[:, 32:64] >> 4) | (((qhh >> 6) & 3) << 4)).astype(np.int8) - 32
        for qi, (q, soff) in enumerate([(q1, 0), (q2, 2), (q3, 4), (q4, 6)]):
            scg = sc[:, sbase + soff + is_]  # (n, 32)
            out[:, base + 32 * qi : base + 32 * (qi + 1)] = d * scg * q.astype(F32)
    return out


def dequant_q2_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = f16_to_f32(b[:, 80:82]).reshape(-1)
    dmin = f16_to_f32(b[:, 82:84]).reshape(-1)
    out = np.empty((n, QK_K), dtype=F32)
    pos = 0
    is_ = 0
    for half in range(2):  # q += 32 after 128 elems
        q = qs[:, 32 * half : 32 * (half + 1)]
        for shift in (0, 2, 4, 6):
            for part in range(2):  # two 16-elem groups
                scb = scales[:, is_]
                is_ += 1
                dl = (d * (scb & 0x0F).astype(F32)).reshape(-1, 1)
                ml = (dmin * (scb >> 4).astype(F32)).reshape(-1, 1)
                qpart = ((q[:, 16 * part : 16 * (part + 1)] >> shift) & 3).astype(F32)
                out[:, pos : pos + 16] = dl * qpart - ml
                pos += 16
    return out


def _q3_k_scales(scales12: np.ndarray) -> np.ndarray:
    """Unpack Q3_K's 12-byte 6-bit scales to (n,16) int8 (already minus 32)."""
    a = scales12.view("<u4")  # (n, 3)
    kmask1 = np.uint32(0x03030303)
    kmask2 = np.uint32(0x0F0F0F0F)
    tmp = a[:, 2]
    aux = np.empty((scales12.shape[0], 4), dtype=np.uint32)
    aux[:, 0] = (a[:, 0] & kmask2) | (((tmp >> 0) & kmask1) << 4)
    aux[:, 1] = (a[:, 1] & kmask2) | (((tmp >> 2) & kmask1) << 4)
    aux[:, 2] = ((a[:, 0] >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
    aux[:, 3] = ((a[:, 1] >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
    return aux.view(np.uint8).astype(np.int8) - 32  # reinterpret then bias


def dequant_q3_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    scales = _q3_k_scales(b[:, 96:108]).astype(F32)  # (n,16)
    d = f16_to_f32(b[:, 108:110]).reshape(-1)
    out = np.empty((n, QK_K), dtype=F32)
    pos = 0
    is_ = 0
    m_bit = 0
    for half in range(2):
        q = qs[:, 32 * half : 32 * (half + 1)]
        for shift in (0, 2, 4, 6):
            for part in range(2):
                dl = (d * scales[:, is_]).reshape(-1, 1)
                is_ += 1
                cols = slice(16 * part, 16 * (part + 1))
                qv = ((q[:, cols] >> shift) & 3).astype(np.int8)
                hm = (hmask[:, cols] >> m_bit) & 1
                qv = qv - np.where(hm == 0, 4, 0).astype(np.int8)
                out[:, pos : pos + 16] = dl * qv.astype(F32)
                pos += 16
            m_bit += 1
    return out


def dequant_q8_k(b: np.ndarray) -> np.ndarray:
    d = b[:, 0:4].view("<f4").reshape(-1, 1)
    q = b[:, 4:260].view(np.int8).astype(F32)
    return d * q


def dequant_iq4_xs(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = f16_to_f32(b[:, 0:2]).reshape(-1)
    scales_h = b[:, 2:4].view("<u2").reshape(-1).astype(np.uint32)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136]
    out = np.empty((n, QK_K), dtype=F32)
    for ib in range(8):  # 8 sub-blocks of 32
        ls_l = (scales_l[:, ib // 2] >> (4 * (ib & 1))) & 0x0F
        ls_h = (scales_h >> (2 * ib)) & 3
        ls = (ls_l.astype(np.int32) | (ls_h.astype(np.int32) << 4)) - 32
        dl = (d * ls.astype(F32)).reshape(-1, 1)
        chunk = qs[:, 16 * ib : 16 * (ib + 1)]
        lo = _IQ4_NL_LUT[chunk & 0x0F]
        hi = _IQ4_NL_LUT[chunk >> 4]
        out[:, 32 * ib : 32 * ib + 16] = dl * lo
        out[:, 32 * ib + 16 : 32 * ib + 32] = dl * hi
    return out


# ---------------------------------------------------------------------------
# quantizers
# ---------------------------------------------------------------------------

def quant_q8_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(F32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0, out=np.zeros_like(d)), 0.0).astype(F32)
    q = _nearest_int(x * id_[:, None]).clip(-127, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out.reshape(-1)


def quant_q4_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]  # signed max-magnitude element
    d = (maxv / -8.0).astype(F32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0, out=np.zeros_like(d)), 0.0).astype(F32)
    q = (x * id_[:, None] + 8.5).astype(np.int32).clip(0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:18] = q[:, 0:16] | (q[:, 16:32] << 4)
    return out.reshape(-1)


def quant_q4_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / 15.0).astype(F32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0, out=np.zeros_like(d)), 0.0).astype(F32)
    q = ((x - mn[:, None]) * id_[:, None] + 0.5).astype(np.int32).clip(0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 20), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = f32_to_f16_bytes(mn.astype(F32)).reshape(-1, 2)
    out[:, 4:20] = q[:, 0:16] | (q[:, 16:32] << 4)
    return out.reshape(-1)


def quant_q5_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = (maxv / -16.0).astype(F32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0, out=np.zeros_like(d)), 0.0).astype(F32)
    q = (x * id_[:, None] + 16.5).astype(np.int32).clip(0, 31).astype(np.uint8)
    out = np.empty((x.shape[0], 22), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bytes(d).reshape(-1, 2)
    qh = np.zeros(x.shape[0], dtype=np.uint32)
    for i in range(32):
        qh |= ((q[:, i] >> 4).astype(np.uint32)) << i
    out[:, 2:6] = qh.view(np.uint8).reshape(-1, 4)
    ql = q & 0x0F
    out[:, 6:22] = ql[:, 0:16] | (ql[:, 16:32] << 4)
    return out.reshape(-1)


def quant_q5_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / 31.0).astype(F32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0, out=np.zeros_like(d)), 0.0).astype(F32)
    q = ((x - mn[:, None]) * id_[:, None] + 0.5).astype(np.int32).clip(0, 31).astype(np.uint8)
    out = np.empty((x.shape[0], 24), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = f32_to_f16_bytes(mn.astype(F32)).reshape(-1, 2)
    qh = np.zeros(x.shape[0], dtype=np.uint32)
    for i in range(32):
        qh |= ((q[:, i] >> 4).astype(np.uint32)) << i
    out[:, 4:8] = qh.view(np.uint8).reshape(-1, 4)
    ql = q & 0x0F
    out[:, 8:24] = ql[:, 0:16] | (ql[:, 16:32] << 4)
    return out.reshape(-1)


def quant_q8_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(F32)
    id_ = np.where(d != 0, np.divide(1.0, d, where=d != 0, out=np.zeros_like(d)), 0.0).astype(F32)
    q = _nearest_int(x * id_[:, None]).clip(-127, 127).astype(np.int8)
    s = (d * q.sum(axis=1, dtype=np.int32).astype(F32)).astype(F32)
    out = np.empty((x.shape[0], 36), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = f32_to_f16_bytes(s).reshape(-1, 2)
    out[:, 4:36] = q.view(np.uint8)
    return out.reshape(-1)


def quant_mxfp4(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(F32)
    amax = np.abs(x).max(axis=1)
    # choose shared exponent e so that amax maps near the top code (6.0)
    with np.errstate(divide="ignore"):
        e = np.ceil(np.log2(amax / 6.0 + 1e-30)).astype(np.int32)
    e = np.clip(e + 127, 0, 254).astype(np.uint8)
    e = np.where(amax == 0, np.uint8(127), e)
    d = np.exp2(e.astype(F32) - 128.0)  # includes the 0.5 factor
    scaled = x / d[:, None]
    # nearest code in the pre-doubled table (positive half), sign separately
    pos_codes = np.array(MXFP4_VALUES[:8], dtype=F32)
    dist = np.abs(np.abs(scaled)[..., None] - pos_codes[None, None, :])
    idx = dist.argmin(axis=-1).astype(np.uint8)
    neg = (scaled < 0) & (idx != 0)
    code = np.where(neg, idx + 8, idx).astype(np.uint8)
    out = np.empty((x.shape[0], 17), dtype=np.uint8)
    out[:, 0] = e
    out[:, 1:17] = code[:, 0:16] | (code[:, 16:32] << 4)
    return out.reshape(-1)


def _make_qx_quants(x: np.ndarray, nmax: int, qw: np.ndarray | None = None):
    """Vectorized ggml make_qx_quants (rmse_type=1): weighted scale search.

    x: (G, n) groups. Returns (scale (G,), L (G, n) uint8 biased by +nmax).
    """
    G, n = x.shape
    amax_idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(G), amax_idx]
    dead = np.abs(maxv) < 1e-30  # GROUP_MAX_EPS
    safe_max = np.where(dead, 1.0, maxv)
    w = qw if qw is not None else x * x

    best_scale = np.zeros(G, dtype=F32)
    best_obj = np.full(G, -np.inf, dtype=F32)
    best_L = np.zeros((G, n), dtype=np.int32)
    first = True
    for is_ in range(-9, 10):
        if is_ == 0 and not first:
            pass
        iscale = -(nmax + 0.1 * is_) / safe_max
        l = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        sumlx = (w * x * l).sum(axis=1)
        suml2 = (w * l * l).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = np.where(suml2 > 0, sumlx / suml2, 0.0)
        obj = np.where(suml2 > 0, scale * sumlx, -np.inf)
        if first:
            # is_=-9 initializes via the rmse path too; but ggml initializes
            # with iscale = -nmax/max then searches; replicate: run base first.
            pass
        better = obj > best_obj
        best_obj = np.where(better, obj, best_obj)
        best_scale = np.where(better, scale, best_scale)
        best_L = np.where(better[:, None], l, best_L)
        first = False
    # base candidate (iscale = -nmax/max), matching ggml's initialization
    iscale = -nmax / safe_max
    l = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
    sumlx = (w * x * l).sum(axis=1)
    suml2 = (w * l * l).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(suml2 > 0, sumlx / suml2, 0.0)
    obj = np.where(suml2 > 0, scale * sumlx, -np.inf)
    better = obj >= best_obj
    best_scale = np.where(better, scale, best_scale)
    best_L = np.where(better[:, None], l, best_L)

    best_scale = np.where(dead, 0.0, best_scale)
    best_L = np.where(dead[:, None], 0, best_L)
    return best_scale.astype(F32), (best_L + nmax).astype(np.uint8)


def _make_qkx2_quants(x: np.ndarray, weights: np.ndarray, nmax: int,
                      rmin: float = -1.0, rdelta: float = 0.1, nstep: int = 20,
                      use_mad: bool = False):
    """Vectorized ggml make_qkx2_quants: joint (scale, min) weighted LS search.

    x, weights: (G, n). Returns (scale (G,), neg_min (G,), L (G,n) uint8).
    use_mad switches the candidate-selection metric to weighted |err| (Q2_K).
    """
    G, n = x.shape
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    mn = np.minimum(mn, 0.0)
    flat = mx == mn
    span = np.where(flat, 1.0, mx - mn)
    sum_w = weights.sum(axis=1)
    sum_x = (weights * x).sum(axis=1)

    # initial candidate: iscale = nmax/(max-min)
    def fit(iscale):
        l = np.clip(_nearest_int(iscale[:, None] * (x - mn[:, None])), 0, nmax)
        sum_l = (weights * l).sum(axis=1)
        sum_l2 = (weights * l * l).sum(axis=1)
        sum_xl = (weights * l * x).sum(axis=1)
        D = sum_w * sum_l2 - sum_l * sum_l
        with np.errstate(divide="ignore", invalid="ignore"):
            this_scale = np.where(D > 0, (sum_w * sum_xl - sum_x * sum_l) / D, 0.0)
            this_min = np.where(D > 0, (sum_l2 * sum_x - sum_l * sum_xl) / D, 0.0)
        pos_min = this_min > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            alt_scale = np.where(sum_l2 > 0, sum_xl / sum_l2, 0.0)
        this_scale = np.where(pos_min, alt_scale, this_scale)
        this_min = np.where(pos_min, 0.0, this_min)
        diff = this_scale[:, None] * l + this_min[:, None] - x
        err = (weights * (np.abs(diff) if use_mad else diff ** 2)).sum(axis=1)
        return l, this_scale, this_min, err

    iscale0 = nmax / span
    L, scale, minv, best_err = fit(iscale0)
    # ggml's initial assignment uses scale = 1/iscale, min = mn with simple
    # rounding error; then iterates. We fold that into the same search loop.
    init_l = np.clip(_nearest_int(iscale0[:, None] * (x - mn[:, None])), 0, nmax)
    init_scale = span / nmax
    init_diff = init_scale[:, None] * init_l + mn[:, None] - x
    init_err = (weights * (np.abs(init_diff) if use_mad else init_diff ** 2)).sum(axis=1)
    use_init = init_err < best_err
    L = np.where(use_init[:, None], init_l, L)
    scale = np.where(use_init, init_scale, scale)
    minv = np.where(use_init, mn, minv)
    best_err = np.where(use_init, init_err, best_err)

    for is_ in range(nstep + 1):
        iscale = (rmin + rdelta * is_ + nmax) / span
        l, s, m, err = fit(iscale)
        better = err < best_err
        L = np.where(better[:, None], l, L)
        scale = np.where(better, s, scale)
        minv = np.where(better, m, minv)
        best_err = np.where(better, err, best_err)

    scale = np.where(flat & (mn == 0), 0.0, scale)
    minv = np.where(flat & (mn == 0), 0.0, minv)
    return scale.astype(F32), (-minv).astype(F32), L.astype(np.uint8)


def _pack_scale_min_k4(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Pack 8 6-bit scales + 8 6-bit mins into 12 bytes (inverse of
    _get_scale_min_k4). ls, lm: (n, 8) uint8."""
    n = ls.shape[0]
    out = np.zeros((n, 12), dtype=np.uint8)
    for j in range(4):
        out[:, j] = ls[:, j] & 63
        out[:, j + 4] = lm[:, j] & 63
    for j in range(4, 8):
        out[:, j + 4] = (ls[:, j] & 0x0F) | ((lm[:, j] & 0x0F) << 4)
        out[:, j - 4] |= (ls[:, j] >> 4) << 6
        out[:, j] |= (lm[:, j] >> 4) << 6
    return out


def quant_q4_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    groups = x.reshape(n, 8, 32)
    sum_x2 = (groups * groups).sum(axis=2)  # (n, 8)
    if qw is not None:
        # imatrix weighting (reference llama-quant quant_weights path):
        # w[j] = qw[j] * sqrt(sigma2 + x[j]^2), sigma2 = 2*sum(x^2)/QK_K
        sigma2 = 2.0 * sum_x2.sum(axis=1) / QK_K  # (n,)
        weights = qw.reshape(n, 8, 32).astype(F32) * np.sqrt(
            sigma2[:, None, None] + groups * groups
        )
    else:
        av_x = np.sqrt(sum_x2 / 32.0)
        weights = av_x[:, :, None] + np.abs(groups)
    gflat = groups.reshape(n * 8, 32)
    wflat = weights.reshape(n * 8, 32)
    scales, mins, _ = _make_qkx2_quants(gflat, wflat, nmax=15)
    scales = scales.reshape(n, 8)
    mins = mins.reshape(n, 8)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    d = (max_scale / 63.0).astype(F32)
    dmin = (max_min / 63.0).astype(F32)
    d_h = f32_to_f16_bytes(d).reshape(-1, 2)
    dmin_h = f32_to_f16_bytes(dmin).reshape(-1, 2)
    d_eff = d_h.view("<f2").astype(F32).reshape(-1)  # use the f16-rounded value
    dmin_eff = dmin_h.view("<f2").astype(F32).reshape(-1)

    # requantize each 32-group with the quantized scales
    dg = d_eff[:, None] * ls.astype(F32)  # (n, 8)
    mg = dmin_eff[:, None] * lm.astype(F32)
    safe_dg = np.where(dg != 0, dg, 1.0)
    L = np.clip(
        _nearest_int((groups + mg[:, :, None]) / safe_dg[:, :, None]), 0, 15
    ).astype(np.uint8)
    L = np.where((dg == 0)[:, :, None], 0, L)

    out = np.empty((n, 144), dtype=np.uint8)
    out[:, 0:2] = d_h
    out[:, 2:4] = dmin_h
    out[:, 4:16] = _pack_scale_min_k4(ls, lm)
    elems = L.reshape(n, QK_K)
    for c in range(4):
        lo = elems[:, 64 * c : 64 * c + 32]
        hi = elems[:, 64 * c + 32 : 64 * c + 64]
        out[:, 16 + 32 * c : 16 + 32 * (c + 1)] = lo | (hi << 4)
    return out.reshape(-1)


def quant_q5_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    groups = x.reshape(n, 8, 32)
    sum_x2 = (groups * groups).sum(axis=2)
    if qw is not None:
        sigma2 = 2.0 * sum_x2.sum(axis=1) / QK_K
        weights = qw.reshape(n, 8, 32).astype(F32) * np.sqrt(
            sigma2[:, None, None] + groups * groups
        )
    else:
        av_x = np.sqrt(sum_x2 / 32.0)
        weights = av_x[:, :, None] + np.abs(groups)
    scales, mins, _ = _make_qkx2_quants(
        groups.reshape(n * 8, 32), weights.reshape(n * 8, 32), nmax=31
    )
    scales = scales.reshape(n, 8)
    mins = mins.reshape(n, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    d_h = f32_to_f16_bytes((max_scale / 63.0).astype(F32)).reshape(-1, 2)
    dmin_h = f32_to_f16_bytes((max_min / 63.0).astype(F32)).reshape(-1, 2)
    d_eff = d_h.view("<f2").astype(F32).reshape(-1)
    dmin_eff = dmin_h.view("<f2").astype(F32).reshape(-1)

    dg = d_eff[:, None] * ls.astype(F32)
    mg = dmin_eff[:, None] * lm.astype(F32)
    safe_dg = np.where(dg != 0, dg, 1.0)
    L = np.clip(
        _nearest_int((groups + mg[:, :, None]) / safe_dg[:, :, None]), 0, 31
    ).astype(np.uint8)
    L = np.where((dg == 0)[:, :, None], 0, L)
    elems = L.reshape(n, QK_K)

    out = np.empty((n, 176), dtype=np.uint8)
    out[:, 0:2] = d_h
    out[:, 2:4] = dmin_h
    out[:, 4:16] = _pack_scale_min_k4(ls, lm)
    qh = np.zeros((n, 32), dtype=np.uint8)
    ql = np.empty((n, 128), dtype=np.uint8)
    for c in range(4):
        g1 = elems[:, 64 * c : 64 * c + 32]
        g2 = elems[:, 64 * c + 32 : 64 * c + 64]
        qh |= ((g1 >> 4) & 1) << (2 * c)
        qh |= ((g2 >> 4) & 1) << (2 * c + 1)
        ql[:, 32 * c : 32 * (c + 1)] = (g1 & 0x0F) | ((g2 & 0x0F) << 4)
    out[:, 16:48] = qh
    out[:, 48:176] = ql
    return out.reshape(-1)


def quant_q6_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    groups = x.reshape(n * 16, 16)
    if qw is not None:
        sigma2 = 2.0 * (x * x).sum(axis=1) / QK_K  # (n,)
        wq = qw.reshape(n, QK_K).astype(F32) * np.sqrt(
            sigma2[:, None] + x * x
        )
        scales, _ = _make_qx_quants(groups, nmax=32, qw=wq.reshape(n * 16, 16))
    else:
        scales, _ = _make_qx_quants(groups, nmax=32)
    scales = scales.reshape(n, 16)
    absmax_idx = np.abs(scales).argmax(axis=1)
    max_scale = scales[np.arange(n), absmax_idx]
    dead = np.abs(max_scale) < 1e-30
    safe_max = np.where(dead, 1.0, max_scale)
    iscale = -128.0 / safe_max
    d_f32 = (1.0 / iscale).astype(F32)
    d_h = f32_to_f16_bytes(np.where(dead, 0.0, d_f32).astype(F32)).reshape(-1, 2)
    d_eff = d_h.view("<f2").astype(F32).reshape(-1)
    sc8 = np.minimum(127, _nearest_int(iscale[:, None] * scales)).astype(np.int8)

    dsc = d_eff[:, None] * sc8.astype(F32)  # (n, 16) effective group scales
    safe = np.where(dsc != 0, dsc, 1.0)
    g = x.reshape(n, 16, 16)
    L = np.clip(_nearest_int(g / safe[:, :, None]), -32, 31) + 32
    L = np.where((dsc == 0)[:, :, None], 32, L).astype(np.uint8)
    L = np.where(dead[:, None, None], 32, L)
    elems = L.reshape(n, QK_K)

    out = np.empty((n, 210), dtype=np.uint8)
    ql = np.empty((n, 128), dtype=np.uint8)
    qh = np.empty((n, 64), dtype=np.uint8)
    for half in range(2):
        e = elems[:, 128 * half : 128 * (half + 1)]
        q1, q2, q3, q4 = e[:, 0:32], e[:, 32:64], e[:, 64:96], e[:, 96:128]
        ql[:, 64 * half : 64 * half + 32] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
        ql[:, 64 * half + 32 : 64 * half + 64] = (q2 & 0x0F) | ((q4 & 0x0F) << 4)
        qh[:, 32 * half : 32 * (half + 1)] = (
            (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
        )
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = d_h
    return out.reshape(-1)


def quant_q8_k(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    amax_idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(n), amax_idx]
    dead = maxv == 0
    iscale = np.where(dead, 0.0, -128.0 / np.where(dead, 1.0, maxv))
    q = np.clip(_nearest_int(iscale[:, None] * x), -127, 127).astype(np.int8)
    d = np.where(dead, 0.0, 1.0 / np.where(iscale == 0, 1.0, iscale)).astype(F32)
    bsums = q.reshape(n, 16, 16).sum(axis=2, dtype=np.int32).astype("<i2")
    out = np.empty((n, 292), dtype=np.uint8)
    out[:, 0:4] = d.view(np.uint8).reshape(-1, 4) if d.dtype.str == "<f4" else np.asarray(d, "<f4").view(np.uint8).reshape(-1, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(n, 32)
    return out.reshape(-1)


def quant_q2_k(x: np.ndarray) -> np.ndarray:
    """Vectorized quantize_row_q2_K_ref: 16 groups of 16 with a joint
    (scale, min) search (MAD metric), 4-bit super-scales, 2-bit codes."""
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    g = x.reshape(n * 16, 16)  # groups of 16
    weights = np.abs(g)
    scales, neg_min, L = _make_qkx2_quants(
        g, weights, nmax=3, rmin=-0.5, rdelta=0.1, nstep=15, use_mad=True
    )
    scales = scales.reshape(n, 16)
    mins = neg_min.reshape(n, 16)
    L = L.reshape(n, 16, 16)

    q4 = F32(15.0)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ls = np.where(max_scale[:, None] > 0,
                      _nearest_int(q4 / np.where(max_scale > 0, max_scale, 1)[:, None]
                                   * scales), 0).astype(np.uint8)
        lm = np.where(max_min[:, None] > 0,
                      _nearest_int(q4 / np.where(max_min > 0, max_min, 1)[:, None]
                                   * mins), 0).astype(np.uint8)
    d16 = np.where(max_scale > 0, max_scale / q4, 0.0).astype("<f2")
    dmin16 = np.where(max_min > 0, max_min / q4, 0.0).astype("<f2")
    d = d16.astype(F32)
    dmin = dmin16.astype(F32)
    scale_bytes = (ls | (lm << 4)).astype(np.uint8)  # (n, 16)

    # requantize with the final fp16 super-scales
    dj = d[:, None] * (scale_bytes & 0xF).astype(F32)  # (n, 16)
    mj = dmin[:, None] * (scale_bytes >> 4).astype(F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        lnew = _nearest_int((g.reshape(n, 16, 16) + mj[:, :, None])
                            / np.where(dj == 0, 1, dj)[:, :, None])
    lnew = np.clip(lnew, 0, 3).astype(np.uint8)
    L = np.where((dj != 0)[:, :, None], lnew, L).reshape(n, QK_K)

    # pack 2-bit codes: stride-128 layout (elem j, j+32, j+64, j+96 per byte)
    qs = np.zeros((n, 64), dtype=np.uint8)
    for half in range(2):  # j = 0 and j = 128
        blk = L[:, 128 * half : 128 * (half + 1)].reshape(n, 4, 32)
        qs[:, 32 * half : 32 * (half + 1)] = (
            blk[:, 0] | (blk[:, 1] << 2) | (blk[:, 2] << 4) | (blk[:, 3] << 6)
        )
    out = np.empty((n, 84), dtype=np.uint8)
    out[:, :16] = scale_bytes
    out[:, 16:80] = qs
    out[:, 80:82] = d16.view(np.uint8).reshape(n, 2)
    out[:, 82:84] = dmin16.view(np.uint8).reshape(n, 2)
    return out.reshape(-1)


def _make_q3_quants_rmse(g: np.ndarray, nmax: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-over-groups make_q3_quants(do_rmse=True): x²-weighted LS
    scale with per-element coordinate-descent refinement.

    g: (G, 16) → (scale (G,), L (G, 16) int offset-free [-nmax, nmax-1])."""
    G, nn = g.shape
    amax_idx = np.argmax(np.abs(g), axis=1)
    mx = g[np.arange(G), amax_idx]
    dead = np.abs(mx) < 1e-15
    with np.errstate(divide="ignore", invalid="ignore"):
        iscale = np.where(dead, 0.0, -nmax / np.where(dead, 1, mx))
    L = np.clip(_nearest_int(iscale[:, None] * g), -nmax, nmax - 1)
    w = g * g
    sumlx = (w * g * L).sum(axis=1)
    suml2 = (w * L * L).sum(axis=1)
    for _ in range(5):
        changed = False
        for i in range(nn):
            wi = w[:, i]
            slx = sumlx - wi * g[:, i] * L[:, i]
            sl2 = suml2 - wi * L[:, i] * L[:, i]
            with np.errstate(divide="ignore", invalid="ignore"):
                new_l = np.clip(
                    _nearest_int(g[:, i] * sl2 / np.where(slx == 0, 1, slx)),
                    -nmax, nmax - 1,
                )
            slx2 = slx + wi * g[:, i] * new_l
            sl22 = sl2 + wi * new_l * new_l
            take = (slx > 0) & (new_l != L[:, i]) & (sl22 > 0) & (
                slx2 * slx2 * suml2 > sumlx * sumlx * sl22
            )
            if take.any():
                changed = True
                L[:, i] = np.where(take, new_l, L[:, i])
                sumlx = np.where(take, slx2, sumlx)
                suml2 = np.where(take, sl22, suml2)
        if not changed:
            break
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1), 0.0)
    scale = np.where(dead, 0.0, scale)
    return scale.astype(F32), L


def _pack_q3_scales(lq: np.ndarray) -> np.ndarray:
    """Inverse of _q3_k_scales: 16 6-bit values (offset by 32) → 12 bytes."""
    n = lq.shape[0]
    out = np.zeros((n, 12), dtype=np.uint8)
    for j in range(16):
        lo = lq[:, j] & 0xF
        hi = lq[:, j] >> 4
        if j < 8:
            out[:, j] |= lo
        else:
            out[:, j - 8] |= lo << 4
        out[:, 8 + j % 4] |= hi << (2 * (j // 4))
    return out


def quant_q3_k(x: np.ndarray) -> np.ndarray:
    """Vectorized quantize_row_q3_K_ref: signed 3-bit codes with 6-bit
    per-group scales and a separate high-bit mask."""
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    g = x.reshape(n * 16, 16)
    scales, _ = _make_q3_quants_rmse(g)
    scales = scales.reshape(n, 16)

    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(n), amax_idx]
    dead = max_scale == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        iscale = np.where(dead, 0.0, -32.0 / np.where(dead, 1, max_scale))
    lq = np.clip(_nearest_int(iscale[:, None] * scales), -32, 31) + 32
    lq = np.where(dead[:, None], 32, lq).astype(np.uint8)  # 32 ↔ sc 0
    scales12 = np.where(dead[:, None], 0,
                        _pack_q3_scales(lq)).astype(np.uint8)
    d16 = np.where(dead, 0.0, 1.0 / np.where(dead, 1, iscale)).astype("<f2")
    d = d16.astype(F32)

    sc = _q3_k_scales(scales12)  # decoded int scales (n, 16)
    dj = d[:, None] * sc.astype(F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        lnew = _nearest_int(x.reshape(n, 16, 16)
                            / np.where(dj == 0, 1, dj)[:, :, None])
    L = np.where((dj != 0)[:, :, None], np.clip(lnew, -4, 3), -4) + 4
    # dj == 0 groups keep code 0 (reference `continue` leaves L untouched at 0)
    L = np.where((dj != 0)[:, :, None], L, 4 * 0)
    L = L.reshape(n, QK_K).astype(np.uint8)

    hmask = np.zeros((n, 32), dtype=np.uint8)
    hbit = (L > 3).astype(np.uint8)
    for j in range(QK_K):
        hmask[:, j % 32] |= hbit[:, j] << (j // 32)
    L = np.where(L > 3, L - 4, L)

    qs = np.zeros((n, 64), dtype=np.uint8)
    for half in range(2):
        blk = L[:, 128 * half : 128 * (half + 1)].reshape(n, 4, 32)
        qs[:, 32 * half : 32 * (half + 1)] = (
            blk[:, 0] | (blk[:, 1] << 2) | (blk[:, 2] << 4) | (blk[:, 3] << 6)
        )
    out = np.empty((n, 110), dtype=np.uint8)
    out[:, :32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = scales12
    out[:, 108:110] = d16.view(np.uint8).reshape(n, 2)
    return out.reshape(-1)



def _best_iq4_index(vals: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Nearest entry of the sorted non-linear IQ4 codebook per element
    (≡ best_index_int8)."""
    hi = np.searchsorted(vals, x)  # first idx with vals[idx] >= x... (left)
    hi = np.clip(hi, 1, len(vals) - 1)
    lo = hi - 1
    pick_lo = (x - vals[lo]) < (vals[hi] - x)
    idx = np.where(pick_lo, lo, hi)
    idx = np.where(x <= vals[0], 0, idx)
    idx = np.where(x >= vals[-1], len(vals) - 1, idx)
    return idx.astype(np.uint8)


def quant_iq4_nl(x: np.ndarray) -> np.ndarray:
    """Vectorized quantize_row_iq4_nl_ref: per-32 scale fit onto the
    non-linear 16-value codebook (single weighted-LS refinement)."""
    x = x.reshape(-1, 32).astype(F32)
    n = x.shape[0]
    vals = _IQ4_NL_LUT  # sorted ascending
    w = x * x
    amax_idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(n), amax_idx]
    dead = np.abs(mx) < 1e-15
    d0 = np.where(dead, 0.0, mx / vals[0])
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(d0 != 0, 1.0 / np.where(d0 == 0, 1, d0), 0.0)
    L = _best_iq4_index(vals, idv[:, None] * x)
    q = vals[L]
    sumqx = (w * q * x).sum(axis=1)
    sumq2 = (w * q * q).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0.0)
    d16 = np.where(dead, 0.0, d).astype("<f2")
    qs = (L[:, :16] | (L[:, 16:] << 4)).astype(np.uint8)
    out = np.empty((n, 18), dtype=np.uint8)
    out[:, :2] = d16.view(np.uint8).reshape(n, 2)
    out[:, 2:] = qs
    return out.reshape(-1)


def quant_iq4_xs(x: np.ndarray) -> np.ndarray:
    """Vectorized quantize_iq4_xs: per-32 scale search (15 candidates) onto
    the IQ4 codebook, 6-bit super-scales, f16 super-d."""
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    vals = _IQ4_NL_LUT
    g = x.reshape(n * 8, 32)
    w = g * g
    amax_idx = np.argmax(np.abs(g), axis=1)
    mx = g[np.arange(n * 8), amax_idx]
    dead = np.abs(mx) < 1e-15
    safe_mx = np.where(dead, 1.0, mx)

    def score(idv):
        L = _best_iq4_index(vals, idv[:, None] * g)
        q = vals[L]
        sumqx = (w * q * g).sum(axis=1)
        sumq2 = (w * q * q).sum(axis=1)
        return sumqx, sumq2

    # initial: d = -max/values[0]
    d0 = -mx / vals[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        sumqx, sumq2 = score(np.where(d0 != 0, 1.0 / np.where(d0 == 0, 1, d0), 0.0))
        d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0.0)
    best = d * sumqx
    for itry in range(-7, 8):
        idv = (itry + vals[0]) / safe_mx
        sumqx, sumq2 = score(idv)
        better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = np.where(better, sumqx / np.where(sumq2 > 0, sumq2, 1), d)
        best = np.where(better, d * sumqx, best)
    scales = np.where(dead, 0.0, d).reshape(n, 8)

    amax_s = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(n), amax_s]
    d_super16 = (-max_scale / 32).astype("<f2")
    d_super = d_super16.astype(F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_super = np.where(d_super != 0,
                            1.0 / np.where(d_super == 0, 1, d_super), 0.0)
    ls = np.clip(_nearest_int(id_super[:, None] * scales), -32, 31)  # (n, 8)
    dl = d_super[:, None] * ls.astype(F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        idl = np.where(dl != 0, 1.0 / np.where(dl == 0, 1, dl), 0.0)
    L = _best_iq4_index(vals, idl.reshape(n * 8, 1) * g).reshape(n, 8, 32)

    lsu = (ls + 32).astype(np.uint8)
    scales_l = ((lsu[:, 0::2] & 0xF) | ((lsu[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    sh = np.zeros(n, dtype=np.uint16)
    for ib in range(8):
        sh |= ((lsu[:, ib].astype(np.uint16) >> 4) << (2 * ib))
    qs = (L[:, :, :16] | (L[:, :, 16:] << 4)).reshape(n, 128).astype(np.uint8)
    out = np.empty((n, 136), dtype=np.uint8)
    out[:, 0:2] = d_super16.view(np.uint8).reshape(n, 2)
    out[:, 2:4] = sh.astype("<u2").view(np.uint8).reshape(n, 2)
    out[:, 4:8] = scales_l
    out[:, 8:] = qs
    return out.reshape(-1)



def _ternary_digits(x: np.ndarray) -> np.ndarray:
    """round(x)+1 with C lroundf (half away from zero) → {0,1,2}."""
    xi = np.sign(x) * np.floor(np.abs(x) + 0.5)
    return np.clip(xi + 1, 0, 2).astype(np.uint16)


def quant_tq1_0(x: np.ndarray) -> np.ndarray:
    """Vectorized quantize_row_tq1_0_ref: ternary, 5 base-3 digits per byte
    (+ a 4-digit tail), one f16 amax scale per 256."""
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    d = np.abs(x).max(axis=1)
    d16 = d.astype("<f2")
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)[:, None]
    t = _ternary_digits(x * idv)  # (n, 256) of {0,1,2}

    def pack5(block, width):  # block (n, 5*width) → (n, width) bytes
        digs = block.reshape(n, 5, width)
        q = np.zeros((n, width), dtype=np.uint16)
        for k in range(5):
            q = q * 3 + digs[:, k]
        return ((q * 256 + 242) // 243).astype(np.uint8)

    qs = np.empty((n, 48), dtype=np.uint8)
    qs[:, :32] = pack5(t[:, :160], 32)
    qs[:, 32:48] = pack5(t[:, 160:240], 16)
    tail = t[:, 240:].reshape(n, 4, 4)
    qh = np.zeros((n, 4), dtype=np.uint16)
    for k in range(4):
        qh = qh * 3 + tail[:, k]
    qh = qh * 3  # shift the 4 trits up to the most-significant positions
    qh = ((qh * 256 + 242) // 243).astype(np.uint8)

    out = np.empty((n, 54), dtype=np.uint8)
    out[:, :48] = qs
    out[:, 48:52] = qh
    out[:, 52:54] = d16.view(np.uint8).reshape(n, 2)
    return out.reshape(-1)


def quant_tq2_0(x: np.ndarray) -> np.ndarray:
    """Vectorized quantize_row_tq2_0_ref: ternary in plain 2-bit fields."""
    x = x.reshape(-1, QK_K).astype(F32)
    n = x.shape[0]
    d = np.abs(x).max(axis=1)
    d16 = d.astype("<f2")
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)[:, None]
    t = _ternary_digits(x * idv).astype(np.uint8).reshape(n, 2, 4, 32)
    qs = (t[:, :, 0] | (t[:, :, 1] << 2) | (t[:, :, 2] << 4)
          | (t[:, :, 3] << 6)).reshape(n, 64)
    out = np.empty((n, 66), dtype=np.uint8)
    out[:, :64] = qs
    out[:, 64:66] = d16.view(np.uint8).reshape(n, 2)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_DEQUANT = {
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q8_1: dequant_q8_1,
    GGMLType.MXFP4: dequant_mxfp4,
    GGMLType.Q2_K: dequant_q2_k,
    GGMLType.Q3_K: dequant_q3_k,
    GGMLType.Q4_K: dequant_q4_k,
    GGMLType.Q5_K: dequant_q5_k,
    GGMLType.Q6_K: dequant_q6_k,
    GGMLType.Q8_K: dequant_q8_k,
    GGMLType.IQ4_NL: dequant_iq4_nl,
    GGMLType.IQ4_XS: dequant_iq4_xs,
}

from .iq_codecs import IQ_DEQUANT  # noqa: E402  (grid-codebook formats)

_DEQUANT.update(IQ_DEQUANT)

_QUANT = {
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q4_1: quant_q4_1,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q5_1: quant_q5_1,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q8_1: quant_q8_1,
    GGMLType.MXFP4: quant_mxfp4,
    GGMLType.Q2_K: quant_q2_k,
    GGMLType.Q3_K: quant_q3_k,
    GGMLType.Q4_K: quant_q4_k,
    GGMLType.Q5_K: quant_q5_k,
    GGMLType.Q6_K: quant_q6_k,
    GGMLType.Q8_K: quant_q8_k,
    GGMLType.IQ4_NL: quant_iq4_nl,
    GGMLType.IQ4_XS: quant_iq4_xs,
    GGMLType.TQ1_0: quant_tq1_0,
    GGMLType.TQ2_0: quant_tq2_0,
}

from .iq_encoders import IQ_QUANT  # noqa: E402  (grid-search i-quantizers)

_QUANT.update(IQ_QUANT)


def supported_dequant_types() -> list[GGMLType]:
    return sorted(_DEQUANT.keys())


def supported_quant_types() -> list[GGMLType]:
    return sorted(_QUANT.keys())


def dequantize(data: np.ndarray, gtype: GGMLType, n_elements: int) -> np.ndarray:
    """Dequantize packed bytes to float32[n_elements]."""
    if gtype == GGMLType.F32:
        return np.ascontiguousarray(data).view("<f4")[:n_elements].astype(F32)
    if gtype == GGMLType.F16:
        return np.ascontiguousarray(data).view("<f2")[:n_elements].astype(F32)
    if gtype == GGMLType.BF16:
        return bf16_bits_to_f32(np.ascontiguousarray(data).view("<u2")[:n_elements])
    from . import native

    nat = native.dequantize(data, gtype, n_elements)
    if nat is not None:
        return nat[:n_elements]
    fn = _DEQUANT.get(gtype)
    if fn is None:
        raise NotImplementedError(f"dequantization of {gtype.name} not implemented yet")
    tt = TYPE_TRAITS[gtype]
    out = fn(_blocks(data, tt.type_size))
    return out.reshape(-1)[:n_elements]


def quantize(values: np.ndarray, gtype: GGMLType,
             qw: np.ndarray | None = None) -> np.ndarray:
    """Quantize float32 values (flat, multiple of block size) to packed uint8.

    qw: optional per-element importance weights (imatrix), same length as
    values; honored by the K-quant encoders."""
    values = np.ascontiguousarray(values, dtype=np.float32).reshape(-1)
    if gtype == GGMLType.F32:
        return values.view(np.uint8)
    if gtype == GGMLType.F16:
        return values.astype("<f2").view(np.uint8)
    if gtype == GGMLType.BF16:
        return f32_to_bf16_bits(values).view(np.uint8)
    fn = _QUANT.get(gtype)
    if fn is None:
        raise NotImplementedError(f"quantization to {gtype.name} not implemented yet")
    tt = TYPE_TRAITS[gtype]
    if values.size % tt.block_size:
        raise ValueError(f"{values.size} elements not a multiple of {tt.block_size}")
    if qw is not None and gtype in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K):
        return fn(values, np.ascontiguousarray(qw, dtype=np.float32).reshape(-1))
    from . import native

    nat = native.quantize(values, gtype)
    if nat is not None:
        return nat
    return fn(values)
