"""Numpy dequant codecs for the i-quant / ternary ggml formats.

Bit-compatible with the reference CPU kernels (ggml/src/ggml-quants.c
dequantize_row_iq2_xxs .. dequantize_row_tq2_0): same unpacking, same f32
operation order. The lattice codebooks (iq*_grid tables from ggml-common.h)
are shipped as format-constant data in iq_grids.npz — regenerate with
tools/gen_iq_grids.py.

Shared machinery of the IQ2/IQ3 family:
  * values come from a fixed grid of 8- (IQ2) or 4-value (IQ3) codewords,
  * signs are either a 7-bit index into a parity-extended 128-entry sign
    codebook (XXS/XS) or explicit sign bytes (the _S variants),
  * per-32-element scales are 4-bit, expanded as d*(0.5+s)*0.25 (IQ2),
    d*(0.5+s)*0.5 (IQ3_XXS) or d*(1+2s) (IQ3_S).
IQ1 adds a per-group ±0.125 delta; TQ1/TQ2 are plain ternary with one f16
scale per 256 elements.

These are the load path for IQ/TQ-quantized GGUFs (dense mode dequantizes
through here) and the conformance oracle for any future fused kernels.
"""

from __future__ import annotations

import os

import numpy as np

from ..gguf.constants import GGMLType, QK_K

F32 = np.float32

_grids = np.load(os.path.join(os.path.dirname(__file__), "iq_grids.npz"))
GRID_IQ2XXS = _grids["iq2xxs_grid"].astype(F32)  # (256, 8)
GRID_IQ2XS = _grids["iq2xs_grid"].astype(F32)  # (512, 8)
GRID_IQ2S = _grids["iq2s_grid"].astype(F32)  # (1024, 8)
GRID_IQ3XXS = _grids["iq3xxs_grid"].astype(F32)  # (256, 4)
GRID_IQ3S = _grids["iq3s_grid"].astype(F32)  # (512, 4)
GRID_IQ1S = _grids["iq1s_grid"].astype(F32)  # (2048, 8), values in {-1,0,1}

IQ1_DELTA = F32(0.125)

# ksigns_iq2xs is algorithmic: entry i carries the 7 low sign bits of i plus
# an odd-parity bit 7.  Expand straight to a (128, 8) table of ±1.
_i = np.arange(128, dtype=np.uint8)
_par = np.zeros(128, dtype=np.uint8)
for _b in range(7):
    _par ^= (_i >> _b) & 1
_ks_bytes = _i | (_par << 7)
KSIGNS = np.where(
    (_ks_bytes[:, None] >> np.arange(8, dtype=np.uint8)) & 1, F32(-1), F32(1)
)  # (128, 8)
del _i, _par, _b, _ks_bytes


def _f16(col2: np.ndarray) -> np.ndarray:
    """(n, 2) u8 -> (n,) f32 via IEEE half."""
    return np.ascontiguousarray(col2).view("<f2").reshape(-1).astype(F32)


def _sign_bytes(sb: np.ndarray) -> np.ndarray:
    """(...,) u8 explicit sign bytes -> (..., 8) of ±1 (bit set = negative)."""
    bits = (sb[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 1, F32(-1), F32(1))


def dequant_iq2_xxs(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = _f16(b[:, :2])
    q32 = np.ascontiguousarray(b[:, 2:]).view("<u4").reshape(n, 8, 2)
    gidx = q32[:, :, 0:1].copy().view(np.uint8)  # (n, 8, 4)
    aux = q32[:, :, 1]  # (n, 8) signs + scale word
    db = d[:, None] * (F32(0.5) + (aux >> 28).astype(F32)) * F32(0.25)
    sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
    vals = db[:, :, None, None] * GRID_IQ2XXS[gidx]  # (n, 8, 4, 8)
    return (vals * KSIGNS[sidx]).reshape(n, QK_K)


def dequant_iq2_xs(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = _f16(b[:, :2])
    q16 = np.ascontiguousarray(b[:, 2:66]).view("<u2").reshape(n, 8, 4)
    scales = b[:, 66:74]  # (n, 8) two nibbles per 32-group
    half = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)  # (n,8,2)
    db = d[:, None, None] * (F32(0.5) + half) * F32(0.25)
    db4 = db[:, :, [0, 0, 1, 1]]  # l = 0,1 -> low nibble; 2,3 -> high
    vals = db4[..., None] * GRID_IQ2XS[q16 & 511]
    return (vals * KSIGNS[q16 >> 9]).reshape(n, QK_K)


def dequant_iq2_s(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:34].reshape(n, 8, 4)  # grid low bytes
    sgn = b[:, 34:66].reshape(n, 8, 4)  # explicit sign bytes
    qh = b[:, 66:74]  # (n, 8)
    scales = b[:, 74:82]
    hi = ((qh[:, :, None].astype(np.uint16) >> (2 * np.arange(4))) & 3) << 8
    gidx = qs.astype(np.uint16) | hi
    half = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)
    db = d[:, None, None] * (F32(0.5) + half) * F32(0.25)
    vals = db[:, :, [0, 0, 1, 1], None] * GRID_IQ2S[gidx]
    return (vals * _sign_bytes(sgn)).reshape(n, QK_K)


def dequant_iq3_xxs(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = _f16(b[:, :2])
    gidx = b[:, 2:66].reshape(n, 8, 4, 2)  # 8 codewords of 4 per 32-group
    aux = np.ascontiguousarray(b[:, 66:98]).view("<u4").reshape(n, 8)
    db = d[:, None] * (F32(0.5) + (aux >> 28).astype(F32)) * F32(0.5)
    sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
    vals = GRID_IQ3XXS[gidx].reshape(n, 8, 4, 8)  # pairs of 4 -> rows of 8
    out = (db[:, :, None, None] * vals) * KSIGNS[sidx]
    return out.reshape(n, QK_K)


def dequant_iq3_s(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:66].reshape(n, 8, 8)  # 8 low bytes per 32-group
    qh = b[:, 66:74]  # one high-bit byte per 32-group
    sgn = b[:, 74:106].reshape(n, 8, 4)
    scales = b[:, 106:110]  # (n, 4): one nibble pair per 2 groups
    hi = (((qh[:, :, None].astype(np.uint16) >> np.arange(8)) & 1) << 8)
    gidx = qs.astype(np.uint16) | hi  # (n, 8, 8)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(n, 8)
    db = d[:, None] * (F32(1) + F32(2) * nib.astype(F32))  # (n, 8)
    vals = GRID_IQ3S[gidx].reshape(n, 8, 4, 8)
    out = (db[:, :, None, None] * vals) * _sign_bytes(sgn)
    return out.reshape(n, QK_K)


def dequant_iq1_s(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:34].reshape(n, 8, 4)
    qh = np.ascontiguousarray(b[:, 34:50]).view("<u2").reshape(n, 8)
    dl = d[:, None] * (2 * ((qh >> 12) & 7) + 1).astype(F32)
    delta = np.where(qh & 0x8000, -IQ1_DELTA, IQ1_DELTA)
    hi = ((qh[:, :, None] >> (3 * np.arange(4))) & 7) << 8
    gidx = qs.astype(np.uint16) | hi.astype(np.uint16)
    vals = GRID_IQ1S[gidx] + delta[:, :, None, None].astype(F32)
    return (dl[:, :, None, None] * vals).reshape(n, QK_K)


def dequant_iq1_m(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    qs = b[:, 0:32].reshape(n, 8, 4)
    qh = b[:, 32:48].reshape(n, 8, 2)
    sc = np.ascontiguousarray(b[:, 48:56]).view("<u2").reshape(n, 4)
    # block scale f16 is scattered over the top nibbles of the 4 scale words
    dbits = (
        (sc[:, 0] >> 12)
        | ((sc[:, 1] >> 8) & 0x00F0)
        | ((sc[:, 2] >> 4) & 0x0F00)
        | (sc[:, 3] & 0xF000)
    ).astype("<u2")
    d = dbits.view("<f2").astype(F32)
    # per-16 3-bit scales: word ib//2, bit offset 6*(ib%2) (+3 for second half)
    shift = 6 * (np.arange(8) % 2)  # (8,)
    w = sc[:, np.arange(8) // 2]  # (n, 8)
    dl1 = d[:, None] * (2 * ((w >> shift) & 7) + 1).astype(F32)
    dl2 = d[:, None] * (2 * ((w >> (shift + 3)) & 7) + 1).astype(F32)
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1)  # (n, 8, 4) per l
    qh_l = qh[:, :, [0, 0, 1, 1]]  # qh byte used by each l
    hsh = np.array([8, 4, 8, 4])  # << 8 then &0x700 == low nibble/high nibble
    hi = ((qh_l.astype(np.uint16) << hsh) & 0x700)
    gidx = qs.astype(np.uint16) | hi
    dmask = np.array([0x08, 0x80, 0x08, 0x80], dtype=np.uint8)
    delta = np.where(qh_l & dmask, -IQ1_DELTA, IQ1_DELTA)
    vals = GRID_IQ1S[gidx] + delta[..., None].astype(F32)
    return (dl[..., None] * vals).reshape(n, QK_K)


def _ternary_digit(q: np.ndarray, plane: np.ndarray) -> np.ndarray:
    """ggml's mod-3 digit trick: digit k of base-3 byte q is
    uint8(q * 3**k) * 3 >> 8, giving 0/1/2."""
    scaled = (q[..., None, :] * plane[:, None]).astype(np.uint8)
    return ((scaled.astype(np.uint16) * 3) >> 8).astype(np.int16) - 1


def dequant_tq1_0(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint16)
    qs = b[:, :48]
    qh = b[:, 48:52]
    d = _f16(b[:, 52:54])[:, None]
    v1 = _ternary_digit(qs[:, :32], pow3).reshape(n, 160)
    v2 = _ternary_digit(qs[:, 32:48], pow3).reshape(n, 80)
    v3 = _ternary_digit(qh, pow3[:4]).reshape(n, 16)
    vals = np.concatenate([v1, v2, v3], axis=1).astype(F32)
    return vals * d


def dequant_tq2_0(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    qs = b[:, :64].reshape(n, 2, 32)
    d = _f16(b[:, 64:66])[:, None]
    two = ((qs[:, :, None, :] >> (2 * np.arange(4)[:, None])) & 3).astype(np.int16)
    return ((two - 1).reshape(n, QK_K).astype(F32)) * d


IQ_DEQUANT = {
    GGMLType.IQ2_XXS: dequant_iq2_xxs,
    GGMLType.IQ2_XS: dequant_iq2_xs,
    GGMLType.IQ2_S: dequant_iq2_s,
    GGMLType.IQ3_XXS: dequant_iq3_xxs,
    GGMLType.IQ3_S: dequant_iq3_s,
    GGMLType.IQ1_S: dequant_iq1_s,
    GGMLType.IQ1_M: dequant_iq1_m,
    GGMLType.TQ1_0: dequant_tq1_0,
    GGMLType.TQ2_0: dequant_tq2_0,
}


def iq_group_scales(b: np.ndarray, gtype: GGMLType) -> np.ndarray:
    """Per-scale-group effective f32 scales of one block array (n, type_size)
    → (n, 256/G). These are the premultiplied `scale` planes of the fused
    qmm schema (ops/qmatmul.py): with the value LUTs there,
    dequant == scale[g] · lut[code] bit-exactly (sign flips and the IQ1
    ±0.125 delta are exact in f32)."""
    n = b.shape[0]
    if gtype == GGMLType.IQ2_XXS:
        d = _f16(b[:, :2])
        aux = np.ascontiguousarray(b[:, 2:]).view("<u4").reshape(n, 8, 2)[:, :, 1]
        return d[:, None] * (F32(0.5) + (aux >> 28).astype(F32)) * F32(0.25)
    if gtype == GGMLType.IQ2_XS:
        d = _f16(b[:, :2])
        scales = b[:, 66:74]
        half = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)
        return (d[:, None, None] * (F32(0.5) + half) * F32(0.25)).reshape(n, 16)
    if gtype == GGMLType.IQ2_S:
        d = _f16(b[:, :2])
        scales = b[:, 74:82]
        half = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(F32)
        return (d[:, None, None] * (F32(0.5) + half) * F32(0.25)).reshape(n, 16)
    if gtype == GGMLType.IQ3_XXS:
        d = _f16(b[:, :2])
        aux = np.ascontiguousarray(b[:, 66:98]).view("<u4").reshape(n, 8)
        return d[:, None] * (F32(0.5) + (aux >> 28).astype(F32)) * F32(0.5)
    if gtype == GGMLType.IQ3_S:
        d = _f16(b[:, :2])
        scales = b[:, 106:110]
        nib = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(n, 8)
        return d[:, None] * (F32(1) + F32(2) * nib.astype(F32))
    if gtype == GGMLType.IQ1_S:
        d = _f16(b[:, :2])
        qh = np.ascontiguousarray(b[:, 34:50]).view("<u2").reshape(n, 8)
        return d[:, None] * (2 * ((qh >> 12) & 7) + 1).astype(F32)
    if gtype == GGMLType.IQ1_M:
        sc = np.ascontiguousarray(b[:, 48:56]).view("<u2").reshape(n, 4)
        dbits = (
            (sc[:, 0] >> 12)
            | ((sc[:, 1] >> 8) & 0x00F0)
            | ((sc[:, 2] >> 4) & 0x0F00)
            | (sc[:, 3] & 0xF000)
        ).astype("<u2")
        d = dbits.view("<f2").astype(F32)
        shift = 6 * (np.arange(8) % 2)
        w = sc[:, np.arange(8) // 2]
        dl1 = d[:, None] * (2 * ((w >> shift) & 7) + 1).astype(F32)
        dl2 = d[:, None] * (2 * ((w >> (shift + 3)) & 7) + 1).astype(F32)
        return np.stack([dl1, dl2], axis=-1).reshape(n, 16)  # per 16 elements
    if gtype in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        off = 52 if gtype == GGMLType.TQ1_0 else 64
        return _f16(b[:, off : off + 2]).reshape(n, 1)
    raise NotImplementedError(gtype)
