"""i-quant (IQ1/IQ2/IQ3) encoders.

Independent TPU-side implementation of the reference's grid-search
quantizers (ggml/src/ggml-quants.c quantize_row_iq*): each subgroup of
weights is snapped to the nearest lattice codeword by correlation-maximizing
search over the format's grid table, signs are packed either as
parity-constrained ksigns indices (IQ2_XXS/XS, IQ3_XXS — the 8th sign is
the odd-parity bit, so one least-significant element flips when the desired
pattern has the wrong parity) or explicit bytes (IQ2_S/IQ3_S), and group
scales are least-squares fitted then quantized into each format's scale
field. Bit layouts exactly mirror tpullm.quant.iq_codecs' decoders
(ggml-common.h block structs); quality is validated by round-trip error
bounds (test-quantize-fns analog), not bit-identity with ggml's search.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from .iq_codecs import (GRID_IQ1S, GRID_IQ2S, GRID_IQ2XS, GRID_IQ2XXS,
                        GRID_IQ3S, GRID_IQ3XXS, IQ1_DELTA, KSIGNS, QK_K)

F32 = np.float32


def _f16_bytes(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.astype("<f2")).view(np.uint8).reshape(-1, 2)


def _best_rows(m: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """m [..., w] nonneg targets; grid [R, w] nonneg codewords → row indices
    maximizing the scale-invariant correlation (m·g)²/(g·g)."""
    gnorm = (grid * grid).sum(1) + 1e-12  # [R]
    dots = m @ grid.T  # [..., R]
    return np.argmax(dots * dots / gnorm, axis=-1)


def _rows_with_scale(m: np.ndarray, grid: np.ndarray, group_elems: int,
                     n_iter: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Joint (rows, shared-scale) search: subgroups within a scale group
    share ONE scale, so per-subgroup scale-invariant picks are refined
    against the fitted group scale (the essence of ggml's iq quantizer
    iteration). m: [..., G, S, w] nonneg with groups of S subgroups sharing
    a scale. Returns (rows [..., G, S], scales [..., G])."""
    gnorm = (grid * grid).sum(1) + 1e-12  # [R]
    dots = m @ grid.T  # [..., G, S, R]
    rows = np.argmax(dots * dots / gnorm, axis=-1)
    w = grid.shape[1]
    for _ in range(n_iter):
        rec = grid[rows]  # [..., G, S, w]
        num = (m * rec).sum((-1, -2))
        den = (rec * rec).sum((-1, -2)) + 1e-12
        s = np.maximum(num / den, 1e-12)  # [..., G]
        # re-pick rows minimizing ||m - s·g||² given the shared scale
        cost = (s[..., None, None] ** 2) * gnorm - 2 * s[..., None, None] * dots
        rows = np.argmin(cost, axis=-1)
    rec = grid[rows]
    num = (m * rec).sum((-1, -2))
    den = (rec * rec).sum((-1, -2)) + 1e-12
    return rows, np.maximum(num / den, 0.0)


def _ksign_index(signs_neg: np.ndarray, mags: np.ndarray):
    """signs_neg [..., 8] bool (True = negative), mags [..., 8] |x|.

    The ksigns table stores only odd-parity bytes: bit7 = parity of bits0-6.
    Any desired pattern whose 8th sign disagrees with the parity of the
    first 7 flips the smallest-magnitude element. Returns (7-bit index,
    effective ±1 signs [..., 8])."""
    bits = signs_neg.astype(np.uint8)
    parity = np.bitwise_xor.reduce(bits, axis=-1)  # parity of all 8
    bad = parity.astype(bool)  # odd number of negatives overall → invalid
    # ksigns byte b has popcount(b) even overall (bit7 = parity of low 7),
    # so representable patterns have EVEN total negatives; flip min-|x|
    flip_at = np.argmin(mags, axis=-1)
    idx = np.arange(8)
    flip_mask = bad[..., None] & (idx == flip_at[..., None])
    bits = bits ^ flip_mask.astype(np.uint8)
    byte = np.zeros(bits.shape[:-1], dtype=np.uint8)
    for b in range(8):
        byte |= bits[..., b] << b
    k = byte & 127
    signs = np.where(bits.astype(bool), F32(-1), F32(1))
    return k.astype(np.uint32), signs


def _fit_group_scale(x: np.ndarray, rec: np.ndarray) -> np.ndarray:
    """Least-squares scale per leading axis: argmin_s ||x - s*rec||²."""
    num = (x * rec).sum(-1)
    den = (rec * rec).sum(-1) + 1e-12
    return np.maximum(num / den, 0.0)


def _pack_u32(words: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(words.astype("<u4")).view(np.uint8)


def quant_iq2_xxs(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    xg = x.reshape(n, 8, 4, 8)  # group, subgroup, elem
    mags = np.abs(xg)
    rows, sc = _rows_with_scale(mags, GRID_IQ2XXS, 4)  # (n,8,4), (n,8)
    kidx, signs = _ksign_index(xg < 0, mags)
    d = np.maximum(sc.max(1) / (0.25 * 15.5), 1e-8)
    L = np.clip(np.round(sc / (0.25 * d[:, None]) - 0.5), 0, 15).astype(np.uint32)

    out = np.zeros((n, 66), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d)
    gword = (rows.astype(np.uint32)
             * (1 << (8 * np.arange(4, dtype=np.uint32)))).sum(-1)  # (n,8)
    aux = (kidx * (1 << (7 * np.arange(4, dtype=np.uint32)))).sum(-1) \
        | (L << 28)
    qwords = np.stack([gword, aux], axis=-1).reshape(n, 16)
    out[:, 2:] = _pack_u32(qwords).reshape(n, 64)
    return out.reshape(-1)


def quant_iq2_xs(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    xg = x.reshape(n, 8, 4, 8)
    mags = np.abs(xg)
    # two scales per group: subgroups (0,1) and (2,3)
    rows2, sc = _rows_with_scale(
        mags.reshape(n, 8, 2, 2, 8).reshape(n, 16, 2, 8), GRID_IQ2XS, 2)
    rows = rows2.reshape(n, 8, 4)
    sc = sc.reshape(n, 8, 2)
    kidx, signs = _ksign_index(xg < 0, mags)
    d = np.maximum(sc.reshape(n, -1).max(1) / (0.25 * 15.5), 1e-8)
    L = np.clip(np.round(sc / (0.25 * d[:, None, None]) - 0.5), 0, 15
                ).astype(np.uint8)

    out = np.zeros((n, 74), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d)
    q16 = (rows.astype(np.uint16) | (kidx.astype(np.uint16) << 9))
    out[:, 2:66] = np.ascontiguousarray(q16.astype("<u2")).view(np.uint8).reshape(n, 64)
    out[:, 66:74] = L[:, :, 0] | (L[:, :, 1] << 4)
    return out.reshape(-1)


def quant_iq2_s(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    xg = x.reshape(n, 8, 4, 8)
    mags = np.abs(xg)
    rows2, sc = _rows_with_scale(
        mags.reshape(n, 16, 2, 8), GRID_IQ2S, 2)
    rows = rows2.reshape(n, 8, 4)
    sc = sc.reshape(n, 8, 2)
    neg = (xg < 0)
    d = np.maximum(sc.reshape(n, -1).max(1) / (0.25 * 15.5), 1e-8)
    L = np.clip(np.round(sc / (0.25 * d[:, None, None]) - 0.5), 0, 15
                ).astype(np.uint8)

    out = np.zeros((n, 82), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d)
    out[:, 2:34] = (rows & 0xFF).astype(np.uint8).reshape(n, 32)
    sbytes = np.zeros((n, 8, 4), dtype=np.uint8)
    for b in range(8):
        sbytes |= neg[..., b].astype(np.uint8) << b
    out[:, 34:66] = sbytes.reshape(n, 32)
    hi = (rows >> 8).astype(np.uint8)  # (n, 8, 4) 2-bit each
    out[:, 66:74] = (hi * (1 << (2 * np.arange(4, dtype=np.uint8)))).sum(-1,
                                                                         dtype=np.uint8)
    out[:, 74:82] = L[:, :, 0] | (L[:, :, 1] << 4)
    return out.reshape(-1)


def quant_iq3_xxs(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    x4 = x.reshape(n, 8, 8, 4)  # group, codeword, elem-of-4
    mags4 = np.abs(x4)
    rows, sc = _rows_with_scale(mags4, GRID_IQ3XXS, 8)  # (n,8,8), (n,8)
    # signs packed per 8 elements (= 2 codewords)
    x8 = x.reshape(n, 8, 4, 8)
    kidx, signs8 = _ksign_index(x8 < 0, np.abs(x8))
    d = np.maximum(sc.max(1) / (0.5 * 15.5), 1e-8)
    L = np.clip(np.round(sc / (0.5 * d[:, None]) - 0.5), 0, 15).astype(np.uint32)

    out = np.zeros((n, 98), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d)
    out[:, 2:66] = rows.astype(np.uint8).reshape(n, 64)
    aux = (kidx * (1 << (7 * np.arange(4, dtype=np.uint32)))).sum(-1) | (L << 28)
    out[:, 66:98] = _pack_u32(aux).reshape(n, 32)
    return out.reshape(-1)


def quant_iq3_s(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    x4 = x.reshape(n, 8, 8, 4)
    rows, sc = _rows_with_scale(np.abs(x4), GRID_IQ3S, 8)  # (n,8,8), (n,8)
    x8 = x.reshape(n, 8, 4, 8)
    neg = x8 < 0
    d = np.maximum(sc.max(1) / 31.0, 1e-8)  # db = d*(1+2L), L≤15
    L = np.clip(np.round((sc / d[:, None] - 1.0) / 2.0), 0, 15).astype(np.uint8)

    out = np.zeros((n, 110), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d)
    out[:, 2:66] = (rows & 0xFF).astype(np.uint8).reshape(n, 64)
    hi = (rows >> 8).astype(np.uint8)  # (n, 8, 8) 1-bit
    out[:, 66:74] = (hi * (1 << np.arange(8, dtype=np.uint8))).sum(-1,
                                                                   dtype=np.uint8)
    sbytes = np.zeros((n, 8, 4), dtype=np.uint8)
    for b in range(8):
        sbytes |= neg[..., b].astype(np.uint8) << b
    out[:, 74:106] = sbytes.reshape(n, 32)
    out[:, 106:110] = L[:, 0::2] | (L[:, 1::2] << 4)
    return out.reshape(-1)


def _iq1_search(x8: np.ndarray, delta: np.ndarray, shared_scale: bool = True,
                n_iter: int = 3):
    """x8 [..., G, S, 8]; delta same leading shape (per subgroup): best
    GRID_IQ1S rows for x ≈ s*(g+δ) with s shared per group when
    shared_scale. Returns (rows, rec=g+δ selected, scales per group)."""
    cand_p = GRID_IQ1S + F32(IQ1_DELTA)
    cand_m = GRID_IQ1S - F32(IQ1_DELTA)
    use_m = delta < 0
    # dots[..., R]: x·(g+δ) for this subgroup's delta choice
    dots = np.where(
        use_m[..., None],
        x8 @ cand_m.T,
        x8 @ cand_p.T,
    )
    norm_p = (cand_p * cand_p).sum(-1) + 1e-12
    norm_m = (cand_m * cand_m).sum(-1) + 1e-12
    norms = np.where(use_m[..., None], norm_m, norm_p)
    rows = np.argmax(dots * dots / norms, axis=-1)

    def rec_of(rows):
        g = GRID_IQ1S[rows]
        return g + np.where(use_m, -F32(IQ1_DELTA), F32(IQ1_DELTA))[..., None]

    for _ in range(n_iter):
        rec = rec_of(rows)
        num = (x8 * rec).sum((-1, -2))
        den = (rec * rec).sum((-1, -2)) + 1e-12
        s = np.maximum(num / den, 1e-12)  # [..., G]
        cost = (s[..., None, None] ** 2) * norms - 2 * s[..., None, None] * dots
        rows = np.argmin(cost, axis=-1)
    rec = rec_of(rows)
    num = (x8 * rec).sum((-1, -2))
    den = (rec * rec).sum((-1, -2)) + 1e-12
    return rows, rec, np.maximum(num / den, 0.0)


def quant_iq1_s(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    xg = x.reshape(n, 8, 4, 8)
    best = None
    for dsign in (F32(IQ1_DELTA), F32(-IQ1_DELTA)):
        delta = np.full((n, 8, 4), dsign, F32)
        rows, rec, sc = _iq1_search(xg, delta)
        err = ((xg.reshape(n, 8, 32)
                - sc[..., None] * rec.reshape(n, 8, 32)) ** 2).sum(-1)
        if best is None:
            best = {"rows": rows, "sc": sc, "err": err,
                    "neg": np.full((n, 8), dsign < 0)}
        else:
            better = err < best["err"]
            best["rows"] = np.where(better[..., None], rows, best["rows"])
            best["sc"] = np.where(better, sc, best["sc"])
            best["err"] = np.where(better, err, best["err"])
            best["neg"] = np.where(better, dsign < 0, best["neg"])
    sc = best["sc"]
    d = np.maximum(sc.max(1) / 15.0, 1e-8)  # dl = d*(2L+1), L≤7
    L = np.clip(np.round((sc / d[:, None] - 1.0) / 2.0), 0, 7).astype(np.uint16)

    out = np.zeros((n, 50), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d)
    rows = best["rows"].astype(np.uint16)  # (n, 8, 4) in [0,2048)
    out[:, 2:34] = (rows & 0xFF).astype(np.uint8).reshape(n, 32)
    hi = (rows >> 8).astype(np.uint16)  # 3 bits each
    qh = (hi * (1 << (3 * np.arange(4, dtype=np.uint16)))).sum(-1,
                                                               dtype=np.uint16)
    qh |= L << 12
    qh |= best["neg"].astype(np.uint16) << 15
    out[:, 34:50] = np.ascontiguousarray(qh.astype("<u2")).view(np.uint8).reshape(n, 16)
    return out.reshape(-1)


def quant_iq1_m(values: np.ndarray) -> np.ndarray:
    x = values.reshape(-1, QK_K)
    n = x.shape[0]
    xg = x.reshape(n, 8, 4, 8)  # group, codeword-of-8, elem
    # per-codeword delta sign: pick the better of ±δ per subgroup against
    # the shared (per-16) scale; scale groups are codeword pairs
    xp = xg.reshape(n, 16, 2, 8)  # (pairs, codeword-in-pair)
    rows_p, rec_p, sc_p = _iq1_search(
        xp, np.full((n, 16, 2), IQ1_DELTA, F32))
    rows_m, rec_m, sc_m = _iq1_search(
        xp, np.full((n, 16, 2), -IQ1_DELTA, F32))
    err_p = ((xp - sc_p[..., None, None] * rec_p) ** 2).sum(-1)
    err_m = ((xp - sc_m[..., None, None] * rec_m) ** 2).sum(-1)
    negp = err_m < err_p  # (n, 16, 2) per subgroup
    rows = np.where(negp, rows_m, rows_p).reshape(n, 8, 4)
    rec = np.where(negp[..., None], rec_m, rec_p)
    neg = negp.reshape(n, 8, 4)
    sc = _fit_group_scale(
        xp.reshape(n, 8, 2, 16), rec.reshape(n, 8, 2, 16))  # (n, 8, 2)
    d = np.maximum(sc.reshape(n, -1).max(1) / 15.0, 1e-8)
    L = np.clip(np.round((sc / d[:, None, None] - 1.0) / 2.0), 0, 7
                ).astype(np.uint16)

    out = np.zeros((n, 56), dtype=np.uint8)
    rows16 = rows.astype(np.uint16)
    out[:, 0:32] = (rows16 & 0xFF).astype(np.uint8).reshape(n, 32)
    hi = (rows16 >> 8).astype(np.uint8)  # (n, 8, 4) 3-bit
    qh0 = hi[..., 0] | (neg[..., 0] << 3) | (hi[..., 1] << 4) | (neg[..., 1].astype(np.uint8) << 7)
    qh1 = hi[..., 2] | (neg[..., 2] << 3) | (hi[..., 3] << 4) | (neg[..., 3].astype(np.uint8) << 7)
    out[:, 32:48] = np.stack([qh0, qh1], axis=-1).astype(np.uint8).reshape(n, 16)
    dbits = np.ascontiguousarray(d.astype("<f2")).view("<u2").reshape(-1)
    sc_words = np.zeros((n, 4), dtype=np.uint16)
    for ib in range(8):
        w = ib // 2
        shift = 6 * (ib % 2)
        sc_words[:, w] |= L[:, ib, 0] << shift
        sc_words[:, w] |= L[:, ib, 1] << (shift + 3)
    sc_words[:, 0] |= (dbits & 0x000F) << 12
    sc_words[:, 1] |= (dbits & 0x00F0) << 8
    sc_words[:, 2] |= (dbits & 0x0F00) << 4
    sc_words[:, 3] |= dbits & 0xF000
    out[:, 48:56] = np.ascontiguousarray(sc_words.astype("<u2")).view(np.uint8).reshape(n, 8)
    return out.reshape(-1)


IQ_QUANT = {
    GGMLType.IQ2_XXS: quant_iq2_xxs,
    GGMLType.IQ2_XS: quant_iq2_xs,
    GGMLType.IQ2_S: quant_iq2_s,
    GGMLType.IQ3_XXS: quant_iq3_xxs,
    GGMLType.IQ3_S: quant_iq3_s,
    GGMLType.IQ1_S: quant_iq1_s,
    GGMLType.IQ1_M: quant_iq1_m,
}
