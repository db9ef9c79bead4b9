// tpullm native quant codecs.
//
// C++ implementations of the ggml block-quant encode/decode hot loops used by
// the GGUF loader, the quantize tool, and the weight repacker. Layouts follow
// SURVEY.md Appendix B (ggml-common.h block static_asserts); the algorithms
// mirror tpullm/quant/codecs.py (the numpy reference, which stays the test
// oracle — dequantization here must be bit-exact against it).
//
// Exposed as a C ABI for ctypes (tpullm/quant/native.py). Single-threaded by
// design: callers parallelize across tensors.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

constexpr int QK = 32;    // small-block element count
constexpr int QK_K = 256; // superblock element count

// ---- IEEE 754 half <-> float ------------------------------------------------

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else { // subnormal: value = man·2^-24 = 1.f·2^(-14-shift)
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; ++shift; }
            man &= 0x3FF;
            // biased f32 exp = 127 + (-14 - shift); NOT -15: the subnormal
            // exponent is e_min = -14 (this off-by-one silently HALVED
            // every subnormal d — real 8B K-quant superblock scales
            // routinely sit below the 6.1e-5 f16 normal threshold)
            bits = sign | ((uint32_t)(127 - 14 - shift) << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp + 127 - 15) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

inline uint16_t f32_to_f16(float f) {
    // round-to-nearest-even, matching numpy's float32->float16 cast
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t man = bits & 0x7FFFFF;
    if (((bits >> 23) & 0xFF) == 0xFF) { // inf/nan
        return (uint16_t)(sign | 0x7C00 | (man ? 0x200 : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00); // overflow -> inf
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign; // underflow -> 0
        man |= 0x800000; // implicit bit
        int shift = 14 - exp;
        uint32_t half_man = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half_man & 1))) half_man++;
        return (uint16_t)(sign | half_man);
    }
    uint32_t half_man = man >> 13;
    uint32_t rem = man & 0x1FFF;
    uint16_t out = (uint16_t)(sign | (exp << 10) | half_man);
    if (rem > 0x1000 || (rem == 0x1000 && (half_man & 1))) out++; // RNE
    return out;
}

inline int nearest_int(float x) {
    // round-half-to-even (codecs.py _nearest_int = np.rint; same as ggml's
    // magic-number rounding)
    return (int)std::lrintf(x);
}

inline uint16_t load_u16(const uint8_t* p) {
    uint16_t v; std::memcpy(&v, p, 2); return v;
}

// ---- small-block dequant ------------------------------------------------------

void dq_q4_0(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 18, y += QK) {
        float d = f16_to_f32(load_u16(b));
        for (int j = 0; j < 16; ++j) {
            y[j]      = d * (float)((int)(b[2 + j] & 0x0F) - 8);
            y[j + 16] = d * (float)((int)(b[2 + j] >> 4) - 8);
        }
    }
}

void dq_q4_1(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 20, y += QK) {
        float d = f16_to_f32(load_u16(b));
        float m = f16_to_f32(load_u16(b + 2));
        for (int j = 0; j < 16; ++j) {
            y[j]      = d * (float)(b[4 + j] & 0x0F) + m;
            y[j + 16] = d * (float)(b[4 + j] >> 4) + m;
        }
    }
}

void dq_q5_0(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 22, y += QK) {
        float d = f16_to_f32(load_u16(b));
        uint32_t qh; std::memcpy(&qh, b + 2, 4);
        for (int j = 0; j < 16; ++j) {
            int h1 = (qh >> j) & 1, h2 = (qh >> (j + 16)) & 1;
            y[j]      = d * (float)(((int)(b[6 + j] & 0x0F) | (h1 << 4)) - 16);
            y[j + 16] = d * (float)(((int)(b[6 + j] >> 4) | (h2 << 4)) - 16);
        }
    }
}

void dq_q5_1(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 24, y += QK) {
        float d = f16_to_f32(load_u16(b));
        float m = f16_to_f32(load_u16(b + 2));
        uint32_t qh; std::memcpy(&qh, b + 4, 4);
        for (int j = 0; j < 16; ++j) {
            int h1 = (qh >> j) & 1, h2 = (qh >> (j + 16)) & 1;
            y[j]      = d * (float)((int)(b[8 + j] & 0x0F) | (h1 << 4)) + m;
            y[j + 16] = d * (float)((int)(b[8 + j] >> 4) | (h2 << 4)) + m;
        }
    }
}

void dq_q8_0(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 34, y += QK) {
        float d = f16_to_f32(load_u16(b));
        const int8_t* q = (const int8_t*)(b + 2);
        for (int j = 0; j < QK; ++j) y[j] = d * (float)q[j];
    }
}

// ---- K-quant dequant ----------------------------------------------------------

inline void get_scale_min_k4(const uint8_t* q, uint8_t* sc, uint8_t* m) {
    for (int j = 0; j < 4; ++j) {
        sc[j] = q[j] & 63;
        m[j] = q[j + 4] & 63;
    }
    for (int j = 4; j < 8; ++j) {
        sc[j] = (q[j + 4] & 0x0F) | ((q[j - 4] >> 6) << 4);
        m[j] = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

void dq_q4_k(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 144, y += QK_K) {
        float d = f16_to_f32(load_u16(b));
        float dmin = f16_to_f32(load_u16(b + 2));
        uint8_t sc[8], mi[8];
        get_scale_min_k4(b + 4, sc, mi);
        const uint8_t* qs = b + 16;
        for (int c = 0; c < 4; ++c) {
            float d1 = d * (float)sc[2 * c], m1 = dmin * (float)mi[2 * c];
            float d2 = d * (float)sc[2 * c + 1], m2 = dmin * (float)mi[2 * c + 1];
            const uint8_t* chunk = qs + 32 * c;
            float* out = y + 64 * c;
            for (int j = 0; j < 32; ++j) {
                out[j]      = d1 * (float)(chunk[j] & 0x0F) - m1;
                out[j + 32] = d2 * (float)(chunk[j] >> 4) - m2;
            }
        }
    }
}

void dq_q5_k(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 176, y += QK_K) {
        float d = f16_to_f32(load_u16(b));
        float dmin = f16_to_f32(load_u16(b + 2));
        uint8_t sc[8], mi[8];
        get_scale_min_k4(b + 4, sc, mi);
        const uint8_t* qh = b + 16;
        const uint8_t* ql = b + 48;
        for (int c = 0; c < 4; ++c) {
            float d1 = d * (float)sc[2 * c], m1 = dmin * (float)mi[2 * c];
            float d2 = d * (float)sc[2 * c + 1], m2 = dmin * (float)mi[2 * c + 1];
            const uint8_t* chunk = ql + 32 * c;
            float* out = y + 64 * c;
            for (int j = 0; j < 32; ++j) {
                float hb1 = (float)((qh[j] >> (2 * c)) & 1);
                float hb2 = (float)((qh[j] >> (2 * c + 1)) & 1);
                out[j]      = d1 * ((float)(chunk[j] & 0x0F) + 16.0f * hb1) - m1;
                out[j + 32] = d2 * ((float)(chunk[j] >> 4) + 16.0f * hb2) - m2;
            }
        }
    }
}

void dq_q6_k(const uint8_t* b, float* y, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, b += 210, y += QK_K) {
        const uint8_t* ql = b;
        const uint8_t* qh = b + 128;
        const int8_t* sc = (const int8_t*)(b + 192);
        float d = f16_to_f32(load_u16(b + 208));
        for (int half = 0; half < 2; ++half) {
            const uint8_t* qlh = ql + 64 * half;
            const uint8_t* qhh = qh + 32 * half;
            float* out = y + 128 * half;
            const int8_t* s = sc + 8 * half;
            for (int j = 0; j < 32; ++j) {
                int is = j / 16;
                int q1 = (int)((qlh[j] & 0x0F) | (((qhh[j] >> 0) & 3) << 4)) - 32;
                int q2 = (int)((qlh[j + 32] & 0x0F) | (((qhh[j] >> 2) & 3) << 4)) - 32;
                int q3 = (int)((qlh[j] >> 4) | (((qhh[j] >> 4) & 3) << 4)) - 32;
                int q4 = (int)((qlh[j + 32] >> 4) | (((qhh[j] >> 6) & 3) << 4)) - 32;
                out[j]      = d * (float)s[0 + is] * (float)q1;
                out[j + 32] = d * (float)s[2 + is] * (float)q2;
                out[j + 64] = d * (float)s[4 + is] * (float)q3;
                out[j + 96] = d * (float)s[6 + is] * (float)q4;
            }
        }
    }
}

void dq_q2_k(const uint8_t* b, float* y, int64_t nb) {
    // layout: 16 scale bytes (lo nibble = scale, hi = min), 64 bytes of
    // 2-bit elements in two 32-byte halves, shift-major within each half,
    // two 16-element scale groups per (half, shift) row
    for (int64_t i = 0; i < nb; ++i, b += 84, y += QK_K) {
        const uint8_t* scales = b;
        const uint8_t* qs = b + 16;
        float d = f16_to_f32(load_u16(b + 80));
        float dmin = f16_to_f32(load_u16(b + 82));
        int pos = 0, is = 0;
        for (int half = 0; half < 2; ++half) {
            const uint8_t* q = qs + 32 * half;
            for (int shift = 0; shift < 8; shift += 2) {
                for (int part = 0; part < 2; ++part) {
                    float dl = d * (float)(scales[is] & 0x0F);
                    float ml = dmin * (float)(scales[is] >> 4);
                    ++is;
                    for (int j = 0; j < 16; ++j) {
                        int v = (q[16 * part + j] >> shift) & 3;
                        y[pos + j] = dl * (float)v - ml;
                    }
                    pos += 16;
                }
            }
        }
    }
}

// ---- quantize -----------------------------------------------------------------

void qz_q8_0(const float* x, uint8_t* b, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, x += QK, b += 34) {
        float amax = 0.0f;
        for (int j = 0; j < QK; ++j) amax = std::max(amax, std::fabs(x[j]));
        float d = amax / 127.0f;
        float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint16_t h = f32_to_f16(d);
        std::memcpy(b, &h, 2);
        int8_t* q = (int8_t*)(b + 2);
        for (int j = 0; j < QK; ++j) {
            int v = nearest_int(x[j] * id);
            q[j] = (int8_t)std::min(127, std::max(-127, v));
        }
    }
}

void qz_q4_0(const float* x, uint8_t* b, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, x += QK, b += 18) {
        float amax = 0.0f, maxv = 0.0f;
        for (int j = 0; j < QK; ++j) {
            if (std::fabs(x[j]) > amax) { amax = std::fabs(x[j]); maxv = x[j]; }
        }
        float d = maxv / -8.0f;
        float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint16_t h = f32_to_f16(d);
        std::memcpy(b, &h, 2);
        uint8_t q[QK];
        for (int j = 0; j < QK; ++j) {
            int v = (int)(x[j] * id + 8.5f);
            q[j] = (uint8_t)std::min(15, std::max(0, v));
        }
        for (int j = 0; j < 16; ++j) b[2 + j] = q[j] | (q[j + 16] << 4);
    }
}

// weighted scale search (codecs.py _make_qx_quants semantics)
float make_qx_quants(int n, int nmax, const float* x, int8_t* L) {
    float amax = 0.0f, maxv = 0.0f;
    for (int j = 0; j < n; ++j) {
        if (std::fabs(x[j]) > amax) { amax = std::fabs(x[j]); maxv = x[j]; }
    }
    if (amax < 1e-30f) {
        for (int j = 0; j < n; ++j) L[j] = 0;
        return 0.0f;
    }
    float best_scale = 0.0f, best_obj = -1e30f;
    int8_t cand[64];
    auto eval = [&](float iscale, bool geq) {
        float sumlx = 0.0f, suml2 = 0.0f;
        for (int j = 0; j < n; ++j) {
            int l = nearest_int(iscale * x[j]);
            l = std::min(nmax - 1, std::max(-nmax, l));
            cand[j] = (int8_t)l;
            float w = x[j] * x[j];
            sumlx += w * x[j] * l;
            suml2 += w * l * l;
        }
        if (suml2 <= 0.0f) return;
        float scale = sumlx / suml2;
        float obj = scale * sumlx;
        if (geq ? (obj >= best_obj) : (obj > best_obj)) {
            best_obj = obj;
            best_scale = scale;
            for (int j = 0; j < n; ++j) L[j] = cand[j];
        }
    };
    for (int is = -9; is <= 9; ++is) eval(-(nmax + 0.1f * is) / maxv, false);
    eval(-(float)nmax / maxv, true); // base candidate wins ties
    return best_scale;
}

// joint (scale, min) weighted LS search (codecs.py _make_qkx2_quants)
void make_qkx2_quants(int n, int nmax, const float* x, const float* weights,
                      float* out_scale, float* out_neg_min, uint8_t* L) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < n; ++j) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    mn = std::min(mn, 0.0f);
    bool flat = mx == mn;
    float span = flat ? 1.0f : mx - mn;
    float sum_w = 0.0f, sum_x = 0.0f;
    for (int j = 0; j < n; ++j) { sum_w += weights[j]; sum_x += weights[j] * x[j]; }

    uint8_t cand[64];
    float best_err = 1e30f, scale = 0.0f, minv = 0.0f;

    auto fit = [&](float iscale) {
        float sum_l = 0.0f, sum_l2 = 0.0f, sum_xl = 0.0f;
        for (int j = 0; j < n; ++j) {
            int l = nearest_int(iscale * (x[j] - mn));
            l = std::min(nmax, std::max(0, l));
            cand[j] = (uint8_t)l;
            sum_l += weights[j] * l;
            sum_l2 += weights[j] * l * l;
            sum_xl += weights[j] * l * x[j];
        }
        float D = sum_w * sum_l2 - sum_l * sum_l;
        float this_scale = 0.0f, this_min = 0.0f;
        if (D > 0.0f) {
            this_scale = (sum_w * sum_xl - sum_x * sum_l) / D;
            this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D;
        }
        if (this_min > 0.0f) {
            this_scale = sum_l2 > 0.0f ? sum_xl / sum_l2 : 0.0f;
            this_min = 0.0f;
        }
        float err = 0.0f;
        for (int j = 0; j < n; ++j) {
            float diff = this_scale * cand[j] + this_min - x[j];
            err += weights[j] * diff * diff;
        }
        if (err < best_err) {
            best_err = err;
            scale = this_scale;
            minv = this_min;
            for (int j = 0; j < n; ++j) L[j] = cand[j];
        }
    };

    float iscale0 = (float)nmax / span;
    fit(iscale0);
    // the simple-rounding initial assignment competes too
    {
        float init_err = 0.0f;
        uint8_t init_l[64];
        float init_scale = span / nmax;
        for (int j = 0; j < n; ++j) {
            int l = nearest_int(iscale0 * (x[j] - mn));
            l = std::min(nmax, std::max(0, l));
            init_l[j] = (uint8_t)l;
            float diff = init_scale * l + mn - x[j];
            init_err += weights[j] * diff * diff;
        }
        if (init_err < best_err) {
            best_err = init_err;
            scale = init_scale;
            minv = mn;
            for (int j = 0; j < n; ++j) L[j] = init_l[j];
        }
    }
    for (int is = 0; is <= 20; ++is) {
        fit((-1.0f + 0.1f * is + nmax) / span);
    }
    if (flat && mn == 0.0f) { scale = 0.0f; minv = 0.0f; }
    *out_scale = scale;
    *out_neg_min = -minv;
}

inline void pack_scale_min_k4(const uint8_t* ls, const uint8_t* lm, uint8_t* out) {
    for (int j = 0; j < 12; ++j) out[j] = 0;
    for (int j = 0; j < 4; ++j) {
        out[j] = ls[j] & 63;
        out[j + 4] = lm[j] & 63;
    }
    for (int j = 4; j < 8; ++j) {
        out[j + 4] = (ls[j] & 0x0F) | ((lm[j] & 0x0F) << 4);
        out[j - 4] |= (ls[j] >> 4) << 6;
        out[j] |= (lm[j] >> 4) << 6;
    }
}

void qz_q4_k(const float* x, uint8_t* b, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, x += QK_K, b += 144) {
        float scales[8], mins[8];
        uint8_t Lg[8][32];
        for (int g = 0; g < 8; ++g) {
            const float* gx = x + 32 * g;
            float sum_x2 = 0.0f;
            for (int j = 0; j < 32; ++j) sum_x2 += gx[j] * gx[j];
            float av_x = std::sqrt(sum_x2 / 32.0f);
            float w[32];
            for (int j = 0; j < 32; ++j) w[j] = av_x + std::fabs(gx[j]);
            make_qkx2_quants(32, 15, gx, w, &scales[g], &mins[g], Lg[g]);
        }
        float max_scale = 0.0f, max_min = 0.0f;
        for (int g = 0; g < 8; ++g) {
            max_scale = std::max(max_scale, scales[g]);
            max_min = std::max(max_min, mins[g]);
        }
        float inv_scale = max_scale > 0.0f ? 63.0f / max_scale : 0.0f;
        float inv_min = max_min > 0.0f ? 63.0f / max_min : 0.0f;
        uint8_t ls[8], lm[8];
        for (int g = 0; g < 8; ++g) {
            ls[g] = (uint8_t)std::min(63, nearest_int(inv_scale * scales[g]));
            lm[g] = (uint8_t)std::min(63, nearest_int(inv_min * mins[g]));
        }
        uint16_t dh = f32_to_f16(max_scale / 63.0f);
        uint16_t dminh = f32_to_f16(max_min / 63.0f);
        std::memcpy(b, &dh, 2);
        std::memcpy(b + 2, &dminh, 2);
        pack_scale_min_k4(ls, lm, b + 4);
        float d_eff = f16_to_f32(dh), dmin_eff = f16_to_f32(dminh);
        uint8_t L[QK_K];
        for (int g = 0; g < 8; ++g) {
            float dg = d_eff * (float)ls[g];
            float mg = dmin_eff * (float)lm[g];
            const float* gx = x + 32 * g;
            for (int j = 0; j < 32; ++j) {
                int l = dg != 0.0f ? nearest_int((gx[j] + mg) / dg) : 0;
                L[32 * g + j] = (uint8_t)std::min(15, std::max(0, l));
            }
        }
        for (int c = 0; c < 4; ++c) {
            for (int j = 0; j < 32; ++j) {
                b[16 + 32 * c + j] = L[64 * c + j] | (L[64 * c + 32 + j] << 4);
            }
        }
    }
}

void qz_q5_k(const float* x, uint8_t* b, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, x += QK_K, b += 176) {
        float scales[8], mins[8];
        uint8_t Lg[8][32];
        for (int g = 0; g < 8; ++g) {
            const float* gx = x + 32 * g;
            float sum_x2 = 0.0f;
            for (int j = 0; j < 32; ++j) sum_x2 += gx[j] * gx[j];
            float av_x = std::sqrt(sum_x2 / 32.0f);
            float w[32];
            for (int j = 0; j < 32; ++j) w[j] = av_x + std::fabs(gx[j]);
            make_qkx2_quants(32, 31, gx, w, &scales[g], &mins[g], Lg[g]);
        }
        float max_scale = 0.0f, max_min = 0.0f;
        for (int g = 0; g < 8; ++g) {
            max_scale = std::max(max_scale, scales[g]);
            max_min = std::max(max_min, mins[g]);
        }
        float inv_scale = max_scale > 0.0f ? 63.0f / max_scale : 0.0f;
        float inv_min = max_min > 0.0f ? 63.0f / max_min : 0.0f;
        uint8_t ls[8], lm[8];
        for (int g = 0; g < 8; ++g) {
            ls[g] = (uint8_t)std::min(63, nearest_int(inv_scale * scales[g]));
            lm[g] = (uint8_t)std::min(63, nearest_int(inv_min * mins[g]));
        }
        uint16_t dh = f32_to_f16(max_scale / 63.0f);
        uint16_t dminh = f32_to_f16(max_min / 63.0f);
        std::memcpy(b, &dh, 2);
        std::memcpy(b + 2, &dminh, 2);
        pack_scale_min_k4(ls, lm, b + 4);
        float d_eff = f16_to_f32(dh), dmin_eff = f16_to_f32(dminh);
        uint8_t L[QK_K];
        for (int g = 0; g < 8; ++g) {
            float dg = d_eff * (float)ls[g];
            float mg = dmin_eff * (float)lm[g];
            const float* gx = x + 32 * g;
            for (int j = 0; j < 32; ++j) {
                int l = dg != 0.0f ? nearest_int((gx[j] + mg) / dg) : 0;
                L[32 * g + j] = (uint8_t)std::min(31, std::max(0, l));
            }
        }
        uint8_t* qh = b + 16;
        uint8_t* ql = b + 48;
        std::memset(qh, 0, 32);
        for (int c = 0; c < 4; ++c) {
            for (int j = 0; j < 32; ++j) {
                uint8_t g1 = L[64 * c + j], g2 = L[64 * c + 32 + j];
                qh[j] |= ((g1 >> 4) & 1) << (2 * c);
                qh[j] |= ((g2 >> 4) & 1) << (2 * c + 1);
                ql[32 * c + j] = (g1 & 0x0F) | ((g2 & 0x0F) << 4);
            }
        }
    }
}

void qz_q6_k(const float* x, uint8_t* b, int64_t nb) {
    for (int64_t i = 0; i < nb; ++i, x += QK_K, b += 210) {
        float scales[16];
        int8_t Lg[16][16];
        for (int g = 0; g < 16; ++g) {
            scales[g] = make_qx_quants(16, 32, x + 16 * g, Lg[g]);
        }
        float amax = 0.0f, max_scale = 0.0f;
        for (int g = 0; g < 16; ++g) {
            if (std::fabs(scales[g]) > amax) {
                amax = std::fabs(scales[g]);
                max_scale = scales[g];
            }
        }
        bool dead = amax < 1e-30f;
        float safe_max = dead ? 1.0f : max_scale;
        float iscale = -128.0f / safe_max;
        uint16_t dh = f32_to_f16(dead ? 0.0f : 1.0f / iscale);
        float d_eff = f16_to_f32(dh);
        int8_t sc8[16];
        for (int g = 0; g < 16; ++g) {
            sc8[g] = (int8_t)std::min(127, nearest_int(iscale * scales[g]));
        }
        uint8_t L[QK_K];
        for (int g = 0; g < 16; ++g) {
            float dsc = d_eff * (float)sc8[g];
            const float* gx = x + 16 * g;
            for (int j = 0; j < 16; ++j) {
                int l;
                if (dead || dsc == 0.0f) {
                    l = 32;
                } else {
                    l = nearest_int(gx[j] / dsc);
                    l = std::min(31, std::max(-32, l)) + 32;
                }
                L[16 * g + j] = (uint8_t)l;
            }
        }
        uint8_t* ql = b;
        uint8_t* qh = b + 128;
        for (int half = 0; half < 2; ++half) {
            const uint8_t* e = L + 128 * half;
            for (int j = 0; j < 32; ++j) {
                uint8_t q1 = e[j], q2 = e[j + 32], q3 = e[j + 64], q4 = e[j + 96];
                ql[64 * half + j]      = (q1 & 0x0F) | ((q3 & 0x0F) << 4);
                ql[64 * half + 32 + j] = (q2 & 0x0F) | ((q4 & 0x0F) << 4);
                qh[32 * half + j] = (q1 >> 4) | ((q2 >> 4) << 2)
                                  | ((q3 >> 4) << 4) | ((q4 >> 4) << 6);
            }
        }
        std::memcpy(b + 192, sc8, 16);
        std::memcpy(b + 208, &dh, 2);
    }
}

} // namespace

extern "C" {

// type ids = GGMLType enum (tpullm/gguf/constants.py / ggml.h)
int tq_dequant(int gtype, const uint8_t* src, float* dst, int64_t n_blocks) {
    switch (gtype) {
        case 2: dq_q4_0(src, dst, n_blocks); return 0;
        case 3: dq_q4_1(src, dst, n_blocks); return 0;
        case 6: dq_q5_0(src, dst, n_blocks); return 0;
        case 7: dq_q5_1(src, dst, n_blocks); return 0;
        case 8: dq_q8_0(src, dst, n_blocks); return 0;
        case 10: dq_q2_k(src, dst, n_blocks); return 0;
        case 12: dq_q4_k(src, dst, n_blocks); return 0;
        case 13: dq_q5_k(src, dst, n_blocks); return 0;
        case 14: dq_q6_k(src, dst, n_blocks); return 0;
        default: return -1;
    }
}

int tq_quantize(int gtype, const float* src, uint8_t* dst, int64_t n_blocks) {
    switch (gtype) {
        case 2: qz_q4_0(src, dst, n_blocks); return 0;
        case 8: qz_q8_0(src, dst, n_blocks); return 0;
        case 12: qz_q4_k(src, dst, n_blocks); return 0;
        case 13: qz_q5_k(src, dst, n_blocks); return 0;
        case 14: qz_q6_k(src, dst, n_blocks); return 0;
        default: return -1;
    }
}

int tq_version(void) { return 1; }

} // extern "C"

// ---------------------------------------------------------------------------
// repack: packed ggml blocks (row-major) -> TPU planes (K-major)
// Layout contract mirrors tpullm/ops/qmatmul.py plane schema v2 exactly
// (bit-exact against the numpy reference): half-split 4-bit code planes,
// bit-plane high bits, premultiplied f32 scale/minus group planes.
// ---------------------------------------------------------------------------

namespace {

// Q4_K: qs (K/2, N) half-split U=256; scale/minus (K/32, N)
void rp_q4_k(const uint8_t* data, int64_t n_out, int64_t n_in,
             uint8_t* qs_out, float* scale_out, float* minus_out) {
    const int64_t nb = n_in / 256;     // blocks per row
    const int64_t KB = n_in / 2;       // packed code rows
    (void)KB;
    for (int64_t n = 0; n < n_out; ++n) {
        const uint8_t* row = data + n * nb * 144;
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 144;
            float d = f16_to_f32(load_u16(blk));
            float dmin = f16_to_f32(load_u16(blk + 2));
            uint8_t sc[8], mi[8];
            get_scale_min_k4(blk + 4, sc, mi);
            for (int g = 0; g < 8; ++g) {
                scale_out[(b * 8 + g) * n_out + n] = d * (float)sc[g];
                minus_out[(b * 8 + g) * n_out + n] = dmin * (float)mi[g];
            }
            const uint8_t* q = blk + 16;
            // code[e]: chunk c=e/64, j=e%64: j<32 -> q[32c+j]&0xF else q[32c+j-32]>>4
            for (int r = 0; r < 128; ++r) {
                int e1 = r, e2 = r + 128;
                int c1 = e1 >> 6, j1 = e1 & 63;
                int c2 = e2 >> 6, j2 = e2 & 63;
                uint8_t lo = j1 < 32 ? (q[32 * c1 + j1] & 0x0F)
                                     : (q[32 * c1 + j1 - 32] >> 4);
                uint8_t hi = j2 < 32 ? (q[32 * c2 + j2] & 0x0F)
                                     : (q[32 * c2 + j2 - 32] >> 4);
                qs_out[(b * 128 + r) * n_out + n] = lo | (hi << 4);
            }
        }
    }
}

// Q5_K: qs (K/2, N) low nibbles half-split; qh (K/8, N) 1-bit plane U=256
void rp_q5_k(const uint8_t* data, int64_t n_out, int64_t n_in,
             uint8_t* qs_out, uint8_t* qh_out, float* scale_out, float* minus_out) {
    const int64_t nb = n_in / 256;
    for (int64_t n = 0; n < n_out; ++n) {
        const uint8_t* row = data + n * nb * 176;
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 176;
            float d = f16_to_f32(load_u16(blk));
            float dmin = f16_to_f32(load_u16(blk + 2));
            uint8_t sc[8], mi[8];
            get_scale_min_k4(blk + 4, sc, mi);
            for (int g = 0; g < 8; ++g) {
                scale_out[(b * 8 + g) * n_out + n] = d * (float)sc[g];
                minus_out[(b * 8 + g) * n_out + n] = dmin * (float)mi[g];
            }
            const uint8_t* qh = blk + 16;
            const uint8_t* ql = blk + 48;
            uint8_t code[256];
            for (int c = 0; c < 4; ++c) {
                for (int j = 0; j < 32; ++j) {
                    uint8_t byte = ql[32 * c + j];
                    uint8_t h1 = (qh[j] >> (2 * c)) & 1;
                    uint8_t h2 = (qh[j] >> (2 * c + 1)) & 1;
                    code[64 * c + j] = (byte & 0x0F) | (h1 << 4);
                    code[64 * c + 32 + j] = (byte >> 4) | (h2 << 4);
                }
            }
            for (int r = 0; r < 128; ++r) {
                qs_out[(b * 128 + r) * n_out + n] =
                    (code[r] & 0x0F) | ((code[r + 128] & 0x0F) << 4);
            }
            // 1-bit plane: row r (0..31), field j (0..7) = highbit[j*32 + r]
            for (int r = 0; r < 32; ++r) {
                uint8_t acc = 0;
                for (int j = 0; j < 8; ++j) {
                    acc |= ((code[j * 32 + r] >> 4) & 1) << j;
                }
                qh_out[(b * 32 + r) * n_out + n] = acc;
            }
        }
    }
}

// Q6_K: qs (K/2, N) low nibbles; qh (K/4, N) 2-bit plane; scale (K/16, N)
void rp_q6_k(const uint8_t* data, int64_t n_out, int64_t n_in,
             uint8_t* qs_out, uint8_t* qh_out, float* scale_out) {
    const int64_t nb = n_in / 256;
    for (int64_t n = 0; n < n_out; ++n) {
        const uint8_t* row = data + n * nb * 210;
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 210;
            const uint8_t* ql = blk;
            const uint8_t* qh = blk + 128;
            const int8_t* sc = (const int8_t*)(blk + 192);
            float d = f16_to_f32(load_u16(blk + 208));
            for (int g = 0; g < 16; ++g) {
                scale_out[(b * 16 + g) * n_out + n] = d * (float)sc[g];
            }
            uint8_t code[256];
            for (int half = 0; half < 2; ++half) {
                const uint8_t* qlh = ql + 64 * half;
                const uint8_t* qhh = qh + 32 * half;
                uint8_t* ch = code + 128 * half;
                for (int j = 0; j < 32; ++j) {
                    ch[j]      = (qlh[j] & 0x0F) | (((qhh[j] >> 0) & 3) << 4);
                    ch[j + 32] = (qlh[j + 32] & 0x0F) | (((qhh[j] >> 2) & 3) << 4);
                    ch[j + 64] = (qlh[j] >> 4) | (((qhh[j] >> 4) & 3) << 4);
                    ch[j + 96] = (qlh[j + 32] >> 4) | (((qhh[j] >> 6) & 3) << 4);
                }
            }
            for (int r = 0; r < 128; ++r) {
                qs_out[(b * 128 + r) * n_out + n] =
                    (code[r] & 0x0F) | ((code[r + 128] & 0x0F) << 4);
            }
            // 2-bit plane: row r (0..63), field j (0..3) = hi2[j*64 + r]
            for (int r = 0; r < 64; ++r) {
                uint8_t acc = 0;
                for (int j = 0; j < 4; ++j) {
                    acc |= ((code[j * 64 + r] >> 4) & 3) << (2 * j);
                }
                qh_out[(b * 64 + r) * n_out + n] = acc;
            }
        }
    }
}

// Q8_0: qs (K, N) int8 codes; scale (K/32, N)
void rp_q8_0(const uint8_t* data, int64_t n_out, int64_t n_in,
             uint8_t* qs_out, float* scale_out) {
    const int64_t nb = n_in / 32;
    for (int64_t n = 0; n < n_out; ++n) {
        const uint8_t* row = data + n * nb * 34;
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 34;
            scale_out[b * n_out + n] = f16_to_f32(load_u16(blk));
            for (int j = 0; j < 32; ++j) {
                qs_out[(b * 32 + j) * n_out + n] = blk[2 + j];
            }
        }
    }
}

// Q4_0: qs (K/2, N) half-split U=32; scale (K/32, N)
void rp_q4_0(const uint8_t* data, int64_t n_out, int64_t n_in,
             uint8_t* qs_out, float* scale_out) {
    const int64_t nb = n_in / 32;
    for (int64_t n = 0; n < n_out; ++n) {
        const uint8_t* row = data + n * nb * 18;
        for (int64_t b = 0; b < nb; ++b) {
            const uint8_t* blk = row + b * 18;
            scale_out[b * n_out + n] = f16_to_f32(load_u16(blk));
            const uint8_t* q = blk + 2;
            // code[e]: e<16 -> q[e]&0xF else q[e-16]>>4; unit 32 half-split:
            // packed[r] = code[r] | code[r+16]<<4 = (q[r]&0xF) | (q[r]>>4<<4) = q[r]
            for (int r = 0; r < 16; ++r) {
                qs_out[(b * 16 + r) * n_out + n] = q[r];
            }
        }
    }
}

} // namespace

extern "C" {

// planes written into caller-allocated buffers; unused outputs may be null
int tq_repack(int gtype, const uint8_t* data, int64_t n_out, int64_t n_in,
              uint8_t* qs, uint8_t* qh, float* scale, float* minus) {
    switch (gtype) {
        case 2: rp_q4_0(data, n_out, n_in, qs, scale); return 0;
        case 8: rp_q8_0(data, n_out, n_in, qs, scale); return 0;
        case 12: rp_q4_k(data, n_out, n_in, qs, scale, minus); return 0;
        case 13: rp_q5_k(data, n_out, n_in, qs, qh, scale, minus); return 0;
        case 14: rp_q6_k(data, n_out, n_in, qs, qh, scale); return 0;
        default: return -1;
    }
}

} // extern "C"
