// Native planar decoder: GGUF quant bytes -> (int8 codes, f32 group scales).
//
// The C++ counterpart of quant/planar.py for the load-time repack hot path
// (a 671B model has ~700GB of blocks to decode once at startup; Python is
// ~50x too slow). Bit-identical to the Python implementation, which is the
// tested oracle; OpenMP-parallel over rows.
//
// C ABI: one entry point per type,
//   int planar_<type>(const uint8_t* src, int64_t nrows, int64_t n_per_row,
//                     int8_t* codes, float* scale, float* bias);
// returns 0 on success. codes: nrows*n; scale/bias: nrows*(n/group).
//
// Build: make -C ik_llama_cpp_tpu/native   (produces libplanar.so)

#include <cstdint>
#include <cstring>
#include <cmath>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int QK_K = 256;

inline float fp16_to_f32(uint16_t h) {
    // scalar IEEE half -> float (round-trip exact)
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; --exp; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

inline uint16_t rd16(const uint8_t* p) { uint16_t v; std::memcpy(&v, p, 2); return v; }
inline uint32_t rd32(const uint8_t* p) { uint32_t v; std::memcpy(&v, p, 4); return v; }
inline float rdf32(const uint8_t* p) { float v; std::memcpy(&v, p, 4); return v; }

// non-linear codebooks (data contracts of the formats; ggml-common.h:2212+)
const int8_t IQ4K_VALUES[32] = {
    -127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113,
    -123, -100, -79, -61, -45, -31, -18, -6, 5, 17, 29, 42, 57, 73, 93, 117};
const int8_t IQ5NL_VALUES[64] = {
    -126, -114, -103, -92, -83, -74, -65, -57, -50, -43, -36, -30, -24, -18,
    -12, -6, -1, 5, 11, 17, 23, 29, 36, 43, 51, 59, 68, 77, 87, 97, 109, 121,
    -124, -112, -101, -90, -81, -72, -63, -55, -48, -41, -34, -28, -22, -16,
    -10, -4, 1, 7, 13, 19, 25, 31, 38, 45, 53, 61, 70, 79, 89, 99, 111, 123};
const int8_t IQ2NL_VALUES[8] = {-31, -13, 1, 17, -26, -8, 6, 22};
const int8_t IQ3NL_VALUES[16] = {-63, -40, -23, -10, 1, 13, 28, 47,
                                 -59, -36, -19, -6, 5, 17, 32, 51};

inline void kscale_min(const uint8_t* q, int j, uint8_t* d, uint8_t* m) {
    if (j < 4) { *d = q[j] & 63; *m = q[j + 4] & 63; }
    else {
        *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- Q8_0
int planar_q8_0(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                float* scale, float*) {
    const int64_t nb = n / 32;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nb * 34;
        int8_t* c = codes + r * n;
        float* s = scale + r * nb;
        for (int64_t b = 0; b < nb; ++b) {
            s[b] = fp16_to_f32(rd16(p));
            std::memcpy(c, p + 2, 32);
            p += 34; c += 32;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- Q4_0
int planar_q4_0(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                float* scale, float*) {
    const int64_t nb = n / 32;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nb * 18;
        int8_t* c = codes + r * n;
        float* s = scale + r * nb;
        for (int64_t b = 0; b < nb; ++b) {
            s[b] = fp16_to_f32(rd16(p));
            const uint8_t* qs = p + 2;
            for (int j = 0; j < 16; ++j) {
                c[j] = (int8_t)(qs[j] & 0xF) - 8;
                c[j + 16] = (int8_t)(qs[j] >> 4) - 8;
            }
            p += 18; c += 32;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- IQ4_NL
int planar_iq4_nl(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                  float* scale, float*) {
    const int64_t nb = n / 32;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nb * 18;
        int8_t* c = codes + r * n;
        float* s = scale + r * nb;
        for (int64_t b = 0; b < nb; ++b) {
            s[b] = fp16_to_f32(rd16(p));
            const uint8_t* qs = p + 2;
            for (int j = 0; j < 16; ++j) {
                c[j] = IQ4K_VALUES[qs[j] & 0xF];
                c[j + 16] = IQ4K_VALUES[qs[j] >> 4];
            }
            p += 18; c += 32;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- Q4_K
int planar_q4_K(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                float* scale, float* bias) {
    const int64_t nsb = n / QK_K;  // superblocks per row
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nsb * 144;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 32);
        float* bb = bias + r * (n / 32);
        for (int64_t b = 0; b < nsb; ++b) {
            const float d = fp16_to_f32(rd16(p));
            const float dmin = fp16_to_f32(rd16(p + 2));
            const uint8_t* sc = p + 4;
            const uint8_t* qs = p + 16;
            for (int jb = 0; jb < 8; ++jb) {
                uint8_t sd, sm;
                kscale_min(sc, jb, &sd, &sm);
                s[jb] = d * (float)sd;
                bb[jb] = -(dmin * (float)sm);
            }
            for (int ch = 0; ch < 4; ++ch) {
                for (int j = 0; j < 32; ++j) {
                    uint8_t byte = qs[ch * 32 + j];
                    c[ch * 64 + j] = (int8_t)(byte & 0xF);
                    c[ch * 64 + 32 + j] = (int8_t)(byte >> 4);
                }
            }
            p += 144; c += QK_K; s += 8; bb += 8;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- Q5_K
int planar_q5_K(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                float* scale, float* bias) {
    const int64_t nsb = n / QK_K;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nsb * 176;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 32);
        float* bb = bias + r * (n / 32);
        for (int64_t b = 0; b < nsb; ++b) {
            const float d = fp16_to_f32(rd16(p));
            const float dmin = fp16_to_f32(rd16(p + 2));
            const uint8_t* sc = p + 4;
            const uint8_t* qh = p + 16;
            const uint8_t* qs = p + 48;
            for (int jb = 0; jb < 8; ++jb) {
                uint8_t sd, sm;
                kscale_min(sc, jb, &sd, &sm);
                s[jb] = d * (float)sd;
                bb[jb] = -(dmin * (float)sm);
            }
            for (int ch = 0; ch < 4; ++ch) {
                uint8_t u1 = 1 << (2 * ch), u2 = 2 << (2 * ch);
                for (int j = 0; j < 32; ++j) {
                    uint8_t byte = qs[ch * 32 + j];
                    c[ch * 64 + j] = (int8_t)((byte & 0xF) + ((qh[j] & u1) ? 16 : 0));
                    c[ch * 64 + 32 + j] = (int8_t)((byte >> 4) + ((qh[j] & u2) ? 16 : 0));
                }
            }
            p += 176; c += QK_K; s += 8; bb += 8;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- Q6_K
int planar_q6_K(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                float* scale, float*) {
    const int64_t nsb = n / QK_K;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nsb * 210;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 16);
        for (int64_t b = 0; b < nsb; ++b) {
            const uint8_t* ql = p;
            const uint8_t* qh = p + 128;
            const int8_t* sc = (const int8_t*)(p + 192);
            const float d = fp16_to_f32(rd16(p + 208));
            for (int i128 = 0; i128 < 2; ++i128) {
                const uint8_t* qlb = ql + i128 * 64;
                const uint8_t* qhb = qh + i128 * 32;
                for (int j = 0; j < 32; ++j) {
                    int8_t q1 = (int8_t)((qlb[j] & 0xF) | ((qhb[j] & 3) << 4)) - 32;
                    int8_t q2 = (int8_t)((qlb[32 + j] & 0xF) | (((qhb[j] >> 2) & 3) << 4)) - 32;
                    int8_t q3 = (int8_t)((qlb[j] >> 4) | (((qhb[j] >> 4) & 3) << 4)) - 32;
                    int8_t q4 = (int8_t)((qlb[32 + j] >> 4) | (((qhb[j] >> 6) & 3) << 4)) - 32;
                    c[i128 * 128 + j] = q1;
                    c[i128 * 128 + 32 + j] = q2;
                    c[i128 * 128 + 64 + j] = q3;
                    c[i128 * 128 + 96 + j] = q4;
                }
                for (int k = 0; k < 4; ++k) {
                    s[i128 * 8 + 2 * k] = d * (float)sc[i128 * 8 + 2 * k];
                    s[i128 * 8 + 2 * k + 1] = d * (float)sc[i128 * 8 + 2 * k + 1];
                }
            }
            p += 210; c += QK_K; s += 16;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- IQ4_XS
int planar_iq4_xs(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                  float* scale, float*) {
    const int64_t nsb = n / QK_K;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nsb * 136;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 32);
        for (int64_t b = 0; b < nsb; ++b) {
            const float d = fp16_to_f32(rd16(p));
            const uint16_t sh = rd16(p + 2);
            const uint8_t* sl = p + 4;
            const uint8_t* qs = p + 8;
            for (int ib = 0; ib < 8; ++ib) {
                int ls = ((sl[ib / 2] >> (4 * (ib % 2))) & 0xF) |
                         (((sh >> (2 * ib)) & 3) << 4);
                s[ib] = d * (float)(ls - 32);
                const uint8_t* blk = qs + 16 * ib;
                for (int j = 0; j < 16; ++j) {
                    c[32 * ib + j] = IQ4K_VALUES[blk[j] & 0xF];
                    c[32 * ib + 16 + j] = IQ4K_VALUES[blk[j] >> 4];
                }
            }
            p += 136; c += QK_K; s += 8;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- IQ4_K
int planar_iq4_k(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                 float* scale, float*) {
    const int64_t nsb = n / QK_K;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * nsb * 144;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 16);
        for (int64_t b = 0; b < nsb; ++b) {
            const float d = fp16_to_f32(rd16(p));
            uint16_t extra = rd16(p + 2);
            const uint8_t* sh = p + 4;
            const uint8_t* sl = p + 8;
            const uint8_t* qs = p + 16;
            for (int ib = 0; ib < 8; ++ib) {
                int shh = sh[ib / 2] >> (4 * (ib % 2));
                s[2 * ib] = d * (float)(((sl[ib] & 0xF) | ((shh << 4) & 0x30)) - 32);
                s[2 * ib + 1] = d * (float)(((sl[ib] >> 4) | ((shh << 2) & 0x30)) - 32);
                int off1 = ((extra >> (2 * ib)) & 1) * 16;
                int off2 = ((extra >> (2 * ib + 1)) & 1) * 16;
                const uint8_t* blk = qs + 16 * ib;
                for (int j = 0; j < 16; ++j) {
                    c[32 * ib + j] = IQ4K_VALUES[(blk[j] & 0xF) + off1];
                    c[32 * ib + 16 + j] = IQ4K_VALUES[(blk[j] >> 4) + off2];
                }
            }
            p += 144; c += QK_K; s += 16;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- IQ4_KS (row header f32)
int planar_iq4_ks(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                  float* scale, float*) {
    const int64_t nsb = n / QK_K;
    const int64_t row_bytes = 4 + nsb * 136;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * row_bytes;
        const float d = rdf32(p);
        p += 4;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 32);
        for (int64_t b = 0; b < nsb; ++b) {
            const uint8_t* sc = p;
            const uint8_t* qs = p + 8;
            for (int ib = 0; ib < 8; ++ib) {
                s[ib] = d * (float)((int)(sc[ib] & 254) - 127);
                int off = (sc[ib] & 1) * 16;
                const uint8_t* blk = qs + 16 * ib;
                for (int j = 0; j < 16; ++j) {
                    c[32 * ib + j] = IQ4K_VALUES[(blk[j] & 0xF) + off];
                    c[32 * ib + 16 + j] = IQ4K_VALUES[(blk[j] >> 4) + off];
                }
            }
            p += 136; c += QK_K; s += 8;
        }
    }
    return 0;
}

// ---------------------------------------------------------------- KT trellis (iq2_kt)
static inline void kt_values(uint32_t idx, int8_t* out, int group) {
    uint32_t x = idx;
    for (int k = 0; k < group; ++k) {
        x *= 0xCBAC1FEDu;
        uint32_t sbits = x & 0x3F3F3F3Fu;
        int tot = (int)(sbits & 0xFF) + (int)((sbits >> 8) & 0xFF) +
                  (int)((sbits >> 16) & 0xFF) + (int)((sbits >> 24) & 0xFF);
        out[k] = (int8_t)(tot - 126);
    }
}

int planar_iq2_kt(const uint8_t* src, int64_t nrows, int64_t n, int8_t* codes,
                  float* scale, float*) {
    const int64_t nsb = n / QK_K;
    const int64_t row_bytes = 4 + nsb * 68;
#pragma omp parallel for
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* p = src + r * row_bytes;
        const float d = rdf32(p);
        p += 4;
        int8_t* c = codes + r * n;
        float* s = scale + r * (n / 32);
        for (int64_t b = 0; b < nsb; ++b) {
            const uint8_t* scb = p;
            const uint8_t* ql = p + 4;
            for (int ib = 0; ib < 4; ++ib) {
                s[ib] = d * (float)IQ4K_VALUES[scb[ib] & 0xF];
                s[4 + ib] = d * (float)IQ4K_VALUES[scb[ib] >> 4];
                for (int ig = 0; ig < 4; ++ig) {
                    uint16_t il = rd16(ql + 2 * (ib * 4 + ig));
                    uint16_t ih = rd16(ql + 2 * (16 + ib * 4 + ig));
                    kt_values((uint32_t)il + 4096, c + ib * 32 + ig * 8, 8);
                    kt_values((uint32_t)ih + 4096, c + 128 + ib * 32 + ig * 8, 8);
                }
            }
            p += 68; c += QK_K; s += 8;
        }
    }
    return 0;
}

}  // extern "C"
