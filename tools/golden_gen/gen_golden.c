/* Golden-file generator: runs the REFERENCE implementation's quantize +
 * dequantize (via ggml_internal_get_type_traits) on synthetic data and dumps
 * the raw quantized bytes and the reference float32 dequantization.
 *
 * Build (out of tree, against the read-only reference checkout):
 *   gcc -O2 -I$REF/ggml/include tools/golden_gen/gen_golden.c \
 *       -L$BUILD/ggml/src -lggml -o /tmp/gen_golden
 * Run:
 *   LD_LIBRARY_PATH=$BUILD/ggml/src /tmp/gen_golden tests/golden
 *
 * Output per type: <outdir>/<type_name>.bin =
 *   u32 n_rows, u32 n_per_row, u64 row_bytes,
 *   quant bytes [n_rows * row_bytes],
 *   f32 dequant [n_rows * n_per_row]
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ggml.h"

#define N_ROWS 4
#define N_PER_ROW 512

static void gen_data(float offset, size_t n, float *dst) {
    for (size_t i = 0; i < n; i++) dst[i] = 0.1f + 2.0f * cosf(i + offset);
}

int main(int argc, char **argv) {
    const char *outdir = argc > 1 ? argv[1] : "golden";
    /* initialize ggml's fp16<->fp32 conversion tables */
    struct ggml_init_params ip = { 1024 * 1024, NULL, false };
    struct ggml_context *ctx = ggml_init(ip);
    (void)ctx;
    /* the full set of types our TPU framework decodes */
    int types[] = {
        GGML_TYPE_Q4_0, GGML_TYPE_Q4_1, GGML_TYPE_Q5_0, GGML_TYPE_Q5_1,
        GGML_TYPE_Q6_0, GGML_TYPE_Q8_0, GGML_TYPE_MXFP4,
        GGML_TYPE_Q2_K, GGML_TYPE_Q3_K, GGML_TYPE_Q4_K, GGML_TYPE_Q5_K,
        GGML_TYPE_Q6_K, GGML_TYPE_IQ4_NL, GGML_TYPE_IQ4_XS,
        GGML_TYPE_IQ2_K, GGML_TYPE_IQ2_KS, GGML_TYPE_IQ2_KL,
        GGML_TYPE_IQ3_K, GGML_TYPE_IQ3_KS,
        GGML_TYPE_IQ4_K, GGML_TYPE_IQ4_KS, GGML_TYPE_IQ4_KSS,
        GGML_TYPE_IQ5_K, GGML_TYPE_IQ5_KS, GGML_TYPE_IQ6_K,
        GGML_TYPE_IQ1_KT, GGML_TYPE_IQ2_KT, GGML_TYPE_IQ3_KT, GGML_TYPE_IQ4_KT,
        GGML_TYPE_Q8_KV,
    };
    /* decode-only types: encoders need an imatrix (iq1_*) or are exotic;
     * feed RANDOM bytes (any bit pattern is a valid encoding) through the
     * reference to_float and dump that as the golden */
    int decode_only[] = {
        GGML_TYPE_IQ2_XXS, GGML_TYPE_IQ2_XS, GGML_TYPE_IQ2_S,
        GGML_TYPE_IQ3_XXS, GGML_TYPE_IQ3_S, GGML_TYPE_IQ1_S, GGML_TYPE_IQ1_M,
    };
    float *src = malloc(sizeof(float) * N_PER_ROW);
    float *out = malloc(sizeof(float) * N_PER_ROW);

    for (size_t t = 0; t < sizeof(decode_only) / sizeof(decode_only[0]); t++) {
        enum ggml_type type = (enum ggml_type)decode_only[t];
        ggml_type_traits_t traits = ggml_internal_get_type_traits(type);
        if (!traits.to_float) continue;
        size_t rb = ggml_row_size(type, N_PER_ROW);
        uint8_t *qbuf = malloc(N_ROWS * rb);
        /* deterministic pseudo-random bytes */
        uint32_t st = 0x12345678u + (uint32_t)type;
        for (size_t j = 0; j < N_ROWS * rb; j++) {
            st = st * 1664525u + 1013904223u;
            qbuf[j] = (uint8_t)(st >> 24);
        }
        float *deq = malloc(sizeof(float) * N_ROWS * N_PER_ROW);
        for (int r = 0; r < N_ROWS; r++) {
            traits.to_float(qbuf + r * rb, deq + (size_t)r * N_PER_ROW, N_PER_ROW);
        }
        char path[1024];
        snprintf(path, sizeof(path), "%s/decode_%s.bin", outdir, ggml_type_name(type));
        FILE *f = fopen(path, "wb");
        if (!f) { perror(path); return 1; }
        uint32_t nr = N_ROWS, npr = N_PER_ROW;
        uint64_t rb64 = rb;
        fwrite(&nr, 4, 1, f);
        fwrite(&npr, 4, 1, f);
        fwrite(&rb64, 8, 1, f);
        fwrite(qbuf, 1, N_ROWS * rb, f);
        fwrite(deq, sizeof(float), (size_t)N_ROWS * N_PER_ROW, f);
        fclose(f);
        printf("wrote %s (decode-only, row_bytes=%zu)\n", path, rb);
        free(qbuf); free(deq);
    }

    for (size_t t = 0; t < sizeof(types) / sizeof(types[0]); t++) {
        enum ggml_type type = types[t];
        ggml_type_traits_t traits = ggml_internal_get_type_traits(type);
        if (!traits.from_float || !traits.to_float) {
            fprintf(stderr, "skip %s: no from_float/to_float\n", ggml_type_name(type));
            continue;
        }
        size_t rb = ggml_row_size(type, N_PER_ROW);
        uint8_t *qbuf = calloc(N_ROWS, rb);
        float *deq = malloc(sizeof(float) * N_ROWS * N_PER_ROW);
        for (int r = 0; r < N_ROWS; r++) {
            gen_data(0.3f * r, N_PER_ROW, src);
            traits.from_float(src, qbuf + r * rb, N_PER_ROW);
            traits.to_float(qbuf + r * rb, out, N_PER_ROW);
            memcpy(deq + r * N_PER_ROW, out, sizeof(float) * N_PER_ROW);
        }
        char path[1024];
        snprintf(path, sizeof(path), "%s/%s.bin", outdir, ggml_type_name(type));
        FILE *f = fopen(path, "wb");
        if (!f) { perror(path); return 1; }
        uint32_t nr = N_ROWS, npr = N_PER_ROW;
        uint64_t rb64 = rb;
        fwrite(&nr, 4, 1, f);
        fwrite(&npr, 4, 1, f);
        fwrite(&rb64, 8, 1, f);
        fwrite(qbuf, 1, N_ROWS * rb, f);
        fwrite(deq, sizeof(float), N_ROWS * N_PER_ROW, f);
        fclose(f);
        printf("wrote %s (row_bytes=%zu)\n", path, rb);
        free(qbuf);
        free(deq);
    }
    return 0;
}
