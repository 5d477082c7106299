/* T5 encoder-decoder golden harness: tokenize+encode the prompt with the
 * reference build, then greedy-decode from decoder_start_token_id, dumping
 * all decoder-position logits.
 *
 * Output binary: [n_enc u32][n_dec u32][n_vocab u32][enc ids i32...]
 *                [dec ids i32...][logits f32 (n_dec, n_vocab)]
 *
 *   g++ -O2 -I$REF/include -I$REF/ggml/include tools/golden_gen/gen_logits_t5.c \
 *      -L$BUILD/src -L$BUILD/ggml/src -lllama -lggml -lm -o gen_logits_t5
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "llama.h"
#include "ggml.h"
#include "ggml-backend.h"

/* capture the encoder's final result_norm via the eval callback */
static float * g_enc_hidden = NULL;
static size_t g_enc_n = 0;
static int cb_eval(struct ggml_tensor * t, bool ask, void * user_data) {
    (void)user_data;
    if (ask) return true;
    if (g_enc_hidden == NULL && t->name[0] &&
        strcmp(t->name, "result_norm") == 0 && t->type == GGML_TYPE_F32) {
        g_enc_n = ggml_nelements(t);
        g_enc_hidden = (float *)malloc(g_enc_n * sizeof(float));
        ggml_backend_tensor_get(t, g_enc_hidden, 0, g_enc_n * sizeof(float));
    }
    return true;
}

int main(int argc, char ** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s model.gguf out.bin PROMPT [n_gen]\n", argv[0]);
        return 1;
    }
    const char * model_path = argv[1];
    const char * out_path = argv[2];
    const char * prompt = argv[3];
    int n_gen = argc > 4 ? atoi(argv[4]) : 6;

    struct llama_model_params mp = llama_model_default_params();
    struct llama_model * model = llama_model_load_from_file(model_path, mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    struct llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 256; cp.n_batch = 256; cp.logits_all = 1;
    cp.cb_eval = cb_eval;
    struct llama_context * ctx = llama_init_from_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    int n_vocab = llama_n_vocab(model);

    llama_token enc[512];
    int n_enc = llama_tokenize(model, prompt, (int)strlen(prompt), enc, 512,
                               /*add_special=*/true, /*parse_special=*/false);
    if (n_enc < 0) { fprintf(stderr, "tokenize failed\n"); return 1; }

    struct llama_batch eb = llama_batch_get_one(enc, n_enc, 0, 0);
    if (llama_encode(ctx, eb)) { fprintf(stderr, "encode failed\n"); return 1; }

    llama_token dec_start = llama_model_decoder_start_token(model);
    if (dec_start < 0) dec_start = llama_token_bos(model);
    if (dec_start < 0) dec_start = llama_token_pad(model);

    int max_dec = 1 + n_gen;
    llama_token * dec = (llama_token *)malloc(max_dec * sizeof(llama_token));
    float * all = (float *)malloc((size_t)max_dec * n_vocab * sizeof(float));
    dec[0] = dec_start;
    int n_dec = 1;
    for (int step = 0; step < n_gen; step++) {
        struct llama_batch db = llama_batch_get_one(dec + n_dec - 1, 1, n_dec - 1, 0);
        if (llama_decode(ctx, db)) { fprintf(stderr, "decode failed\n"); return 1; }
        const float * lg = llama_get_logits(ctx);
        memcpy(all + (size_t)(n_dec - 1) * n_vocab, lg, n_vocab * sizeof(float));
        llama_token best = 0;
        for (int i = 1; i < n_vocab; i++) if (lg[i] > lg[best]) best = i;
        dec[n_dec++] = best;
    }

    unsigned int n_embd = g_enc_hidden ? (unsigned)(g_enc_n / n_enc) : 0;
    FILE * f = fopen(out_path, "wb");
    unsigned int hdr[4] = { (unsigned)n_enc, (unsigned)(n_dec - 1),
                            (unsigned)n_vocab, n_embd };
    fwrite(hdr, 4, 4, f);
    fwrite(enc, 4, n_enc, f);
    fwrite(dec, 4, n_dec - 1, f);   /* dec ids excluding the final sampled */
    if (g_enc_hidden) fwrite(g_enc_hidden, 4, g_enc_n, f);
    fwrite(all, 4, (size_t)(n_dec - 1) * n_vocab, f);
    fclose(f);
    return 0;
}
