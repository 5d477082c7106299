/* Cross-engine EMBEDDING parity harness: loads a GGUF with the REFERENCE
 * engine (libllama), evaluates explicit token ids, and dumps the per-token
 * (unpooled) embeddings.
 *
 * Build:
 *   g++ -O2 -I$REF/include -I$REF/ggml/include tools/golden_gen/gen_embd.c \
 *       -L$BUILD/src -L$BUILD/ggml/src -lllama -lggml -lm -o /tmp/gen_embd
 * Run:
 *   LD_LIBRARY_PATH=$BUILD/src:$BUILD/ggml/src \
 *     /tmp/gen_embd model.gguf out.bin 2,7,9,12
 *
 * Output: u32 n_tok, u32 n_embd, f32 embd[n_tok * n_embd]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "llama.h"

int main(int argc, char **argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s model out ids\n", argv[0]); return 1; }
    llama_backend_init();
    struct llama_model_params mp = llama_model_default_params();
    struct llama_model *model = llama_model_load_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    struct llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 512;
    cp.n_batch = 512;
    cp.embeddings = 1;
    cp.pooling_type = LLAMA_POOLING_TYPE_NONE;
    cp.flash_attn = 0;
    struct llama_context *ctx = llama_init_from_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    llama_token toks[512];
    int n_tok = 0;
    char *tmp = strdup(argv[3]);
    for (char *tk = strtok(tmp, ","); tk; tk = strtok(NULL, ","))
        toks[n_tok++] = atoi(tk);

    struct llama_batch batch = llama_batch_init(512, 0, 1);
    for (int i = 0; i < n_tok; i++) {
        batch.token[i] = toks[i];
        batch.pos[i] = i;
        batch.n_seq_id[i] = 1;
        batch.seq_id[i][0] = 0;
        batch.logits[i] = 1;
    }
    batch.n_tokens = n_tok;
    if (llama_decode(ctx, batch)) { fprintf(stderr, "decode failed\n"); return 1; }

    int n_embd = llama_model_n_embd(model);
    FILE *f = fopen(argv[2], "wb");
    unsigned nt = n_tok, ne = n_embd;
    fwrite(&nt, 4, 1, f);
    fwrite(&ne, 4, 1, f);
    for (int i = 0; i < n_tok; i++) {
        const float *e = llama_get_embeddings_ith(ctx, i);
        if (!e) { fprintf(stderr, "no embd at %d\n", i); return 1; }
        fwrite(e, sizeof(float), n_embd, f);
    }
    fclose(f);
    printf("ok %d x %d\n", n_tok, n_embd);
    return 0;
}
