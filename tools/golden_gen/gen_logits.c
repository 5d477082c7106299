/* Cross-engine parity harness: loads a GGUF with the REFERENCE engine
 * (libllama), evaluates a fixed token sequence, and dumps all-position
 * logits + greedy continuation to a binary file.
 *
 * Build:
 *   g++ -O2 -I$REF/include -I$REF/ggml/include tools/golden_gen/gen_logits.c \
 *       -L$BUILD/src -L$BUILD/ggml/src -lllama -lggml -lm -o /tmp/gen_logits
 * Run:
 *   LD_LIBRARY_PATH=$BUILD/src:$BUILD/ggml/src /tmp/gen_logits model.gguf out.bin "prompt" [n_gen]
 *
 * Output: u32 n_prompt, u32 n_gen, u32 n_vocab,
 *         i32 prompt_ids[n_prompt], i32 gen_ids[n_gen],
 *         f32 logits[(n_prompt+n_gen) * n_vocab]   (all positions)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "llama.h"

int main(int argc, char **argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s model out prompt [n_gen]\n", argv[0]); return 1; }
    const char *model_path = argv[1];
    const char *out_path = argv[2];
    const char *prompt = argv[3];
    int n_gen = argc > 4 ? atoi(argv[4]) : 8;
    /* optional argv[5] = comma-separated token ids appended to the prompt and
     * evaluated TEACHER-FORCED in the same single batch (n_gen ignored then) */
    const char *forced = argc > 5 ? argv[5] : NULL;

    llama_backend_init();
    struct llama_model_params mp = llama_model_default_params();
    struct llama_model *model = llama_model_load_from_file(model_path, mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    struct llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 512;
    cp.n_batch = 512;
    cp.logits_all = 1;
    /* MLA models: latent-cache modes >=2 need flash attention, and the
     * reference's MLA flash kernels only support the production head sizes
     * (Dk=576/Dv=512); run mla=1 without FA = standard matmul attention,
     * which supports any dims */
    cp.mla_attn = 0;
    /* the fused up/gate op only supports GELU/RELU/SILU (ggml.c:6596);
     * SWIGLU_OAI dense FFNs (minimax-m3, step35) need it off */
    if (getenv("GEN_LOGITS_NO_FUG")) cp.fused_up_gate = 0;
    cp.flash_attn = getenv("GEN_LOGITS_FA") ? 1 : 0;
    /* GLM-DSA sparse attention opt-in (cparams.dsa, llama.h:496). The
     * indexer key cache kr_l only allocates under an MLA latent cache
     * (llama.cpp:1380-1396), so force mla_attn=1 (works without FA). */
    if (getenv("GEN_LOGITS_DSA")) { cp.dsa = 1; cp.mla_attn = 1; }
    /* openpangu et al: MLA latent cache requires mla_attn != 0 */
    if (getenv("GEN_LOGITS_MLA")) cp.mla_attn = 1;
    struct llama_context *ctx = llama_init_from_model(model, cp);

    llama_token toks[512];
    int n_prompt = llama_tokenize(model, prompt, (int)strlen(prompt), toks, 512, true, false);
    if (n_prompt < 0) { fprintf(stderr, "tokenize failed\n"); return 1; }
    if (forced) {
        char *tmp = strdup(forced);
        for (char *tk = strtok(tmp, ","); tk; tk = strtok(NULL, ","))
            toks[n_prompt++] = atoi(tk);
        n_gen = 0;
    }
    int n_vocab = llama_n_vocab(model);

    float *all_logits = (float*)malloc(sizeof(float) * (size_t)(n_prompt + n_gen) * n_vocab);
    llama_token gen[512];

    struct llama_batch batch = llama_batch_init(512, 0, 1);
    for (int i = 0; i < n_prompt; i++) {
        batch.token[i] = toks[i];
        batch.pos[i] = i;
        batch.n_seq_id[i] = 1;
        batch.seq_id[i][0] = 0;
        batch.logits[i] = 1;
    }
    batch.n_tokens = n_prompt;
    if (llama_decode(ctx, batch)) { fprintf(stderr, "decode failed\n"); return 1; }
    for (int i = 0; i < n_prompt; i++) {
        memcpy(all_logits + (size_t)i * n_vocab, llama_get_logits_ith(ctx, i),
               sizeof(float) * n_vocab);
    }
    /* greedy generation */
    int pos = n_prompt;
    for (int g = 0; g < n_gen; g++) {
        const float *lg = all_logits + (size_t)(pos - 1) * n_vocab;
        int best = 0;
        for (int v = 1; v < n_vocab; v++) if (lg[v] > lg[best]) best = v;
        gen[g] = best;
        batch.n_tokens = 1;
        batch.token[0] = best;
        batch.pos[0] = pos;
        batch.n_seq_id[0] = 1;
        batch.seq_id[0][0] = 0;
        batch.logits[0] = 1;
        if (llama_decode(ctx, batch)) { fprintf(stderr, "decode failed @%d\n", pos); return 1; }
        memcpy(all_logits + (size_t)pos * n_vocab, llama_get_logits_ith(ctx, 0),
               sizeof(float) * n_vocab);
        pos++;
    }

    FILE *f = fopen(out_path, "wb");
    unsigned np = n_prompt, ng = n_gen, nv = n_vocab;
    fwrite(&np, 4, 1, f);
    fwrite(&ng, 4, 1, f);
    fwrite(&nv, 4, 1, f);
    fwrite(toks, 4, n_prompt, f);
    fwrite(gen, 4, n_gen, f);
    fwrite(all_logits, 4, (size_t)(n_prompt + n_gen) * n_vocab, f);
    fclose(f);
    printf("wrote %s: n_prompt=%d n_gen=%d n_vocab=%d\n", out_path, n_prompt, n_gen, n_vocab);
    printf("prompt ids:");
    for (int i = 0; i < n_prompt; i++) printf(" %d", toks[i]);
    printf("\ngen ids:");
    for (int g = 0; g < n_gen; g++) printf(" %d", gen[g]);
    printf("\n");
    return 0;
}
