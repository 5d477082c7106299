/* dump dsa_sorted-<il> (I32 full argsort) for a fixed token sequence */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "llama.h"
#include "ggml.h"
static FILE *out;
static int cb(struct ggml_tensor * t, bool ask, void * ud) {
    (void)ud;
    if (ask) return strncmp(t->name, "dsa_sorted-", 11) == 0;
    if (t->type != GGML_TYPE_I32 || strchr(t->name, '(')) return 1;
    int il = atoi(t->name + 11);
    int32_t hdr[3] = { il, (int32_t)t->ne[0], (int32_t)t->ne[1] };
    fwrite(hdr, 4, 3, out);
    fwrite(t->data, 4, (size_t)t->ne[0]*t->ne[1], out);
    return 1;
}
int main(int argc, char **argv) {
    struct llama_model_params mp = llama_model_default_params();
    struct llama_model *model = llama_model_load_from_file(argv[1], mp);
    if (!model) return 1;
    struct llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 64; cp.n_batch = 64; cp.logits_all = 1;
    cp.flash_attn = 0; cp.mla_attn = 1; cp.dsa = 1;
    cp.cb_eval = cb;
    out = fopen(argv[2], "wb");
    struct llama_context *ctx = llama_init_from_model(model, cp);
    int n = argc > 3 ? atoi(argv[3]) : 24;
    llama_token toks[64];
    for (int i = 0; i < n; i++) toks[i] = 5 + i*3;
    struct llama_batch b = llama_batch_get_one(toks, n, 0, 0);
    llama_decode(ctx, b);
    fclose(out);
    printf("ok\n");
    return 0;
}
