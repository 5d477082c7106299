// DFlash draft parity harness: loads a dflash-draft GGUF with the REFERENCE
// engine, installs synthetic target features, runs one draft block and dumps
// the greedy draft tokens.
//
// Build:
//   g++ -O2 -I$REF/include -I$REF/ggml/include tools/golden_gen/gen_dflash.cpp \
//       -L$BUILD/src -L$BUILD/ggml/src -lllama -lggml -lm -o /tmp/gen_dflash
// Run:
//   /tmp/gen_dflash model.gguf out.bin <n_ctx_rows> <seed_token> <n_draft>
//
// Features row r, float j = sin(0.01*r*131 + 0.1*j)  (deterministic).
// Output: u32 n_draft, i32 ids[n_draft]
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <vector>
#include "llama.h"

struct llama_dflash_window_update;
// internal (non-LLAMA_API) C++ exports from libllama
bool llama_set_dflash_target_features_copy(
        struct llama_context * ctx, const float * target_features,
        size_t n_floats, int32_t n_rows, const llama_pos * target_positions,
        const llama_dflash_window_update * window_update);
int32_t llama_model_dflash_block_size(const struct llama_model * model);
int32_t llama_model_dflash_mask_token_id(const struct llama_model * model);
int32_t llama_model_dflash_n_target_features(const struct llama_model * model);

int main(int argc, char **argv) {
    if (argc < 6) { fprintf(stderr, "usage: %s model out rows seed_tok n_draft\n", argv[0]); return 1; }
    const int rows = atoi(argv[3]);
    const llama_token seed_tok = atoi(argv[4]);
    const int n_draft = atoi(argv[5]);

    llama_backend_init();
    struct llama_model_params mp = llama_model_default_params();
    struct llama_model *model = llama_model_load_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    struct llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 128;
    cp.n_batch = 128;
    struct llama_context *ctx = llama_init_from_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    const int n_feat = llama_model_dflash_n_target_features(model);
    const llama_token mask_id = llama_model_dflash_mask_token_id(model);
    fprintf(stderr, "n_feat=%d mask=%d block=%d\n", n_feat, mask_id,
            llama_model_dflash_block_size(model));

    std::vector<float> feats((size_t) rows * n_feat);
    std::vector<llama_pos> pos(rows);
    for (int r = 0; r < rows; ++r) {
        pos[r] = r;
        for (int j = 0; j < n_feat; ++j)
            feats[(size_t) r * n_feat + j] = sinf(0.01f * r * 131 + 0.1f * j);
    }
    if (!llama_set_dflash_target_features_copy(ctx, feats.data(), feats.size(),
                                               rows, pos.data(), nullptr)) {
        fprintf(stderr, "set features failed\n"); return 1;
    }

    struct llama_batch batch = llama_batch_init(1 + n_draft, 0, 1);
    batch.token[0] = seed_tok;
    batch.pos[0] = rows - 1;          // seed at last target position
    batch.n_seq_id[0] = 1; batch.seq_id[0][0] = 0; batch.logits[0] = 0;
    for (int i = 1; i <= n_draft; ++i) {
        batch.token[i] = mask_id;
        batch.pos[i] = rows - 1 + i;
        batch.n_seq_id[i] = 1; batch.seq_id[i][0] = 0; batch.logits[i] = 1;
    }
    batch.n_tokens = 1 + n_draft;
    if (llama_decode(ctx, batch)) { fprintf(stderr, "decode failed\n"); return 1; }

    FILE *f = fopen(argv[2], "wb");
    unsigned nd = n_draft;
    fwrite(&nd, 4, 1, f);
    for (int i = 0; i < n_draft; ++i) {
        int32_t id = llama_get_dflash_draft_token_ith(ctx, i);
        fwrite(&id, 4, 1, f);
        fprintf(stderr, "draft[%d] = %d\n", i, id);
    }
    fclose(f);
    printf("ok\n");
    return 0;
}
