/* Audio-encoder parity harness: loads a text model + audio mmproj with the
 * REFERENCE mtmd library, feeds raw f32 16 kHz samples through its whisper
 * preprocessor + clip audio graph, and dumps the projected embeddings.
 *
 * Build:
 *   g++ -O2 -I$REF/include -I$REF/ggml/include -I$REF/examples/mtmd \
 *       tools/golden_gen/audio_embd.cpp -L$BUILD/src -L$BUILD/ggml/src \
 *       -L$BUILD/examples/mtmd -lmtmd -lllama -lggml -lm -o /tmp/audio_embd
 * Run:
 *   LD_LIBRARY_PATH=... /tmp/audio_embd text.gguf mmproj.gguf samples.f32 out.bin
 *
 * Output: u32 n_chunks, then per chunk: u32 n_tokens, u32 n_embd,
 *         f32 embd[n_tokens * n_embd]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <vector>
#include "llama.h"
#include "mtmd.h"

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s text.gguf mmproj.gguf samples.f32 out.bin\n", argv[0]);
        return 1;
    }
    llama_backend_init();
    struct llama_model_params mp = llama_model_default_params();
    struct llama_model *model = llama_model_load_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "text model load failed\n"); return 1; }

    struct mtmd_context_params mparams = mtmd_context_params_default();
    mparams.use_gpu = false;
    mparams.n_threads = 4;
    /* exact softmax attention: the reference's FA kernels misbehave below
     * head size 64 (tiny fixtures use d_head 8) */
    mparams.flash_attn_type = LLAMA_FLASH_ATTN_TYPE_DISABLED;
    mtmd_context *mctx = mtmd_init_from_file(argv[2], model, mparams);
    if (!mctx) { fprintf(stderr, "mmproj load failed\n"); return 1; }
    if (!mtmd_support_audio(mctx)) { fprintf(stderr, "no audio support\n"); return 1; }

    FILE *f = fopen(argv[3], "rb");
    if (!f) { fprintf(stderr, "samples open failed\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long nbytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<float> samples(nbytes / sizeof(float));
    if (fread(samples.data(), 1, nbytes, f) != (size_t)nbytes) return 1;
    fclose(f);

    mtmd_bitmap *bmp = mtmd_bitmap_init_from_audio(samples.size(), samples.data());
    if (!bmp) { fprintf(stderr, "bitmap init failed\n"); return 1; }

    mtmd_input_chunks *chunks = mtmd_input_chunks_init();
    mtmd_input_text text;
    text.text = mtmd_default_marker();
    text.add_special = false;
    text.parse_special = true;
    const mtmd_bitmap *bmps[1] = { bmp };
    int32_t rc = mtmd_tokenize(mctx, chunks, &text, bmps, 1);
    if (rc != 0) { fprintf(stderr, "tokenize failed rc=%d\n", rc); return 1; }

    FILE *out = fopen(argv[4], "wb");
    unsigned n_audio = 0;
    long hdr_pos = ftell(out);
    fwrite(&n_audio, 4, 1, out);  /* patched at the end */
    unsigned n_embd = (unsigned)llama_model_n_embd(model);
    for (size_t i = 0; i < mtmd_input_chunks_size(chunks); ++i) {
        const mtmd_input_chunk *chunk = mtmd_input_chunks_get(chunks, i);
        if (mtmd_input_chunk_get_type(chunk) != MTMD_INPUT_CHUNK_TYPE_AUDIO) continue;
        if (mtmd_encode_chunk(mctx, chunk) != 0) {
            fprintf(stderr, "encode failed on chunk %zu\n", i);
            return 1;
        }
        unsigned n_tok = (unsigned)mtmd_input_chunk_get_n_tokens(chunk);
        const float *embd = mtmd_get_output_embd(mctx);
        fwrite(&n_tok, 4, 1, out);
        fwrite(&n_embd, 4, 1, out);
        fwrite(embd, sizeof(float), (size_t)n_tok * n_embd, out);
        n_audio++;
    }
    fseek(out, hdr_pos, SEEK_SET);
    fwrite(&n_audio, 4, 1, out);
    fclose(out);
    fprintf(stderr, "wrote %u audio chunks\n", n_audio);
    return 0;
}
