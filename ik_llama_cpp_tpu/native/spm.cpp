// Native SPM (sentencepiece-style) tokenizer hot loop.
//
// The greedy best-score bigram merge (llama.cpp llm_tokenizer_spm:
// llama-vocab.cpp) is host-bound: the Python implementation costs ~16 us
// per character, which puts seconds of TTFT in front of a long-prompt
// prefill. This reimplements exactly the same algorithm — utf-8 symbol
// split, lazy max-heap of candidate bigrams scored by the vocab, linked
// -list merge, byte fallback for leftover pieces — at C++ speed.
// The Python tokenizer (runtime/tokenizer.py _spm_encode_piece) remains
// the tested oracle; tests/test_native_planar.py asserts identical ids.
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct SpmVocab {
    std::unordered_map<std::string, int32_t> piece_to_id;
    std::vector<float> scores;
    int32_t byte_tokens[256];
    int32_t unk_id;
};

struct Symbol {
    int prev, next;     // linked list
    const char* text;   // into the input buffer
    int n;              // byte length (0 = dead)
};

struct Bigram {
    float score;
    int left, right;
    int size;           // combined byte length at push time (staleness check)
    bool operator<(const Bigram& o) const {
        // max-heap by score; ties broken by LEFTMOST position (heapq in the
        // Python oracle orders by (-score, i))
        if (score != o.score) return score < o.score;
        return left > o.left;
    }
};

int utf8_len(unsigned char c) {
    if (c < 0x80) return 1;
    if ((c & 0xE0) == 0xC0) return 2;
    if ((c & 0xF0) == 0xE0) return 3;
    if ((c & 0xF8) == 0xF0) return 4;
    return 1;
}

}  // namespace

extern "C" {

void* spm_build(const char* blob, const int64_t* offs, const float* scores,
                int64_t n_vocab, const int32_t* byte_tokens, int32_t unk_id) {
    auto* v = new SpmVocab();
    v->piece_to_id.reserve((size_t)n_vocab * 2);
    v->scores.assign(scores, scores + n_vocab);
    for (int64_t i = 0; i < n_vocab; ++i) {
        std::string piece(blob + offs[i], (size_t)(offs[i + 1] - offs[i]));
        // LAST id wins on duplicates ({t: i for i, t in enumerate(...)})
        v->piece_to_id[std::move(piece)] = (int32_t)i;
    }
    std::memcpy(v->byte_tokens, byte_tokens, 256 * sizeof(int32_t));
    v->unk_id = unk_id;
    return v;
}

void spm_free(void* handle) { delete (SpmVocab*)handle; }

// Returns the number of ids written (<= out_cap), or -1 if out_cap is too
// small. out must hold at least text_len ids (worst case: byte fallback).
int64_t spm_encode(void* handle, const char* text, int64_t text_len,
                   int32_t* out, int64_t out_cap) {
    const SpmVocab& v = *(const SpmVocab*)handle;
    if (text_len <= 0) return 0;

    std::vector<Symbol> syms;
    syms.reserve((size_t)text_len);
    for (int64_t i = 0; i < text_len;) {
        int n = utf8_len((unsigned char)text[i]);
        if (i + n > text_len) n = 1;
        Symbol s;
        s.prev = (int)syms.size() - 1;
        s.next = (int)syms.size() + 1;
        s.text = text + i;
        s.n = n;
        syms.push_back(s);
        i += n;
    }
    const int n_sym = (int)syms.size();

    std::priority_queue<Bigram> heap;
    std::string buf;
    auto try_bigram = [&](int left) {
        int right = syms[left].next;
        if (left < 0 || right >= n_sym) return;
        buf.assign(syms[left].text, (size_t)(syms[left].n + syms[right].n));
        auto it = v.piece_to_id.find(buf);
        if (it == v.piece_to_id.end()) return;
        heap.push(Bigram{v.scores[it->second], left, right,
                         syms[left].n + syms[right].n});
    };
    for (int i = 0; i + 1 < n_sym; ++i) try_bigram(i);

    while (!heap.empty()) {
        Bigram b = heap.top();
        heap.pop();
        Symbol& l = syms[b.left];
        Symbol& r = syms[b.right];
        if (l.n == 0 || r.n == 0 || l.n + r.n != b.size || l.next != b.right)
            continue;                      // stale entry
        l.n += r.n;
        r.n = 0;
        l.next = r.next;
        if (r.next < n_sym) syms[r.next].prev = b.left;
        try_bigram(b.left);
        if (l.prev >= 0) try_bigram(l.prev);
    }

    int64_t n_out = 0;
    for (int i = 0; i >= 0 && i < n_sym; i = syms[i].next) {
        if (syms[i].n == 0) continue;
        buf.assign(syms[i].text, (size_t)syms[i].n);
        auto it = v.piece_to_id.find(buf);
        if (it != v.piece_to_id.end()) {
            if (n_out >= out_cap) return -1;
            out[n_out++] = it->second;
        } else {
            for (int k = 0; k < syms[i].n; ++k) {
                if (n_out >= out_cap) return -1;
                unsigned char byte = (unsigned char)syms[i].text[k];
                int32_t tid = v.byte_tokens[byte];
                out[n_out++] = tid >= 0 ? tid : v.unk_id;
            }
        }
    }
    return n_out;
}

}  // extern "C"
