// Test oracle: run the *reference* tokenizer (llama_tokenizer,
// llama.cpp:1655-1802, compiled from /root/reference) over a framed batch
// of byte strings so our tokenizers (runtime/tokenizer.py and the native
// gt_tokenize) can be fuzz-gated against the real implementation — the
// checked-in goldens (tests/test-tokenizer-0.cpp) only cover 6 strings.
//
// Usage: ref_tokenize <vocab.bin> <cases.bin> <out.txt>
//   cases.bin: u32 n_cases, then per case {u32 len, u8 add_bos, bytes}
//              (bytes must be NUL-free: llama_tokenize takes a C string)
//   out.txt:   one line per case, space-separated token ids
#include "llama.h"

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s vocab.bin cases.bin out.txt\n", argv[0]);
        return 1;
    }
    llama_init_backend(false);
    llama_context_params cp = llama_context_default_params();
    cp.vocab_only = true;
    llama_model *model = llama_load_model_from_file(argv[1], cp);
    if (!model) { fprintf(stderr, "vocab load failed\n"); return 1; }
    llama_context *ctx = llama_new_context_with_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    FILE *in = fopen(argv[2], "rb");
    FILE *out = fopen(argv[3], "w");
    if (!in || !out) { fprintf(stderr, "io failed\n"); return 1; }

    uint32_t n_cases = 0;
    if (fread(&n_cases, 4, 1, in) != 1) return 1;
    for (uint32_t i = 0; i < n_cases; ++i) {
        uint32_t len = 0;
        uint8_t add_bos = 0;
        if (fread(&len, 4, 1, in) != 1) return 1;
        if (fread(&add_bos, 1, 1, in) != 1) return 1;
        std::string text(len, '\0');
        if (len && fread(&text[0], 1, len, in) != len) return 1;
        std::vector<llama_token> toks(len + 8);
        int n = llama_tokenize(ctx, text.c_str(), toks.data(),
                               (int) toks.size(), add_bos != 0);
        if (n < 0) { fprintf(stderr, "case %u overflow\n", i); return 1; }
        for (int j = 0; j < n; ++j) {
            fprintf(out, j ? " %d" : "%d", toks[j]);
        }
        fprintf(out, "\n");
    }
    fclose(out);
    return 0;
}
