// Test oracle: evaluate tokens with the *reference* fork's Bonsai
// runtime (arch/bonsai/bonsai.cpp, compiled from /root/reference at test
// time) and print all-token logits, so our unified TPU forward can be
// checked for numerical parity on the Bonsai family (RMSNorm+bias, grelu,
// neox rope, parallel residual).
// Usage: ref_bonsai_logits <model.bin> <tok0,tok1,...>
// Prints: n_tokens n_vocab, then one line of logits per token position.
#include "arch/bonsai/bonsai.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model tokens\n", argv[0]);
        return 1;
    }
    bonsai_context_params cp = bonsai_context_default_params();
    cp.n_ctx = 128;
    cp.f16_kv = false;
    cp.logits_all = true;
    cp.use_mmap = false;
    bonsai_context *ctx = bonsai_init_from_file(argv[1], cp);
    if (!ctx) { fprintf(stderr, "load failed\n"); return 1; }

    std::vector<bonsai_token> toks;
    for (char *p = strtok(argv[2], ","); p; p = strtok(nullptr, ",")) {
        toks.push_back(atoi(p));
    }
    if (bonsai_eval(ctx, toks.data(), (int) toks.size(), 0, 2) != 0) {
        fprintf(stderr, "eval failed\n");
        return 1;
    }
    const int n_vocab = bonsai_n_vocab(ctx);
    const float *logits = bonsai_get_logits(ctx);
    printf("%zu %d\n", toks.size(), n_vocab);
    for (size_t i = 0; i < toks.size(); ++i) {
        for (int j = 0; j < n_vocab; ++j) {
            printf("%.9g ", logits[i * n_vocab + j]);
        }
        printf("\n");
    }
    return 0;
}
