// Test oracle: evaluate tokens with the *reference* llama.cpp (compiled from
// /root/reference at test time) and print all-token logits, so our TPU
// runtime can be checked for numerical parity end-to-end.
// Usage: ref_logits <model.ggjt> <tok0,tok1,...>
// Prints: n_tokens n_vocab, then one line of logits per token position.
#include "llama.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model tokens\n", argv[0]);
        return 1;
    }
    llama_init_backend(false);
    llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 128;
    cp.f16_kv = false;
    cp.logits_all = true;
    cp.use_mmap = false;
    llama_model *model = llama_load_model_from_file(argv[1], cp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    llama_context *ctx = llama_new_context_with_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    std::vector<llama_token> toks;
    for (char *p = strtok(argv[2], ","); p; p = strtok(nullptr, ",")) {
        toks.push_back(atoi(p));
    }
    if (llama_eval(ctx, toks.data(), (int) toks.size(), 0, 2) != 0) {
        fprintf(stderr, "eval failed\n");
        return 1;
    }
    const int n_vocab = llama_n_vocab(ctx);
    const float *logits = llama_get_logits(ctx);
    printf("%zu %d\n", toks.size(), n_vocab);
    for (size_t i = 0; i < toks.size(); ++i) {
        for (int j = 0; j < n_vocab; ++j) {
            printf("%.9g ", logits[i * n_vocab + j]);
        }
        printf("\n");
    }
    return 0;
}
