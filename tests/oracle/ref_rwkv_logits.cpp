// Test oracle: run the *reference* RWKV runtime (arch/rwkv/rwkv.cpp,
// compiled from /root/reference at test time) token by token and print the
// output distribution after each token (rwkv_get_logits returns in-graph
// softmax probs, rwkv.cpp:1667-1671).
// Usage: ref_rwkv_logits <model.ggjt> <tok0,tok1,...>
#include "rwkv.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model tokens\n", argv[0]);
        return 1;
    }
    rwkv_context_params cp = rwkv_context_default_params();
    cp.use_mmap = false;
    rwkv_context *ctx = rwkv_init_from_file(argv[1], cp);
    if (!ctx) { fprintf(stderr, "load failed\n"); return 1; }

    std::vector<int> toks;
    for (char *p = strtok(argv[2], ","); p; p = strtok(nullptr, ",")) {
        toks.push_back(atoi(p));
    }
    const int n_vocab = rwkv_n_vocab(ctx);
    printf("%zu %d\n", toks.size(), n_vocab);
    for (size_t i = 0; i < toks.size(); ++i) {
        if (rwkv_eval(ctx, toks[i], nullptr) != 0) {
            fprintf(stderr, "eval failed\n");
            return 1;
        }
        const float *probs = rwkv_get_logits(ctx);
        for (int j = 0; j < n_vocab; ++j) printf("%.9g ", probs[j]);
        printf("\n");
    }
    return 0;
}
