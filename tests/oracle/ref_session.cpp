// Test oracle: exercise the *reference* GGSN v1 session save/load
// (llama_save_session_file / llama_load_session_file, llama.cpp:3291-3368)
// so our formats/ggsn.py can be gated for byte-level interop.
//
//   ref_session save <model> <out.ggsn> <tok0,tok1,...>
//       eval tokens, save the session, print the last-token logits.
//   ref_session load <model> <in.ggsn> <tok0,tok1,...>
//       load the session, print its token history on line 1, then eval the
//       given EXTRA tokens one at a time from n_past = session length,
//       printing one logits line per step.
#include "llama.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static std::vector<llama_token> parse(char *s) {
    std::vector<llama_token> t;
    for (char *p = strtok(s, ","); p; p = strtok(nullptr, ",")) {
        t.push_back(atoi(p));
    }
    return t;
}

static void print_logits(llama_context *ctx) {
    const int n_vocab = llama_n_vocab(ctx);
    const float *lg = llama_get_logits(ctx);
    for (int j = 0; j < n_vocab; ++j) printf("%.9g ", lg[j]);
    printf("\n");
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s save|load model session tokens\n", argv[0]);
        return 1;
    }
    llama_init_backend(false);
    llama_context_params cp = llama_context_default_params();
    cp.n_ctx = 64;
    cp.f16_kv = true;   // the default kv dtype the GGSN blob carries
    cp.use_mmap = false;
    llama_model *model = llama_load_model_from_file(argv[2], cp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    llama_context *ctx = llama_new_context_with_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    std::vector<llama_token> toks = parse(argv[4]);

    if (strcmp(argv[1], "save") == 0) {
        if (llama_eval(ctx, toks.data(), (int) toks.size(), 0, 2) != 0) {
            fprintf(stderr, "eval failed\n");
            return 1;
        }
        if (!llama_save_session_file(ctx, argv[3], toks.data(), toks.size())) {
            fprintf(stderr, "save failed\n");
            return 1;
        }
        print_logits(ctx);
        return 0;
    }

    // load
    std::vector<llama_token> hist(cp.n_ctx);
    size_t n_hist = 0;
    if (!llama_load_session_file(ctx, argv[3], hist.data(), hist.size(),
                                 &n_hist)) {
        fprintf(stderr, "session load failed\n");
        return 1;
    }
    for (size_t i = 0; i < n_hist; ++i) printf("%d ", hist[i]);
    printf("\n");
    int n_past = (int) n_hist;
    for (size_t i = 0; i < toks.size(); ++i) {
        if (llama_eval(ctx, &toks[i], 1, n_past, 2) != 0) {
            fprintf(stderr, "eval failed\n");
            return 1;
        }
        n_past += 1;
        print_logits(ctx);
    }
    return 0;
}
