// Test oracle: run the *reference* perplexity loop (compiled from
// /root/reference, examples/perplexity/perplexity.cpp:28-119) on a model
// file + explicit token list, so our runtime/perplexity.py can be gated
// against the reference's ppl VALUE end-to-end (format -> loader ->
// forward -> windowing -> NLL), not just a few tokens of logits.
// Tokens are passed directly (not text) so the gate isolates the eval
// math from tokenizer parity, which has its own golden tests.
// Usage: ref_perplexity <model.ggjt> <n_ctx> <n_batch> <tok0,tok1,...>
// Prints: "RESULT nll count ppl" plus per-chunk running ppl lines.
#include "llama.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

static std::vector<double> softmax_d(const std::vector<float> &logits) {
    std::vector<double> probs(logits.size());
    float max_logit = logits[0];
    for (float v : logits) max_logit = std::max(max_logit, v);
    double sum_exp = 0.0;
    for (size_t i = 0; i < logits.size(); i++) {
        probs[i] = std::exp((double) logits[i] - max_logit);
        sum_exp += probs[i];
    }
    for (double &p : probs) p /= sum_exp;
    return probs;
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s model n_ctx n_batch tokens\n", argv[0]);
        return 1;
    }
    const int n_ctx   = atoi(argv[2]);
    const int n_batch = atoi(argv[3]);

    llama_init_backend(false);
    llama_context_params cp = llama_context_default_params();
    cp.n_ctx      = n_ctx;
    cp.n_batch    = n_batch;
    cp.f16_kv     = false;
    cp.logits_all = true;
    cp.use_mmap   = false;
    llama_model *model = llama_load_model_from_file(argv[1], cp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    llama_context *ctx = llama_new_context_with_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }

    std::vector<llama_token> tokens;
    for (char *p = strtok(argv[4], ","); p; p = strtok(nullptr, ",")) {
        tokens.push_back(atoi(p));
    }

    // --- the perplexity() loop, verbatim semantics (perplexity.cpp:28-119)
    int count = 0;
    const int n_chunk = (int) tokens.size() / n_ctx;
    const int n_vocab = llama_n_vocab(ctx);
    double nll = 0.0;

    for (int i = 0; i < n_chunk; ++i) {
        const int start = i * n_ctx;
        const int end   = start + n_ctx;
        const int num_batches = (n_ctx + n_batch - 1) / n_batch;
        std::vector<float> logits;

        for (int j = 0; j < num_batches; ++j) {
            const int batch_start = start + j * n_batch;
            const int batch_size  = std::min(end - batch_start, n_batch);
            const auto token_org = tokens[batch_start];
            if (j == 0) {
                tokens[batch_start] = llama_token_bos();
            }
            if (llama_eval(ctx, tokens.data() + batch_start, batch_size,
                           j * n_batch, 2)) {
                fprintf(stderr, "eval failed\n");
                return 1;
            }
            tokens[batch_start] = token_org;
            const float *batch_logits = llama_get_logits(ctx);
            logits.insert(logits.end(), batch_logits,
                          batch_logits + (size_t) batch_size * n_vocab);
        }

        for (int j = std::min(512, n_ctx / 2); j < n_ctx - 1; ++j) {
            const std::vector<float> tok_logits(
                logits.begin() + (size_t) (j + 0) * n_vocab,
                logits.begin() + (size_t) (j + 1) * n_vocab);
            const double prob = softmax_d(tok_logits)[tokens[start + j + 1]];
            nll += -std::log(prob);
            ++count;
        }
        printf("[%d]%.4lf\n", i + 1, std::exp(nll / count));
    }
    printf("RESULT %.12g %d %.12g\n", nll, count,
           std::exp(nll / (count > 0 ? count : 1)));
    return 0;
}
