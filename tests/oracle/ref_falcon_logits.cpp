// Test oracle: evaluate tokens with the *reference* fork's Falcon
// runtime (arch/falcon/falcon.cpp, compiled from /root/reference at test
// time) and print all-token logits, so our unified TPU forward can be
// checked for numerical parity on the Falcon family (MQA fused QKV, LayerNorm,
// neox rope, parallel residual).
// Usage: ref_falcon_logits <model.bin> <tok0,tok1;tok2,...>
//   ';' splits eval SEGMENTS: each is a separate falcon_eval at the
//   accumulated n_past, exercising the decode chain (KV-cache reuse and
//   the fork's whole-cache re-rope, falcon.cpp:1260-1274) — one segment
//   reproduces the old single-eval behavior.
// Prints: n_tokens n_vocab, then one line of logits per token position.
#include "arch/falcon/falcon.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model tokens\n", argv[0]);
        return 1;
    }
    falcon_context_params cp = falcon_context_default_params();
    cp.n_ctx = 128;
    cp.f16_kv = false;
    cp.logits_all = true;
    cp.use_mmap = false;
    falcon_context *ctx = falcon_init_from_file(argv[1], cp);
    if (!ctx) { fprintf(stderr, "load failed\n"); return 1; }

    std::vector<std::vector<falcon_token>> segs(1);
    for (const char *p = argv[2]; *p;) {
        if (*p == ';') { segs.emplace_back(); ++p; continue; }
        if (*p == ',') { ++p; continue; }
        segs.back().push_back((falcon_token) strtol(p, (char **) &p, 10));
    }
    size_t total = 0;
    for (const auto &s : segs) total += s.size();
    const int n_vocab = falcon_n_vocab(ctx);
    printf("%zu %d\n", total, n_vocab);
    int n_past = 0;
    for (auto &seg : segs) {
        if (seg.empty()) continue;
        if (falcon_eval(ctx, seg.data(), (int) seg.size(), n_past, 2) != 0) {
            fprintf(stderr, "eval failed\n");
            return 1;
        }
        n_past += (int) seg.size();
        const float *logits = falcon_get_logits(ctx);
        for (size_t i = 0; i < seg.size(); ++i) {
            for (int j = 0; j < n_vocab; ++j) {
                printf("%.9g ", logits[i * n_vocab + j]);
            }
            printf("\n");
        }
    }
    return 0;
}
