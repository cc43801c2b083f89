"""Continuous-batching engine: per-row n_past forward correctness, engine
output parity with single-session generation, mid-flight admission, and the
batched server endpoint (SURVEY.md §7.7 — capability the reference lacks)."""

import http.client
import json
import queue
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models import transformer
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

GREEDY = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                        repeat_last_n=0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("be") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    return cfg, load_transformer(gf, cfg), gf


def test_per_row_n_past_matches_scalar(model):
    """forward with an n_past vector == row-by-row scalar forwards."""
    cfg, params, _ = model
    b = 3
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, 255, (b, 1)), jnp.int32)
    offs = [0, 3, 7]

    # per-row: prime each row's cache at a different offset
    ck, cv = transformer.init_cache(cfg, b, 32, dtype=jnp.float32)
    prim = jnp.asarray(rng.integers(0, 255, (b, 8)), jnp.int32)
    # prime rows individually with scalar n_past 0 (lengths differ by mask)
    rows = []
    for i in range(b):
        ck1, cv1 = transformer.init_cache(cfg, 1, 32, dtype=jnp.float32)
        if offs[i]:
            _, ck1, cv1 = transformer.forward(
                cfg, params, prim[i:i + 1, :offs[i]], jnp.int32(0), ck1, cv1)
        rows.append((ck1, cv1))
    ck = tuple(jnp.concatenate([rows[i][0][l] for i in range(b)], axis=0)
               for l in range(cfg.n_layer))
    cv = tuple(jnp.concatenate([rows[i][1][l] for i in range(b)], axis=0)
               for l in range(cfg.n_layer))

    got, _, _ = transformer.forward(
        cfg, params, tok, jnp.asarray(offs, jnp.int32), ck, cv,
        last_only=True)
    for i in range(b):
        want, _, _ = transformer.forward(
            cfg, params, tok[i:i + 1], jnp.int32(offs[i]),
            tuple(c[i:i + 1] for c in ck), tuple(c[i:i + 1] for c in cv),
            last_only=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want[0]),
                                   rtol=1e-4, atol=1e-4)


def test_engine_matches_single_session(model):
    """Greedy outputs through the engine == single-session Context decode,
    even with concurrent interleaved requests."""
    cfg, params, gf = model
    prompts = [[3, 5, 7], [11, 13], [100, 90, 80, 70]]

    def single(prompt, n=6):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    refs = [single(p) for p in prompts]

    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64)
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=6, sampling=GREEDY))
                for p in prompts]  # 3 requests, 2 slots: forces queueing
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    # bf16 cache + batched math: identical greedy paths expected on this
    # scale; compare token-for-token
    for ref, out in zip(refs, outs):
        assert ref == out, (ref, out)


def test_engine_n_predict_and_stop(model):
    cfg, params, _ = model
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64)
    eng.start()
    try:
        r1 = eng.submit(Request([5, 6], n_predict=2, sampling=GREEDY))
        out = list(r1.tokens())
        assert len(out) <= 2
        # stop sequence of length 1 = first generated token -> single token
        first = out[0]
        r2 = eng.submit(Request([5, 6], n_predict=8, sampling=GREEDY,
                                stop_sequences=((first,),)))
        out2 = list(r2.tokens())
        assert out2[0] == first and len(out2) == 1
    finally:
        eng.stop()
    assert eng.n_active == 0


def test_server_parallel_endpoint(model, tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from llama_cpp_q_4_0_tpu.cli.common import load_model
    from llama_cpp_q_4_0_tpu.cli.server import ServerState, make_handler

    path = str(tmp_path_factory.mktemp("besrv") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)

    class A:
        model, arch, n_ctx, n_batch = path, None, 64, 64
        lora = lora_base = None
        memory_f32 = False

    lm = load_model(A())
    eng = BatchEngine(lm.cfg, lm.ctx.params, n_slots=2, n_ctx=64)
    eng.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(ServerState(lm, eng)))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        results = {}

        def post(i):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("POST", "/completion",
                         json.dumps({"prompt": f"req {i}", "n_predict": 4,
                                     "seed": i}),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            results[i] = (r.status, json.loads(r.read()))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            st, body = results[i]
            assert st == 200 and body["tokens_predicted"] <= 4
    finally:
        httpd.shutdown()
        eng.stop()


def test_profiling_dump(model):
    from llama_cpp_q_4_0_tpu.utils.profiling import dump_graph, op_histogram

    cfg, params, _ = model
    ctx = Context(cfg, params, n_ctx=64)
    hist = op_histogram(ctx)
    assert hist.get("dot_general", 0) > 0
    txt = dump_graph(ctx, compiled_stats=True)
    assert "equations" in txt and "dot_general" in txt


def test_engine_chunked_matches_single_session(model):
    """Throughput mode (on-device greedy, chunk=4) == host greedy."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params, _ = model
    prompts = [[3, 5, 7], [11, 13]]

    def single(prompt, n=6):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    refs = [single(p) for p in prompts]
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, chunk=4,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=6, sampling=GREEDY))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out in zip(refs, outs):
        assert ref == out, (ref, out)


def test_engine_chunked_staggered_admission(model):
    """A request submitted while the async pipeline has in-flight ticks
    forces a flush+admit; outputs must still match single-session greedy."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params, _ = model

    def single(prompt, n=8):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    p1, p2 = [3, 5, 7], [11, 13]
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, chunk=2,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        r1 = eng.submit(Request(p1, n_predict=8, sampling=GREEDY))
        first = next(iter(r1.tokens()))  # r1 is mid-flight now
        r2 = eng.submit(Request(p2, n_predict=8, sampling=GREEDY))
        rest1 = list(r1.tokens())
        out2 = list(r2.tokens())
    finally:
        eng.stop()
    assert [first] + rest1 == single(p1)
    assert out2 == single(p2)


def test_engine_speculative_matches_single_session(model):
    """Speculative continuous batching (spec_draft>0) == host greedy,
    token for token, including staggered admission."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params, _ = model

    def single(prompt, n=10):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    prompts = [[3, 5, 7, 3, 5], [11, 13, 11, 13], [9, 4]]
    refs = [single(p) for p in prompts]
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, spec_draft=3,
                      chunk=2, device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        # 3 requests through 2 slots: the third admits after a free-up
        reqs = [eng.submit(Request(p, n_predict=10, sampling=GREEDY))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out, p in zip(refs, outs, prompts):
        assert ref == out, (p, ref, out)


def test_server_parallel_draft_endpoint(model, tmp_path_factory):
    """--parallel --parallel-draft speculative serving end-to-end."""
    from http.server import ThreadingHTTPServer

    from llama_cpp_q_4_0_tpu.cli.common import load_model
    from llama_cpp_q_4_0_tpu.cli.server import ServerState, make_handler
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    path = str(tmp_path_factory.mktemp("bespec") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)

    class A:
        model, arch, n_ctx, n_batch = path, None, 64, 64
        lora = lora_base = None
        memory_f32 = False

    lm = load_model(A())
    eng = BatchEngine(lm.cfg, lm.ctx.params, n_slots=2, n_ctx=64,
                      spec_draft=3,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(ServerState(lm, eng)))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/completion",
                     json.dumps({"prompt": "hello hello", "n_predict": 6}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        body = json.loads(r.read())
        assert 0 < body["tokens_predicted"] <= 6
    finally:
        httpd.shutdown()
        eng.stop()


def test_engine_adaptive_spec_fallback(model):
    """spec_max_active forces plain chunked ticks at high occupancy and
    switches back to speculative (with history resync) as slots free —
    greedy outputs stay exact across both transitions."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params, _ = model

    def single(prompt, n):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    # staggered n_predict so occupancy drops 3 -> 2 -> 1 mid-run
    prompts = [[3, 5, 7, 3, 5], [11, 13, 11], [9, 4, 9, 4]]
    n_preds = [4, 8, 14]
    refs = [single(p, n) for p, n in zip(prompts, n_preds)]
    eng = BatchEngine(cfg, params, n_slots=3, n_ctx=64, spec_draft=3,
                      chunk=2, spec_max_active=1,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=n, sampling=GREEDY))
                for p, n in zip(prompts, n_preds)]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out, p in zip(refs, outs, prompts):
        assert ref == out, (p, ref, out)


def test_engine_prefix_cache_exact(model):
    """register_prefix: admissions that share the prefix copy cached KV
    rows + prefill only the remainder — greedy output identical to full
    prefill, for both matching and non-matching prompts."""
    cfg, params, _ = model
    sys_prefix = [7, 11, 13, 17, 19]
    prompts = [sys_prefix + [23, 29], sys_prefix + [31],
               [3, 5, 9]]  # last one does NOT match

    def single(prompt, n=6):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    refs = [single(p) for p in prompts]
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64)
    eng.register_prefix(sys_prefix)
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=6, sampling=GREEDY))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out, p in zip(refs, outs, prompts):
        assert out == ref, (p, ref, out)


def test_engine_prefix_cache_q8_and_spec(model):
    """Prefix caching composes with the q8 cache and speculative ticks."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params, _ = model
    sys_prefix = [7, 11, 13, 17]
    prompt = sys_prefix + [23, 29]

    def single(prompt, n=6):
        ctx = Context(cfg, params, n_ctx=64, cache_dtype=jnp.int8)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    ref = single(prompt)
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, spec_draft=3,
                      chunk=2, cache_dtype=jnp.int8,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.register_prefix(sys_prefix)
    eng.start()
    try:
        out = list(eng.submit(Request(prompt, n_predict=6,
                                      sampling=GREEDY)).tokens())
    finally:
        eng.stop()
    assert out == ref, (ref, out)


def test_request_cancellation(model):
    """cancel() frees the slot at the next tick; the token queue closes."""
    import time as _t

    cfg, params, _ = model
    eng = BatchEngine(cfg, params, n_slots=1, n_ctx=64)
    eng.start()
    try:
        r1 = eng.submit(Request([5, 9], n_predict=1 << 20, sampling=GREEDY))
        it = r1.tokens()
        next(it)  # streaming
        r1.cancel()
        toks = list(it)  # must terminate promptly
        assert len(toks) < 64
        # the freed slot serves the next request
        r2 = eng.submit(Request([7, 3], n_predict=4, sampling=GREEDY))
        assert 0 < len(list(r2.tokens())) <= 4
    finally:
        eng.stop()


def test_engine_stats_counters(model):
    cfg, params, _ = model
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64)
    eng.start()
    try:
        r = eng.submit(Request([5, 9, 23], n_predict=5, sampling=GREEDY))
        out = list(r.tokens())
    finally:
        eng.stop()
    st = eng.stats()
    assert st["n_tokens_out"] == len(out)
    assert st["n_requests_done"] == 1
    assert st["n_ticks"] >= len(out) - 1
    assert st["n_active"] == 0


def test_chunked_prefill_long_prompt(model):
    """A prompt longer than prefill_chunk admits incrementally (detached
    row buffer, ticks keep flowing) with exact greedy output; a short
    request submitted mid-prefill still completes."""
    cfg, params, _ = model
    rng = np.random.default_rng(51)
    long_p = rng.integers(3, 250, 40).tolist()  # > prefill_chunk below
    short_p = [5, 9]

    def single(prompt, n=6):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    want_long, want_short = single(long_p), single(short_p)
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64)
    eng.prefill_chunk = 8  # force many chunks
    eng.start()
    try:
        r1 = eng.submit(Request(long_p, n_predict=6, sampling=GREEDY))
        r2 = eng.submit(Request(short_p, n_predict=6, sampling=GREEDY))
        out2 = list(r2.tokens())
        out1 = list(r1.tokens())
    finally:
        eng.stop()
    assert out1 == want_long, (want_long, out1)
    assert out2 == want_short, (want_short, out2)


def test_engine_randomized_differential(model):
    """Randomized engine fuzz: 10 requests with random prompts, lengths,
    n_predict, and greedy sampler knobs (penalties/windows), submitted in
    two waves onto 3 slots with one mid-flight cancellation, across three
    engine modes (plain, chunked device ticks, speculative ticks) — every
    surviving request must match a fresh single-session generate()
    token-for-token.  Broadens the fixed-scenario parity gates with seeded
    randomized coverage of admission order x knob combinations."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate

    cfg, params, _ = model
    rng = np.random.default_rng(77)
    cases = []
    for _ in range(10):
        prompt = rng.integers(3, 250, int(rng.integers(1, 12))).tolist()
        sp = SamplingParams(
            temp=-1.0, top_k=0,
            repeat_penalty=float(rng.choice([1.0, 1.1, 1.4])),
            repeat_last_n=int(rng.choice([0, 4, 16])),
            frequency_penalty=float(rng.choice([0.0, 0.2])),
            presence_penalty=float(rng.choice([0.0, 0.3])),
        )
        cases.append((prompt, sp, int(rng.integers(1, 8))))

    def host(prompt, sp, n):
        ctx = Context(cfg, params, n_ctx=64)
        return list(generate(ctx, prompt,
                             GenerateParams(n_predict=n, sampling=sp)))

    refs = [host(*c) for c in cases]

    for engine_kw in (dict(), dict(chunk=3), dict(spec_draft=3, chunk=2)):
        kw = dict(engine_kw)
        if kw:
            kw.update(per_request_sampling=True,
                      device_sampling=DeviceSampling(temp=-1.0))
        eng = BatchEngine(cfg, params, n_slots=3, n_ctx=64, **kw)
        eng.start()
        try:
            wave1 = [eng.submit(Request(p, n_predict=n, sampling=sp))
                     for p, sp, n in cases[:6]]
            victim = wave1[2]
            victim.cancel()
            for _ in victim.tokens():
                pass
            wave2 = [eng.submit(Request(p, n_predict=n, sampling=sp))
                     for p, sp, n in cases[6:]]
            outs = []
            for i, r in enumerate(wave1 + wave2):
                if i == 2:
                    outs.append([])
                    continue
                out = []
                while True:
                    try:
                        t = r.out.get(timeout=120)
                    except queue.Empty:  # fail with state, don't hang CI
                        raise AssertionError(
                            f"engine starved request {i} (mode={engine_kw}, "
                            f"stats={eng.stats()})") from None
                    if t is None:
                        break
                    # the engine enqueues per-tick LISTS (one wakeup per
                    # tick); this raw-queue drain mirrors Request.tokens
                    out.extend(t if isinstance(t, list) else [t])
                outs.append(out)
        finally:
            eng.stop()
        for i, (out, ref) in enumerate(zip(outs, refs[:6] + refs[6:])):
            if i == 2:
                continue  # the cancelled request may stop anywhere
            assert out == ref, (engine_kw, i, cases[i], out, ref)


def test_engine_hbm_capacity_guard(model):
    """A slots x ctx x dtype plan past the HBM budget refuses loudly at
    construction (kv_cache_init sizing, llama.cpp:733-776) instead of
    OOM-wedging mid-serving; the q8 cache halves the KV term and fits."""
    import jax.numpy as jnp
    import pytest as _pytest

    from llama_cpp_q_4_0_tpu.runtime.batch_engine import estimate_engine_hbm

    cfg, params, _ = model
    weights, kv_bf16 = estimate_engine_hbm(params, cfg, 16, 2048,
                                           jnp.bfloat16)
    _, kv_q8 = estimate_engine_hbm(params, cfg, 16, 2048, jnp.int8)
    # int8 + scale planes vs bf16: (hd + 4) / 2*hd -> 0.625 at hd=16
    assert kv_q8 < 0.65 * kv_bf16
    # a limit that admits the q8 plan but not the bf16 one
    limit = int((weights + (kv_q8 + kv_bf16) / 2) / 0.85)
    # an EXPLICIT bf16 choice refuses loudly
    with _pytest.raises(ValueError, match="does not fit HBM"):
        BatchEngine(cfg, params, n_slots=16, n_ctx=2048, chunk=2,
                    cache_dtype=jnp.bfloat16, hbm_limit_bytes=limit)
    eng = BatchEngine(cfg, params, n_slots=16, n_ctx=2048, chunk=2,
                      cache_dtype=jnp.int8, hbm_limit_bytes=limit)
    assert eng.n_ctx == 2048  # constructed fine; never started
    # the default ("auto") picks bf16 when it fits, int8 when only it does
    eng = BatchEngine(cfg, params, n_slots=16, n_ctx=2048, chunk=2,
                      hbm_limit_bytes=limit)
    assert eng.stats()["cache_dtype"] == "int8"
    assert eng.cache_k[0].data.dtype == jnp.int8  # QuantKV layout
    roomy = int((weights + 2 * kv_bf16) / 0.85)
    eng = BatchEngine(cfg, params, n_slots=16, n_ctx=2048, chunk=2,
                      hbm_limit_bytes=roomy)
    assert eng.stats()["cache_dtype"] == "bfloat16"
    # nothing past the plan budget even as q8 still refuses
    with _pytest.raises(ValueError, match="does not fit HBM"):
        BatchEngine(cfg, params, n_slots=16, n_ctx=2048, chunk=2,
                    hbm_limit_bytes=int(weights * 0.9))


def test_server_parallel_mirostat_and_bias(model, tmp_path_factory):
    """HTTP -> engine wiring for the per-request device sampler: a
    mirostat-v2 request and a logit_bias request served from the same
    chunked per-request-sampling engine (no host-tick downgrade)."""
    from http.server import ThreadingHTTPServer

    from llama_cpp_q_4_0_tpu.cli.common import load_model
    from llama_cpp_q_4_0_tpu.cli.server import ServerState, make_handler
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    path = str(tmp_path_factory.mktemp("besrv2") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)

    class A:
        model, arch, n_ctx, n_batch = path, None, 64, 64
        lora = lora_base = None
        memory_f32 = False

    lm = load_model(A())
    eng = BatchEngine(lm.cfg, lm.ctx.params, n_slots=2, n_ctx=64, chunk=3,
                      per_request_sampling=True,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(ServerState(lm, eng)))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("POST", "/completion", json.dumps(body),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, json.loads(r.read())

        st, body = post({"prompt": "hello", "n_predict": 6, "seed": 3,
                         "temperature": 0.9, "mirostat": 2,
                         "mirostat_tau": 4.0, "mirostat_eta": 0.2})
        assert st == 200 and body["tokens_predicted"] >= 1
        assert eng.stats()["mode"] == "chunked"

        # ban (reference [tok, false] form) the greedy output's pieces:
        # the greedy stream must change.  Retokenizing text can differ
        # from the generated ids (merges), so grow the ban set until the
        # output moves.
        st, plain = post({"prompt": "hello", "n_predict": 6,
                          "temperature": -1.0})
        assert st == 200 and plain["content"]
        ban_ids, content = set(), plain["content"]
        for _ in range(4):
            ban_ids |= set(lm.tokenizer.tokenize(content, bos=False))
            st, banned = post({"prompt": "hello", "n_predict": 6,
                               "temperature": -1.0,
                               "logit_bias": [[int(t), False]
                                              for t in ban_ids]})
            assert st == 200
            content = banned["content"]
            if content != plain["content"]:
                break
        assert banned["content"] != plain["content"]
    finally:
        httpd.shutdown()
        eng.stop()


def test_admission_failure_closes_requests(model):
    """If the admission forward dies (e.g. a device compile error), every
    client must get a closed token stream — including requests already
    popped from _pending and mid-admission, which before the r4 fix were
    bound to no slot and blocked their clients forever (the 45-minute
    engine-bench hang, 2026-08-20)."""
    cfg, params, _ = model
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64)

    def boom(*a, **k):
        raise RuntimeError("injected compile failure")

    eng._admit_batched = boom
    eng._jit_prefill = boom
    rs = [eng.submit(Request([5, 9, 23], n_predict=4, sampling=GREEDY))
          for _ in range(2)]
    eng.start()
    try:
        for r in rs:
            assert list(r.tokens()) == []  # closed promptly, no tokens
        with pytest.raises(RuntimeError):
            eng.submit(Request([5], n_predict=1, sampling=GREEDY))
    finally:
        eng.stop()


def test_long_prompt_burst_admits_per_slot(model, monkeypatch):
    """A burst whose padded admission matrix exceeds MAX_PALLAS_ROWS must
    route per-slot instead of batched (the flattened [M_pad*T_pad, K] qmm
    has no batch blocking: a 16x1900 burst emitted a b=32768 kernel whose
    remote compile ground 45 min on chip, 2026-08-20) — with identical
    greedy output either way."""
    from llama_cpp_q_4_0_tpu.ops import qmatmul as qm
    from llama_cpp_q_4_0_tpu.runtime import batch_engine as be

    cfg, params, _ = model
    prompts = [[5, 9, 23, 7], [3, 11, 2, 8], [6, 4], [9, 9, 1]]

    def run():
        calls = {"batched": 0}
        orig = be.BatchEngine._admit_batched

        def spy(self, batch):
            calls["batched"] += 1
            return orig(self, batch)

        monkeypatch.setattr(be.BatchEngine, "_admit_batched", spy)
        eng = be.BatchEngine(cfg, params, n_slots=4, n_ctx=64)
        reqs = [eng.submit(be.Request(p, n_predict=6, sampling=GREEDY))
                for p in prompts]  # enqueue BEFORE start: one burst
        eng.start()
        try:
            outs = [list(r.tokens()) for r in reqs]
        finally:
            eng.stop()
        return outs, calls["batched"]

    base, nb = run()
    assert nb >= 1  # small burst under the default cap admits batched
    monkeypatch.setattr(qm, "MAX_PALLAS_ROWS", 4)
    capped, nc = run()
    assert nc == 0  # over the cap: per-slot admission
    assert capped == base


def test_context_split_param_views(model, monkeypatch):
    """QMM_ZERO_FOLD=1: Context serves decode-shaped calls (bucketed
    t <= 32) from the zero-folded view and larger prefills from the RAW
    view (the gbias stream regresses compute-bound prefill +6.8% on chip,
    decomp-prefill 2026-08-20).  The views share levels/scales buffers —
    fold only adds gbias planes."""
    import jax

    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

    monkeypatch.setenv("QMM_ZERO_FOLD", "1")
    cfg, params, _ = model
    ctx = Context(cfg, params)

    def qleaves(p):
        return [t for t in jax.tree_util.tree_leaves(
                    p, is_leaf=lambda t: isinstance(t, QTensor))
                if isinstance(t, QTensor) and t.packed]

    folded, raw = qleaves(ctx.params), qleaves(ctx._params_prefill)
    assert folded and raw and len(folded) == len(raw)
    assert all(t.gbias_t is not None for t in folded)
    assert all(t.gbias_t is None for t in raw)
    assert folded[0].levels_t is raw[0].levels_t  # shared buffers
    assert folded[0].gscale_t is raw[0].gscale_t

    monkeypatch.setenv("QMM_ZERO_FOLD", "0")
    ref = Context(cfg, params)
    prompt = list(range(2, 50))  # t=48 buckets to 64 > 32: raw-view path
    a, b = ctx.eval(prompt), ref.eval(prompt)
    np.testing.assert_allclose(a, b)  # raw view == unfolded: identical
    # decode step: folded vs unfolded within the documented fold tolerance
    a, b = ctx.eval([7]), ref.eval([7])
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)


def test_long_prompt_admissions_serialize_through_chunked_lane(model):
    """Multiple long prompts admitted together ride the chunked lane in
    same-chunk-count COHORTS (up to lane_width per [K, chunk] lockstep
    forward); the rest DEFER (re-queued in order) until the lane frees —
    never the direct [1, ~n_ctx] prefill whose XLA temps OOM'd the
    16x2048 q8 flagship (2026-08-20), and never a flattened full-prompt
    matrix.  Greedy outputs must match single-session decoding."""
    from llama_cpp_q_4_0_tpu.runtime import batch_engine as be

    cfg, params, _ = model
    rng = np.random.default_rng(77)
    prompts = [rng.integers(3, 250, 30 + 4 * i).tolist() for i in range(3)]

    def single(prompt, n=5):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    want = [single(p) for p in prompts]

    lane_starts = []  # one list of prompt lengths per cohort start
    orig_start = be.BatchEngine._start_prefill

    def spy_start(self, entries):
        lane_starts.append([len(p) for _, _, p in entries])
        return orig_start(self, entries)

    eng = BatchEngine(cfg, params, n_slots=3, n_ctx=64)
    eng.prefill_chunk = 8  # every prompt above is "long"
    eng._start_prefill = spy_start.__get__(eng)
    reqs = [eng.submit(Request(p, n_predict=5, sampling=GREEDY))
            for p in prompts]  # burst BEFORE start
    eng.start()
    try:
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    assert outs == want, (want, outs)
    # every long prompt entered through the chunked lane, in cohorts
    # bounded by lane_width and a shared chunk count
    assert (sorted(x for c in lane_starts for x in c)
            == sorted(len(p) for p in prompts)), lane_starts
    for cohort in lane_starts:
        assert len(cohort) <= eng.lane_width
        assert len({-(-x // eng.prefill_chunk) for x in cohort}) == 1
    # lens 30/34/38 at chunk=8: counts 4/5/5 — the 34/38 pair cohorts
    assert len(lane_starts) == 2, lane_starts


def test_lane_width_clamps_to_free_hbm(model):
    """Each lane row cache transiently costs one slot's KV: with an
    injected HBM limit leaving room for only ~2.5 rows above weights+KV,
    the cohort width clamps to 2 (int8 cache; the bf16 width-1 rule is
    TPU-scoped)."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.runtime.batch_engine import (
        BatchEngine, estimate_engine_hbm)

    cfg, params, _ = model
    w_b, kv_b = estimate_engine_hbm(params, cfg, 8, 64, jnp.int8)
    row = kv_b // 8
    lim = w_b + kv_b + (512 << 20) + 2 * row + row // 2
    eng = BatchEngine(cfg, params, n_slots=8, n_ctx=64,
                      cache_dtype=jnp.int8, hbm_limit_bytes=lim)
    assert eng.lane_width == 2, eng.lane_width


def test_long_prompt_cohort_rides_lane_together(model, monkeypatch):
    """Equal-chunk-count long prompts admit as ONE lane cohort (lockstep
    [K, chunk] forwards), token-for-token equal to single-session decode
    — including final pieces of different lengths within the shared
    chunk count (the per-row causal mask must keep each row's padding
    out of its own attention)."""
    from llama_cpp_q_4_0_tpu.runtime import batch_engine as be

    cfg, params, _ = model
    rng = np.random.default_rng(55)
    # chunk=8, counts ceil(25/8)=4, ceil(28/8)=4, ceil(31/8)=4: one cohort
    prompts = [rng.integers(3, 250, n).tolist() for n in (25, 28, 31)]

    def single(prompt, n=5):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    want = [single(p) for p in prompts]
    lane_starts = []
    orig_start = be.BatchEngine._start_prefill

    def spy_start(self, entries):
        lane_starts.append([len(p) for _, _, p in entries])
        return orig_start(self, entries)

    monkeypatch.setattr(be.BatchEngine, "_start_prefill", spy_start)
    eng = be.BatchEngine(cfg, params, n_slots=3, n_ctx=64)
    eng.prefill_chunk = 8
    reqs = [eng.submit(be.Request(p, n_predict=5, sampling=GREEDY))
            for p in prompts]
    eng.start()
    try:
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    assert outs == want, (want, outs)
    assert lane_starts == [[25, 28, 31]], lane_starts  # one 3-wide cohort


def test_short_burst_admits_batched(model, monkeypatch):
    """The admission boundary: in one mixed burst, SHORT prompts
    (<= prefill_chunk) ride the batched [M_pad, T_pad] admission while
    LONG prompts serialize through the chunked lane — never a direct
    [1, ~n_ctx] prefill (whose XLA temps OOM'd the 16x2048 q8 flagship)
    and never a flattened long-prompt matrix (whose b=32768 qmm ground a
    45-min remote compile).  Greedy outputs match single-session decode."""
    from llama_cpp_q_4_0_tpu.runtime import batch_engine as be

    cfg, params, _ = model
    rng = np.random.default_rng(123)
    short_prompts = [rng.integers(3, 250, 4 + i).tolist() for i in range(2)]
    long_prompts = [rng.integers(3, 250, 25 + 8 * i).tolist()
                    for i in range(2)]

    def single(prompt, n=4):
        ctx = Context(cfg, params, n_ctx=64)
        logits = ctx.eval(np.asarray([prompt], np.int32))
        out = []
        for _ in range(n):
            t = int(np.argmax(logits[0, -1]))
            if t == 2:
                break
            out.append(t)
            logits = ctx.eval(np.asarray([[t]], np.int32))
        return out

    prompts = short_prompts + long_prompts
    want = [single(p) for p in prompts]

    batched_lens, lane_lens = [], []
    orig_batched = be.BatchEngine._admit_batched
    orig_start = be.BatchEngine._start_prefill

    def spy_batched(self, batch):
        batched_lens.extend(len(r.prompt_tokens) for _, r in batch)
        return orig_batched(self, batch)

    def spy_start(self, entries):
        lane_lens.extend(len(p) for _, _, p in entries)
        return orig_start(self, entries)

    monkeypatch.setattr(be.BatchEngine, "_admit_batched", spy_batched)
    monkeypatch.setattr(be.BatchEngine, "_start_prefill", spy_start)
    eng = be.BatchEngine(cfg, params, n_slots=4, n_ctx=64)
    eng.prefill_chunk = 8  # the two 25+-token prompts are "long"
    reqs = [eng.submit(be.Request(p, n_predict=4, sampling=GREEDY))
            for p in prompts]  # one burst, before start
    eng.start()
    try:
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    assert outs == want, (want, outs)
    assert sorted(batched_lens) == sorted(len(p) for p in short_prompts)
    assert sorted(lane_lens) == sorted(len(p) for p in long_prompts)
