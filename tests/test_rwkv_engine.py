"""RWKV continuous-batching engine: multi-request greedy output must match
per-request plain decoding exactly, across staggered admissions, queueing
beyond slot capacity, cancellation, and the HTTP server surface."""

import http.client
import json
import threading

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv
from llama_cpp_q_4_0_tpu.quant.types import GGMLType
from llama_cpp_q_4_0_tpu.runtime.batch_engine import Request
from llama_cpp_q_4_0_tpu.runtime.context import RwkvContext
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.rwkv_engine import RwkvBatchEngine
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

GREEDY = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                        repeat_last_n=0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rweng") / "m.ggjt")
    make_rwkv_ggjt(path, qtype=GGMLType.F32, n_vocab=256, n_embd=64,
                   n_layer=3)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf)
    return cfg, load_rwkv(gf, cfg)


def _plain(cfg, params, prompt, n):
    return list(generate(RwkvContext(cfg, params), prompt, GenerateParams(
        n_predict=n, sampling=GREEDY, ignore_eos=False)))


def test_engine_greedy_parity_with_queueing(model):
    """3 ragged requests through 2 slots (the third queues) must each match
    their plain single-stream decode token-for-token."""
    cfg, params = model
    prompts = [
        [7, 9, 23, 7, 9, 23, 7, 9],
        [5, 8, 5, 8, 5],
        list(np.random.default_rng(0).integers(3, 250, 13)),
    ]
    want = [_plain(cfg, params, p, 10) for p in prompts]

    eng = RwkvBatchEngine(cfg, params, n_slots=2, n_ctx=128, chunk=2,
                          spec_draft=3)
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, n_predict=10,
                                   sampling=GREEDY)) for p in prompts]
        got = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    assert got == want
    st = eng.stats()
    assert st["n_requests_done"] == 3 and st["n_tokens_out"] >= 3


def test_engine_staggered_admission_parity(model):
    """A request admitted mid-flight (while another decodes) must not
    perturb either stream."""
    cfg, params = model
    p1 = [7, 9, 23, 7, 9, 23, 7, 9]
    p2 = [11, 4, 11, 4, 11, 4]
    want1 = _plain(cfg, params, p1, 12)
    want2 = _plain(cfg, params, p2, 8)

    eng = RwkvBatchEngine(cfg, params, n_slots=4, n_ctx=128, chunk=1,
                          spec_draft=3)
    eng.start()
    try:
        r1 = eng.submit(Request(prompt_tokens=p1, n_predict=12,
                                sampling=GREEDY))
        got1_first = next(iter(r1.tokens()))  # wait until r1 is decoding
        r2 = eng.submit(Request(prompt_tokens=p2, n_predict=8,
                                sampling=GREEDY))
        got1 = [got1_first] + list(r1.tokens())
        got2 = list(r2.tokens())
    finally:
        eng.stop()
    assert got1 == want1
    assert got2 == want2


def test_engine_cancellation(model):
    cfg, params = model
    eng = RwkvBatchEngine(cfg, params, n_slots=1, n_ctx=128)
    eng.start()
    try:
        r = eng.submit(Request(prompt_tokens=[3, 5, 7, 9], n_predict=10_000,
                               sampling=GREEDY))
        it = r.tokens()
        next(it)  # running
        r.cancel()
        out = list(it)  # must terminate
        assert len(out) < 10_000
    finally:
        eng.stop()


def test_server_parallel_rwkv_endpoint(model, tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from llama_cpp_q_4_0_tpu.cli.common import load_model
    from llama_cpp_q_4_0_tpu.cli.server import ServerState, make_handler

    path = str(tmp_path_factory.mktemp("rwsrv") / "m.ggjt")
    make_rwkv_ggjt(path, n_vocab=256, n_embd=64, n_layer=2)

    class A:
        model, arch, n_ctx, n_batch = path, None, 128, 64
        lora = lora_base = None
        memory_f32 = False

    lm = load_model(A())
    eng = RwkvBatchEngine(lm.cfg, lm.ctx.params, n_slots=2, n_ctx=128)
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


def test_rwkv_engine_per_request_logit_bias(model):
    """Per-request logit bias inside RWKV speculative verify ticks: the
    banned token never appears (bias is stateless, so spec-safe)."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    cfg, params = model
    eng = RwkvBatchEngine(cfg, params, n_slots=2, n_ctx=128, chunk=2,
                          spec_draft=3, per_request_sampling=True,
                          device_sampling=DeviceSampling(temp=-1.0))
    sp_plain = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                              repeat_last_n=0)
    eng.start()
    try:
        r0 = eng.submit(Request([5, 9, 23, 5, 9], n_predict=8,
                                sampling=sp_plain))
        plain = list(r0.tokens())
        if not plain:
            pytest.skip("model emits EOS immediately")
        ban = max(set(plain), key=plain.count)
        sp_ban = SamplingParams(
            temp=-1.0, top_k=0, repeat_penalty=1.0, repeat_last_n=0,
            logit_bias={ban: float("-inf"), 0: float("-inf")})
        r1 = eng.submit(Request([5, 9, 23, 5, 9], n_predict=8,
                                sampling=sp_ban))
        banned = list(r1.tokens())
    finally:
        eng.stop()
    assert ban not in banned and len(banned) > 0
