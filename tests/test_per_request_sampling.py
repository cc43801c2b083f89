"""Per-request device sampling (SamplingVec): every slot of a batched
device tick honors its own request's sampler knobs with exact host-chain
semantics — gated by greedy-row token parity against the host Sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.device_sample import (
    make_recent,
    make_sampling_vec,
    sample_logits_vec,
)
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import Sampler, SamplingParams


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("prs") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    return cfg, load_transformer(gf, cfg)


def test_sample_logits_vec_greedy_rows_match_host():
    """Greedy rows (temp<=0) of a mixed batch reproduce the host chain's
    penalized argmax exactly, each with its own penalties/window."""
    rng = np.random.default_rng(0)
    v = 96
    rows_params = [
        SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.4,
                       repeat_last_n=4, frequency_penalty=0.2,
                       presence_penalty=0.1),
        SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                       repeat_last_n=0),
        SamplingParams(temp=0.9, top_k=20, top_p=0.9),  # sampled row
    ]
    histories = [rng.integers(0, v, 12).tolist() for _ in rows_params]
    logits = rng.normal(0, 2.5, (3, v)).astype(np.float32)

    sv = make_sampling_vec([p for p in rows_params])
    rec = make_recent(histories, 16, v)
    got = np.asarray(sample_logits_vec(
        jnp.asarray(logits), jax.random.key(0), sv, rec))

    for i in (0, 1):  # deterministic rows
        want = Sampler(rows_params[i], v, seed=1).sample(
            logits[i], histories[i])
        assert int(got[i]) == want, (i, got[i], want)
    assert 0 <= int(got[2]) < v


def _host_generate(cfg, params, prompt, sp, n):
    ctx = Context(cfg, params)
    return list(generate(ctx, prompt, GenerateParams(
        n_predict=n, sampling=sp, ignore_eos=True), eos_token=-1))


@pytest.mark.parametrize("engine_kw", [
    dict(chunk=3),
    dict(spec_draft=3, chunk=2),
])
def test_engine_per_request_sampling_greedy_parity(model, engine_kw):
    """Two concurrent requests with DIFFERENT greedy sampler settings each
    match their own host chain, decoded in the same device ticks."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = model
    sp_pen = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.4,
                            repeat_last_n=6, frequency_penalty=0.15,
                            presence_penalty=0.1)
    sp_plain = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                              repeat_last_n=0)
    p1, p2 = [3, 5, 7, 11], [13, 17, 19]
    want1 = _host_generate(cfg, params, p1, sp_pen, 8)
    want2 = _host_generate(cfg, params, p2, sp_plain, 8)

    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64,
                      per_request_sampling=True,
                      device_sampling=DeviceSampling(temp=-1.0),
                      **engine_kw)
    eng.start()
    try:
        r1 = eng.submit(Request(p1, n_predict=8, sampling=sp_pen))
        r2 = eng.submit(Request(p2, n_predict=8, sampling=sp_plain))
        out1, out2 = list(r1.tokens()), list(r2.tokens())
    finally:
        eng.stop()

    def cut(ref):
        return ref[:ref.index(2)] if 2 in ref else ref

    assert out1 == cut(want1), (want1, out1)
    assert out2 == cut(want2), (want2, out2)


def test_seeded_request_reproducible_across_batch_compositions(model):
    """A seeded sampled request emits the SAME tokens whether it runs
    alone or alongside different co-tenants (the stream folds (seed,
    absolute position), not the shared engine key)."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = model
    sp = SamplingParams(temp=0.9, top_k=40, top_p=0.95,
                        repeat_penalty=1.1, repeat_last_n=16)
    prompt = [3, 5, 7, 11]

    def run(extra_prompts):
        eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, chunk=3,
                          per_request_sampling=True,
                          device_sampling=DeviceSampling(temp=0.9))
        eng.start()
        try:
            r = eng.submit(Request(prompt, n_predict=10, sampling=sp,
                                   seed=1234))
            others = [eng.submit(Request(p, n_predict=10,
                                         sampling=SamplingParams(temp=0.7),
                                         seed=9))
                      for p in extra_prompts]
            out = list(r.tokens())
            for o in others:
                list(o.tokens())
        finally:
            eng.stop()
        return out

    alone = run([])
    with_one = run([[13, 17]])
    with_other = run([[19, 23, 29]])
    assert alone == with_one == with_other, (alone, with_one, with_other)
    assert len(alone) > 0


def test_seeded_request_identical_plain_vs_speculative(model):
    """Seeded sampling keys on (seed, position), so a request's sampled
    stream is IDENTICAL through chunked and speculative engines (the
    verify sample for position P uses position P's key)."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = model
    sp = SamplingParams(temp=0.9, top_k=40, repeat_penalty=1.1,
                        repeat_last_n=16)
    prompt = [3, 5, 7, 3, 5]

    def run(**kw):
        eng = BatchEngine(cfg, params, n_slots=1, n_ctx=64,
                          per_request_sampling=True,
                          device_sampling=DeviceSampling(temp=0.9), **kw)
        eng.start()
        try:
            r = eng.submit(Request(prompt, n_predict=10, sampling=sp,
                                   seed=77))
            return list(r.tokens())
        finally:
            eng.stop()

    chunked = run(chunk=3)
    spec = run(spec_draft=3, chunk=2)
    assert chunked == spec, (chunked, spec)
    assert len(chunked) > 0


def test_sample_logits_vec_per_row_logit_bias():
    """Per-row logit bias lands before penalties with host semantics:
    +big forces a token, -inf bans one, rows without bias untouched."""
    rng = np.random.default_rng(3)
    v = 96
    logits = rng.normal(0, 2.0, (3, v)).astype(np.float32)
    argmax1 = int(np.argmax(logits[1]))
    rows = [
        SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                       repeat_last_n=0, logit_bias={7: 100.0}),
        SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                       repeat_last_n=0, logit_bias={argmax1: float("-inf")}),
        SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                       repeat_last_n=0),
    ]
    histories = [[], [], []]
    sv = make_sampling_vec(rows)
    assert sv.bias_ids is not None and sv.bias_ids.shape[1] == 1
    rec = make_recent(histories, 16, v)
    got = np.asarray(sample_logits_vec(
        jnp.asarray(logits), jax.random.key(0), sv, rec))
    for i in range(3):
        want = Sampler(rows[i], v, seed=1).sample(logits[i], histories[i])
        assert int(got[i]) == want, (i, got[i], want)
    assert int(got[0]) == 7 and int(got[1]) != argmax1


def test_sample_logits_vec_per_row_mirostat():
    """Mixed batch: a mirostat-v2 row truncates by its own mu (low mu ->
    argmax, mu update formula), a v1 row picks the dominant token like the
    host chain, and plain rows are bit-identical to a mirostat-free batch."""
    rng = np.random.default_rng(4)
    v = 256
    logits = rng.normal(0, 0.1, (3, v)).astype(np.float32)
    logits[1, 7] = 25.0  # dominant token for the v1 row
    rows = [
        SamplingParams(temp=1.0, mirostat=2, mirostat_tau=5.0,
                       mirostat_eta=0.1),
        SamplingParams(temp=1.0, mirostat=1, mirostat_tau=5.0,
                       mirostat_eta=0.1),
        SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                       repeat_last_n=0),
    ]
    sv = make_sampling_vec(rows)
    assert sv.mirostat is not None
    rec = make_recent([[], [], []], 16, v)
    mu = jnp.asarray([0.01, 10.0, 10.0], jnp.float32)
    tok, mu2 = sample_logits_vec(jnp.asarray(logits), jax.random.key(0),
                                 sv, rec, mu=mu)
    tok, mu2 = np.asarray(tok), np.asarray(mu2)
    # v2 row, mu ~ 0: only the argmax survives; observed surprise = 0 bits
    assert int(tok[0]) == int(np.argmax(logits[0]))
    np.testing.assert_allclose(mu2[0], 0.01 - 0.1 * (0.0 - 5.0), rtol=1e-5)
    # v1 row: dominant token; host-chain mu update
    from llama_cpp_q_4_0_tpu.runtime.sampling import (
        Candidates, sample_temperature, sample_token_mirostat)
    c = Candidates.from_logits(logits[1])
    sample_temperature(c, 1.0)
    tok_h, mu_h = sample_token_mirostat(
        c, np.random.default_rng(1), 5.0, 0.1, 100, 10.0, v)
    assert int(tok[1]) == tok_h == 7
    np.testing.assert_allclose(mu2[1], mu_h, rtol=1e-3)
    # plain greedy row: unaffected by the mirostat rows, mu untouched
    assert int(tok[2]) == int(np.argmax(logits[2]))
    assert mu2[2] == 10.0


def test_engine_per_request_logit_bias(model):
    """A banned-token request and a plain request share device ticks; the
    ban holds for the whole stream and the plain row matches its host
    chain exactly."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = model
    p1, p2 = [3, 5, 7, 11], [13, 17, 19]
    sp_plain = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                              repeat_last_n=0)
    want_plain = _host_generate(cfg, params, p1, sp_plain, 8)
    # ban the plain chain's most frequent token for the biased request
    ban = max(set(want_plain), key=want_plain.count)
    sp_ban = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                            repeat_last_n=0,
                            logit_bias={ban: float("-inf"), 2: float("-inf")})
    want_ban = _host_generate(cfg, params, p1, sp_ban, 8)

    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, chunk=3,
                      per_request_sampling=True,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        r1 = eng.submit(Request(p1, n_predict=8, sampling=sp_ban))
        r2 = eng.submit(Request(p1, n_predict=8, sampling=sp_plain))
        out1, out2 = list(r1.tokens()), list(r2.tokens())
    finally:
        eng.stop()

    def cut(ref):
        return ref[:ref.index(2)] if 2 in ref else ref

    assert ban not in out1
    assert out1 == want_ban, (want_ban, out1)  # -inf EOS bias: no cut
    assert out2 == cut(want_plain), (want_plain, out2)


def test_engine_per_request_mirostat_routes_to_chunked(model):
    """A mirostat request in a SPECULATIVE engine rides chunked device
    ticks (no host downgrade), produces tokens, and a concurrent greedy
    request still matches its host chain."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = model
    sp_miro = SamplingParams(temp=0.9, mirostat=2, mirostat_tau=4.0,
                             mirostat_eta=0.2)
    sp_plain = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                              repeat_last_n=0)
    p1, p2 = [3, 5, 7, 11], [13, 17, 19]
    want2 = _host_generate(cfg, params, p2, sp_plain, 8)

    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, chunk=3,
                      spec_draft=3, per_request_sampling=True,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        r1 = eng.submit(Request(p1, n_predict=8, sampling=sp_miro))
        r2 = eng.submit(Request(p2, n_predict=8, sampling=sp_plain))
        out1, out2 = list(r1.tokens()), list(r2.tokens())
        assert eng.stats()["mode"] == "chunked"  # spec suppressed
    finally:
        eng.stop()

    def cut(ref):
        return ref[:ref.index(2)] if 2 in ref else ref

    assert len(out1) > 0 and all(0 <= t < cfg.n_vocab for t in out1)
    assert out2 == cut(want2), (want2, out2)


def test_rwkv_engine_rejects_mirostat(tmp_path):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_rwkv)
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    from llama_cpp_q_4_0_tpu.runtime.rwkv_engine import RwkvBatchEngine

    path = str(tmp_path / "r.bin")
    make_rwkv_ggjt(path, n_vocab=128, n_embd=32, n_layer=1)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf, n_ctx=64)
    eng = RwkvBatchEngine(cfg, load_rwkv(gf, cfg), n_slots=2,
                          per_request_sampling=True,
                          device_sampling=DeviceSampling(temp=-1.0))
    with pytest.raises(ValueError, match="mirostat"):
        eng.submit(Request([1, 2, 3], n_predict=4,
                           sampling=SamplingParams(temp=0.9, mirostat=1)))


def test_spec_engine_per_request_logit_bias(model):
    """Per-request logit bias is stateless, so it works inside speculative
    verify ticks too: a banned token never appears and the greedy stream
    matches the host chain with the same bias."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = model
    p = [3, 5, 7, 11]
    sp_plain = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                              repeat_last_n=0)
    want_plain = _host_generate(cfg, params, p, sp_plain, 8)
    ban = max(set(want_plain), key=want_plain.count)
    sp_ban = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                            repeat_last_n=0,
                            logit_bias={ban: float("-inf"), 2: float("-inf")})
    want_ban = _host_generate(cfg, params, p, sp_ban, 8)

    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, spec_draft=3,
                      chunk=2, per_request_sampling=True,
                      device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        r = eng.submit(Request(p, n_predict=8, sampling=sp_ban))
        out = list(r.tokens())
    finally:
        eng.stop()
    assert ban not in out
    assert out == want_ban, (want_ban, out)
