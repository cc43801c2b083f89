"""On-device repetition/frequency/presence penalties: greedy+penalties is
deterministic, so every device loop must match the host Sampler chain
token-for-token (llama.cpp:1804-1860 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.device_sample import (
    DeviceSampling,
    _apply_penalties,
    generate_ondevice,
    make_recent,
)
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

PEN = dict(repeat_penalty=1.3, repeat_last_n=8, frequency_penalty=0.1,
           presence_penalty=0.2)
HOST = SamplingParams(temp=-1.0, top_k=0, **PEN)
DEV = DeviceSampling(temp=-1.0, **PEN)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pen") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=128)
    return cfg, load_transformer(gf, cfg)


def _host(cfg, params, prompt, n):
    ctx = Context(cfg, params)
    return list(generate(ctx, prompt, GenerateParams(
        n_predict=n, sampling=HOST, ignore_eos=True), eos_token=-1))


def test_apply_penalties_matches_host_chain():
    from llama_cpp_q_4_0_tpu.runtime.sampling import (
        Candidates,
        sample_frequency_and_presence_penalties,
        sample_repetition_penalty,
    )

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, 64).astype(np.float32)
    last = [3, 5, 5, 9, 60]
    c = Candidates.from_logits(logits)
    sample_repetition_penalty(c, last, PEN["repeat_penalty"])
    sample_frequency_and_presence_penalties(
        c, last, PEN["frequency_penalty"], PEN["presence_penalty"])
    want = np.zeros(64, np.float32)
    want[c.ids] = c.logits

    rec = make_recent([last], 8, 64)
    got = np.asarray(_apply_penalties(jnp.asarray(logits)[None, :], rec,
                                      DEV))[0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_ondevice_chunked_penalized_matches_host(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 250, 10).tolist()
    want = _host(cfg, params, prompt, 24)
    ctx = Context(cfg, params)
    got = generate_ondevice(ctx, prompt, 24, sampling=DEV, chunk=6,
                            eos_token=-1)
    assert got == want[:len(got)] and len(got) >= 20


def test_ondevice_spec_penalized_matches_host(model):
    from llama_cpp_q_4_0_tpu.runtime.device_spec import generate_ondevice_spec
    from llama_cpp_q_4_0_tpu.runtime.speculative import SpecParams

    cfg, params = model
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 250, 10).tolist()
    want = _host(cfg, params, prompt, 20)
    ctx = Context(cfg, params)
    got = generate_ondevice_spec(
        ctx, prompt, 20, sampling=DEV, spec=SpecParams(n_draft=4),
        n_steps=3, ignore_eos=True)
    assert got == want


def test_ondevice_draft_spec_penalized_matches_host(model):
    from llama_cpp_q_4_0_tpu.runtime.device_spec import (
        generate_ondevice_spec_draft,
    )

    cfg, params = model
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, 10).tolist()
    want = _host(cfg, params, prompt, 16)
    ctx = Context(cfg, params)
    dctx = Context(cfg, params)
    got = generate_ondevice_spec_draft(
        ctx, dctx, prompt, 16, sampling=DEV, n_draft=3, n_steps=2,
        ignore_eos=True)
    assert got == want


def test_engine_chunked_penalized_matches_host(model):
    from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request

    cfg, params = model
    prompts = [[3, 5, 7, 11], [13, 17]]
    refs = [_host(cfg, params, p, 8) for p in prompts]
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=128, chunk=3,
                      device_sampling=DEV)
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=8, sampling=HOST))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out in zip(refs, outs):
        # engine stops (without emitting) at EOS token 2
        want = ref[:ref.index(2)] if 2 in ref else ref
        assert out == want, (ref, out)


def test_engine_spec_penalized_matches_host(model):
    from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request

    cfg, params = model
    prompts = [[3, 5, 7, 3, 5], [13, 17, 13]]
    refs = [_host(cfg, params, p, 8) for p in prompts]
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=128, spec_draft=3,
                      chunk=2, device_sampling=DEV)
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=8, sampling=HOST))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out in zip(refs, outs):
        want = ref[:ref.index(2)] if 2 in ref else ref
        assert out == want, (ref, out)


def test_device_logit_bias_bans_token(model):
    """A -inf bias on the greedy winner forces the runner-up, exactly
    like the host chain; applied in every device loop."""
    from llama_cpp_q_4_0_tpu.runtime.device_spec import generate_ondevice_spec
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
    from llama_cpp_q_4_0_tpu.runtime.speculative import SpecParams

    cfg, params = model
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, 250, 10).tolist()
    base = _host(cfg, params, prompt, 1)
    ban = base[0]

    host = SamplingParams(temp=-1.0, top_k=0, **PEN,
                          logit_bias={ban: float("-inf")})
    ctx = Context(cfg, params)
    want = list(generate(ctx, prompt, GenerateParams(
        n_predict=12, sampling=host, ignore_eos=True), eos_token=-1))
    assert want[0] != ban

    dev = DeviceSampling(temp=-1.0, **PEN,
                         logit_bias=((ban, float("-inf")),))
    ctx2 = Context(cfg, params)
    got = generate_ondevice(ctx2, prompt, 12, sampling=dev, chunk=4,
                            eos_token=-1)
    assert got == want[:len(got)] and len(got) >= 8
    assert ban not in got

    ctx3 = Context(cfg, params)
    got_spec = generate_ondevice_spec(
        ctx3, prompt, 12, sampling=dev, spec=SpecParams(n_draft=3),
        n_steps=2, ignore_eos=True)
    assert got_spec == want[:12]
    assert ban not in got_spec
