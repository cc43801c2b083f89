"""RWKV device-resident speculative decoding: the parallel-prefill verify
plus state-gather rollback must reproduce plain decoding token-for-token
(greedy), and leave the recurrent state exactly consistent with a
sequential replay of the emitted history."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv
from llama_cpp_q_4_0_tpu.quant.types import GGMLType
from llama_cpp_q_4_0_tpu.runtime.context import RwkvContext
from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
from llama_cpp_q_4_0_tpu.runtime.device_spec import generate_ondevice_spec_rwkv
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
from llama_cpp_q_4_0_tpu.runtime.speculative import SpecParams, SpecStats

GREEDY = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                        repeat_last_n=0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rspec") / "m.ggjt")
    make_rwkv_ggjt(path, qtype=GGMLType.F32, n_vocab=256, n_embd=64,
                   n_layer=4)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf)
    return cfg, load_rwkv(gf, cfg)


@pytest.mark.parametrize("prompt_kind", ["repetitive", "random"])
def test_rwkv_spec_greedy_matches_plain(model, prompt_kind):
    cfg, params = model
    if prompt_kind == "repetitive":
        prompt = [7, 9, 23, 7, 9, 23, 7, 9, 23, 7, 9, 23]
    else:
        prompt = np.random.default_rng(3).integers(3, 250, 12).tolist()
    want = list(generate(RwkvContext(cfg, params), prompt, GenerateParams(
        n_predict=24, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    ctx = RwkvContext(cfg, params)
    stats = SpecStats()
    got = generate_ondevice_spec_rwkv(
        ctx, prompt, 24, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=5), n_steps=3, ignore_eos=True, stats=stats)
    assert got == want
    assert stats.n_verify >= 1
    if prompt_kind == "repetitive":
        # the repeating pattern must actually amortize: >1 token/verify
        assert stats.tokens_per_step > 1.5


def test_rwkv_spec_penalized_matches_host_chain(model):
    """Greedy with repetition penalty: the device verify applies the same
    penalty window the host sampler chain does."""
    cfg, params = model
    prompt = [5, 8, 5, 8, 5, 8, 5, 8, 5, 8]
    sp = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.3,
                        repeat_last_n=16)
    want = list(generate(RwkvContext(cfg, params), prompt, GenerateParams(
        n_predict=20, sampling=sp, ignore_eos=True), eos_token=-1))

    got = generate_ondevice_spec_rwkv(
        RwkvContext(cfg, params), prompt, 20,
        sampling=DeviceSampling(temp=-1.0, repeat_penalty=1.3,
                                repeat_last_n=16),
        spec=SpecParams(n_draft=4), n_steps=2, ignore_eos=True)
    assert got == want


def test_rwkv_spec_state_matches_sequential_replay(model):
    """After a speculative run the carried recurrent state must equal a
    from-scratch replay of the consumed history — i.e. the accepted-prefix
    state gathers left no rolled-back draft contamination.

    Note ctx may have generated PAST the n_predict truncation point (same
    as the transformer path's ctx.n_past); the consumed-token count is
    ctx.n_past, so the replay target is the plain greedy chain up to it."""
    cfg, params = model
    prompt = [11, 4, 11, 4, 11, 4, 11, 4]
    chain = list(generate(RwkvContext(cfg, params), prompt, GenerateParams(
        n_predict=40, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    ctx = RwkvContext(cfg, params)
    out = generate_ondevice_spec_rwkv(
        ctx, prompt, 16, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=5), n_steps=2, ignore_eos=True)
    assert len(out) == 16
    assert out == chain[:16]

    g = ctx.n_past - len(prompt)  # generated tokens consumed into state
    assert g >= 15
    replay = RwkvContext(cfg, params)
    replay.eval(np.asarray([prompt + chain[:g]], np.int32))
    for k in ctx.state:
        np.testing.assert_allclose(
            np.asarray(ctx.state[k]), np.asarray(replay.state[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)
