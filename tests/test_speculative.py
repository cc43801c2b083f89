"""Speculative decoding: prompt-lookup drafting, draft-model drafting,
greedy equivalence with the plain decode loop, and rollback correctness.

Beyond-reference capability (the reference decodes one token per eval,
main.cpp:414-431); exactness is the gate — speculative greedy output must
be token-for-token identical to non-speculative greedy output."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
from llama_cpp_q_4_0_tpu.runtime.speculative import (
    DraftModelDrafter,
    PromptLookupDrafter,
    SpecParams,
    SpecStats,
    generate_speculative,
)

GREEDY = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                        repeat_last_n=0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spec") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=128)
    return cfg, load_transformer(gf, cfg)


def _greedy_reference(cfg, params, prompt, n):
    ctx = Context(cfg, params)
    return list(generate(ctx, prompt, GenerateParams(
        n_predict=n, sampling=GREEDY, ignore_eos=True), eos_token=-1))


# ----------------------------------------------------------- drafters


def test_prompt_lookup_finds_ngram_continuation():
    d = PromptLookupDrafter(SpecParams(max_ngram=3))
    #                 0  1  2  3  4  5  6  7
    hist = [10, 11, 12, 13, 14, 10, 11, 12]
    # suffix [10,11,12] occurred at 0..2; continuation = [13, 14, 10, ...]
    assert d.draft(hist, 3) == [13, 14, 10]


def test_prompt_lookup_prefers_most_recent_occurrence():
    d = PromptLookupDrafter(SpecParams(max_ngram=2))
    hist = [5, 6, 7, 5, 6, 8, 9, 5, 6]
    # [5,6] occurs at 0 (→7) and 3 (→8); most recent earlier wins → 8
    assert d.draft(hist, 2) == [8, 9]


def test_prompt_lookup_no_match_returns_empty():
    d = PromptLookupDrafter()
    assert d.draft([1, 2, 3, 4], 4) == []
    assert d.draft([7], 4) == []


# ------------------------------------------------- greedy equivalence


def test_speculative_greedy_matches_plain_greedy(model):
    cfg, params = model
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, 12).tolist()
    want = _greedy_reference(cfg, params, prompt, 24)

    ctx = Context(cfg, params)
    stats = SpecStats()
    got = generate_speculative(
        ctx, prompt, 24, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=7), ignore_eos=True, stats=stats)
    assert got == want
    assert stats.n_verify >= 1 and stats.n_tokens == len(got)


def test_speculative_with_draft_model_matches_greedy(model):
    cfg, params = model
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 250, 9).tolist()
    want = _greedy_reference(cfg, params, prompt, 20)

    # self-draft: the same model drafts — acceptance must be ~total and the
    # output exactly greedy
    drafter = DraftModelDrafter(Context(cfg, params))
    ctx2 = Context(cfg, params)
    stats = SpecStats()
    got = generate_speculative(
        ctx2, prompt, 20, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), drafter=drafter, ignore_eos=True,
        stats=stats)
    assert got == want
    # a perfect drafter: every proposed draft token accepted
    assert stats.n_accepted == stats.n_drafted > 0


def test_speculative_penalized_greedy_matches_plain(model):
    """repeat_penalty=1.1 (the CLI default) through the host speculative
    path must still be token-for-token identical to the plain decode loop
    — the verify step applies penalties per position over the same
    sequential recent-token window the plain loop sees."""
    cfg, params = model
    rng = np.random.default_rng(17)
    prompt = rng.integers(3, 250, 12).tolist()
    sp = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.1,
                        repeat_last_n=64, frequency_penalty=0.05)
    ctx = Context(cfg, params)
    want = list(generate(ctx, prompt, GenerateParams(
        n_predict=24, sampling=sp, ignore_eos=True), eos_token=-1))

    ds = DeviceSampling(temp=-1.0, repeat_penalty=1.1, repeat_last_n=64,
                        frequency_penalty=0.05)
    got = generate_speculative(
        Context(cfg, params), prompt, 24, sampling=ds,
        spec=SpecParams(n_draft=7), ignore_eos=True)
    assert got == want

    # draft-model path under penalties: drafts come from an UNPENALIZED
    # greedy draft loop, so acceptance is partial — exactness must hold
    drafter = DraftModelDrafter(Context(cfg, params))
    got2 = generate_speculative(
        Context(cfg, params), prompt, 24, sampling=ds,
        spec=SpecParams(n_draft=4), drafter=drafter, ignore_eos=True)
    assert got2 == want


def test_speculative_near_context_end_stops_cleanly(model):
    cfg, params = model
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, 250, 100).tolist()  # n_ctx=128, little room
    ctx = Context(cfg, params)
    got = generate_speculative(
        ctx, prompt, 64, sampling=DeviceSampling(temp=-1.0),
        ignore_eos=True)
    assert 0 < len(got) <= 64
    assert ctx.n_past <= ctx.n_ctx
    want = _greedy_reference(cfg, params, prompt, len(got))
    assert got == want


def test_speculative_sampled_runs_and_respects_n_predict(model):
    cfg, params = model
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, 250, 8).tolist()
    ctx = Context(cfg, params)
    got = generate_speculative(
        ctx, prompt, 16, sampling=DeviceSampling(temp=0.9, top_k=40),
        seed=1, ignore_eos=True)
    assert len(got) == 16
    assert all(0 <= t < cfg.n_vocab for t in got)


def test_speculative_respects_eos(model):
    cfg, params = model
    rng = np.random.default_rng(13)
    prompt = rng.integers(3, 250, 8).tolist()
    # pick the greedy continuation's 3rd token as "eos" so it trips mid-run
    want = _greedy_reference(cfg, params, prompt, 8)
    eos = want[3]
    ctx = Context(cfg, params)
    got = generate_speculative(
        ctx, prompt, 8, sampling=DeviceSampling(temp=-1.0), eos_token=eos)
    first_eos = want.index(eos)
    assert got == want[:first_eos]


def test_prompt_lookup_extrapolates_periodic_tail():
    d = PromptLookupDrafter(SpecParams(max_ngram=3))
    hist = [1, 2, 8, 9, 8, 9, 8]
    # suffix [8,9,8] matches at idx 2; cont = h[5:9] = [9,8] (hits the
    # tail), extrapolated periodically to length 4
    assert d.draft(hist, 4) == [9, 8, 9, 8]
