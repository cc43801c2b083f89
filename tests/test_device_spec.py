"""Device-resident speculative decoding: the on-device n-gram lookup must
match the host drafter exactly, and the full scan loop must reproduce plain
greedy decoding token-for-token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
from llama_cpp_q_4_0_tpu.runtime.device_spec import (
    _lookup_drafts,
    generate_ondevice_spec,
)
from llama_cpp_q_4_0_tpu.runtime.generate import GenerateParams, generate
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
from llama_cpp_q_4_0_tpu.runtime.speculative import (
    PromptLookupDrafter,
    SpecParams,
    SpecStats,
)

GREEDY = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                        repeat_last_n=0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dspec") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=128)
    return cfg, load_transformer(gf, cfg)


def test_device_lookup_matches_host_drafter():
    """Property: wherever the host drafter proposes, the device lookup
    proposes the identical tokens; where it proposes nothing, zeros."""
    rng = np.random.default_rng(0)
    sp = SpecParams(n_draft=6, max_ngram=3, min_ngram=1)
    host = PromptLookupDrafter(sp)
    H = 64
    fn = jax.jit(lambda b, m: _lookup_drafts(
        b, m, k=sp.n_draft, max_ngram=sp.max_ngram, min_ngram=sp.min_ngram))
    n_checked = 0
    for trial in range(40):
        m = int(rng.integers(2, H))
        # small alphabet → plenty of repeats to match on
        hist = rng.integers(0, 6, m).tolist()
        buf = np.zeros(H, np.int32)
        buf[:m] = hist
        got = np.asarray(fn(jnp.asarray(buf), jnp.int32(m))).tolist()
        want = host.draft(hist, sp.n_draft)
        if want:
            assert got == want, (trial, hist, got, want)
            n_checked += 1
        else:
            assert got == [0] * sp.n_draft
    assert n_checked >= 20  # the property actually got exercised


def test_ondevice_spec_greedy_matches_plain(model):
    cfg, params = model
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, 12).tolist()
    ref_ctx = Context(cfg, params)
    want = list(generate(ref_ctx, prompt, GenerateParams(
        n_predict=24, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    ctx = Context(cfg, params)
    stats = SpecStats()
    got = generate_ondevice_spec(
        ctx, prompt, 24, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=5), n_steps=3, ignore_eos=True, stats=stats)
    assert got == want
    assert stats.n_verify >= 1


def test_ondevice_spec_respects_eos(model):
    cfg, params = model
    rng = np.random.default_rng(13)
    prompt = rng.integers(3, 250, 8).tolist()
    ref_ctx = Context(cfg, params)
    want = list(generate(ref_ctx, prompt, GenerateParams(
        n_predict=10, sampling=GREEDY, ignore_eos=True), eos_token=-1))
    eos = want[4]
    ctx = Context(cfg, params)
    got = generate_ondevice_spec(
        ctx, prompt, 10, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), n_steps=3, eos_token=eos)
    assert got == want[:want.index(eos)]


def test_ondevice_spec_near_context_end(model):
    cfg, params = model
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, 250, 100).tolist()  # n_ctx=128
    ctx = Context(cfg, params)
    got = generate_ondevice_spec(
        ctx, prompt, 64, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), n_steps=2, ignore_eos=True)
    assert 0 < len(got) <= 64
    assert ctx.n_past <= ctx.n_ctx
    ref_ctx = Context(cfg, params)
    want = list(generate(ref_ctx, prompt, GenerateParams(
        n_predict=len(got), sampling=GREEDY, ignore_eos=True),
        eos_token=-1))
    assert got == want


def test_ondevice_draft_model_self_matches_plain(model):
    """Device-resident draft-model speculation, self-draft: 100%
    acceptance and exact greedy output."""
    from llama_cpp_q_4_0_tpu.runtime.device_spec import (
        generate_ondevice_spec_draft,
    )

    cfg, params = model
    rng = np.random.default_rng(21)
    prompt = rng.integers(3, 250, 10).tolist()
    ref_ctx = Context(cfg, params)
    want = list(generate(ref_ctx, prompt, GenerateParams(
        n_predict=20, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    ctx = Context(cfg, params)
    dctx = Context(cfg, params)
    stats = SpecStats()
    got = generate_ondevice_spec_draft(
        ctx, dctx, prompt, 20, sampling=DeviceSampling(temp=-1.0),
        n_draft=4, n_steps=3, ignore_eos=True, stats=stats)
    assert got == want
    assert stats.n_accepted == stats.n_drafted > 0


def test_ondevice_draft_model_weak_draft_still_exact(model, tmp_path):
    """A DIFFERENT (weak) draft model: low acceptance, but verification
    keeps the output exactly greedy."""
    from llama_cpp_q_4_0_tpu.runtime.device_spec import (
        generate_ondevice_spec_draft,
    )

    cfg, params = model
    # different random weights, same vocab
    path = str(tmp_path / "weak.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=32, n_head=2, n_layer=1,
                    seed=99)
    gfw = read_ggjt(path, "llama")
    cfgw = config_from_ggjt(gfw, n_ctx=128)
    paramsw = load_transformer(gfw, cfgw)

    rng = np.random.default_rng(23)
    prompt = rng.integers(3, 250, 10).tolist()
    ref_ctx = Context(cfg, params)
    want = list(generate(ref_ctx, prompt, GenerateParams(
        n_predict=16, sampling=GREEDY, ignore_eos=True), eos_token=-1))

    ctx = Context(cfg, params)
    dctx = Context(cfgw, paramsw)
    stats = SpecStats()
    got = generate_ondevice_spec_draft(
        ctx, dctx, prompt, 16, sampling=DeviceSampling(temp=-1.0),
        n_draft=3, n_steps=2, ignore_eos=True, stats=stats)
    assert got == want
    assert stats.acceptance < 1.0


def test_ondevice_spec_with_gspmd_sharded_params(model):
    """Distributed speculative decoding: the whole draft-verify scan
    partitions under GSPMD with tp-sharded weights (XLA inserts the
    collectives) and stays token-for-token exact vs unsharded greedy."""
    from llama_cpp_q_4_0_tpu.parallel import make_mesh, shard_transformer
    from llama_cpp_q_4_0_tpu.runtime.speculative import SpecStats

    cfg, params = model
    rng = np.random.default_rng(31)
    prompt = rng.integers(3, 250, 12).tolist()
    ctx_ref = Context(cfg, params)
    want = generate_ondevice_spec(
        ctx_ref, prompt, 20, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), n_steps=3, ignore_eos=True)

    mesh = make_mesh(dp=1, sp=1, tp=4)
    with mesh:
        sp_params = shard_transformer(params, mesh)
        ctx = Context(cfg, sp_params)
        stats = SpecStats()
        got = generate_ondevice_spec(
            ctx, prompt, 20, sampling=DeviceSampling(temp=-1.0),
            spec=SpecParams(n_draft=4), n_steps=3, ignore_eos=True,
            stats=stats)
    assert got == want
    assert stats.n_verify >= 1


def test_batch_engine_with_gspmd_sharded_params(model):
    """The continuous-batching engine serves from tp-sharded weights
    (NamedShardings carry the mesh; the engine thread needs no mesh
    context) with exact greedy parity."""
    from llama_cpp_q_4_0_tpu.parallel import make_mesh, shard_transformer
    from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request

    cfg, params = model
    prompts = [[3, 5, 7, 3, 5], [11, 13]]

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

    refs = [single(p) for p in prompts]
    mesh = make_mesh(dp=1, sp=1, tp=4)
    sp_params = shard_transformer(params, mesh)
    eng = BatchEngine(cfg, sp_params, n_slots=2, n_ctx=64, spec_draft=3,
                      chunk=2, device_sampling=DeviceSampling(temp=-1.0))
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=8, sampling=SamplingParams(
            temp=-1.0, top_k=0, repeat_penalty=1.0, repeat_last_n=0)))
                for p in prompts]
        outs = [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()
    for ref, out in zip(refs, outs):
        assert out == ref, (ref, out)


def test_ondevice_spec_context_swap(model):
    """n_keep enables the infinite-text swap: generation continues past
    the context boundary instead of stopping."""
    cfg, params = model  # n_ctx = 128
    rng = np.random.default_rng(41)
    prompt = rng.integers(3, 250, 100).tolist()
    ctx = Context(cfg, params)
    got = generate_ondevice_spec(
        ctx, prompt, 120, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), n_steps=2, ignore_eos=True, n_keep=4)
    assert len(got) == 120  # well past the 128-token window
    assert all(0 <= t < cfg.n_vocab for t in got)
    # without swap it stops early
    ctx2 = Context(cfg, params)
    stopped = generate_ondevice_spec(
        ctx2, prompt, 120, sampling=DeviceSampling(temp=-1.0),
        spec=SpecParams(n_draft=4), n_steps=2, ignore_eos=True)
    assert len(stopped) < 120
    # pre-swap prefixes agree
    assert got[: len(stopped) - 8][:8] == stopped[:8]
