"""Sampling-distribution goldens ported from tests/test-sampling.cpp."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.runtime import sampling as S


def cands(probs):
    return S.Candidates.from_logits(np.log(np.asarray(probs, dtype=np.float32)))


def check(c, expected, tol):
    assert c.size == len(expected)
    np.testing.assert_allclose(c.p[: len(expected)], expected, atol=tol)


@pytest.mark.parametrize(
    "probs,expected,k",
    [
        ([0.1, 0.2, 0.3, 0.4], [0.4], 1),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2], 3),
    ],
)
def test_top_k(probs, expected, k):
    c = cands(probs)
    S.sample_softmax(c)
    S.sample_top_k(c, k, 1)
    check(c, expected, 1e-5)


@pytest.mark.parametrize(
    "probs,expected,p",
    [
        ([0.1, 0.2, 0.3, 0.4], [0.4], 0.0),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3], 0.7),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2], 0.8),
        ([0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2, 0.1], 1.0),
    ],
)
def test_top_p(probs, expected, p):
    c = cands(probs)
    S.sample_softmax(c)
    S.sample_top_p(c, p, 1)
    check(c, expected, 1e-3)


@pytest.mark.parametrize(
    "probs,expected,z",
    [
        ([0.1, 0.15, 0.2, 0.25, 0.3], [0.3], 0.25),
        ([0.1, 0.15, 0.2, 0.25, 0.3], [0.3, 0.25], 0.75),
        ([0.1, 0.15, 0.2, 0.25, 0.3], [0.3, 0.25], 0.99),
    ],
)
def test_tfs(probs, expected, z):
    c = cands(probs)
    S.sample_tail_free(c, z, 1)
    check(c, expected, 1e-3)


@pytest.mark.parametrize(
    "probs,expected,p",
    [
        ([0.97, 0.01, 0.01, 0.01], [0.97], 0.5),
        ([0.4, 0.2, 0.2, 0.2], [0.2, 0.2, 0.2], 0.5),
    ],
)
def test_typical(probs, expected, p):
    c = cands(probs)
    S.sample_typical(c, p, 1)
    check(c, expected, 1e-3)


@pytest.mark.parametrize(
    "probs,last,expected,penalty",
    [
        ([0.2] * 5, [0], [0.25, 0.25, 0.25, 0.25, 0], 50.0),
        ([0.2] * 5, [0, 1, 2], [0.5, 0.5, 0, 0, 0], 50.0),
        ([0.2] * 5, [0, 1, 2, 0, 0], [0.5, 0.5, 0, 0, 0], 50.0),
    ],
)
def test_repetition_penalty(probs, last, expected, penalty):
    c = cands(probs)
    S.sample_softmax(c)
    S.sample_repetition_penalty(c, last, penalty)
    S.sample_softmax(c)
    check(c, expected, 1e-6)  # expected is in sorted (descending p) order


@pytest.mark.parametrize(
    "probs,last,expected,af,ap",
    [
        ([0.2] * 5, [0], [0.249997, 0.249997, 0.249997, 0.249997, 0.000011], 5.0, 5.0),
        ([0.2] * 5, [0, 1, 2], [0.499966, 0.499966, 0.000023, 0.000023, 0.000023], 5.0, 5.0),
        ([0.2] * 5, [0, 1, 2, 0, 0], [0.499977, 0.499977, 0.000023, 0.000023, 0.0], 5.0, 5.0),
    ],
)
def test_frequency_presence_penalty(probs, last, expected, af, ap):
    c = cands(probs)
    S.sample_softmax(c)
    S.sample_frequency_and_presence_penalties(c, last, af, ap)
    S.sample_softmax(c)
    check(c, expected, 1e-3)  # expected is in sorted (descending p) order


def test_greedy_and_token():
    c = cands([0.1, 0.2, 0.3, 0.4])
    assert S.sample_token_greedy(c) == 3
    rng = np.random.default_rng(0)
    tok = S.sample_token(c, rng)
    assert 0 <= tok < 4


def test_mirostat_runs():
    rng = np.random.default_rng(0)
    c = cands(np.linspace(0.01, 0.3, 100))
    tok, mu = S.sample_token_mirostat(c, rng, 5.0, 0.1, 100, 10.0, 100)
    assert 0 <= tok < 100 and np.isfinite(mu)
    c = cands(np.linspace(0.01, 0.3, 100))
    tok, mu = S.sample_token_mirostat_v2(c, rng, 5.0, 0.1, 10.0)
    assert 0 <= tok < 100 and np.isfinite(mu)


def test_sampler_chain_greedy():
    p = S.SamplingParams(temp=0.0)
    s = S.Sampler(p, n_vocab=16, seed=0)
    logits = np.zeros(16, dtype=np.float32)
    logits[7] = 5.0
    assert s.sample(logits, last_tokens=[]) == 7


def test_device_top_p_mask_matches_host_support():
    """The device nucleus filter keeps exactly the host sample_top_p set
    (tokens whose exclusive prefix mass < p, crossing token included)."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.runtime.device_sample import _top_p_mask
    from llama_cpp_q_4_0_tpu.runtime.sampling import (
        Candidates, sample_softmax, sample_top_p,
    )

    rng = np.random.default_rng(0)
    for trial in range(10):
        logits = np.sort(rng.normal(0, 3, 32).astype(np.float32))[::-1].copy()
        p = float(rng.uniform(0.2, 0.99))
        c = Candidates.from_logits(logits)
        sample_softmax(c)  # sorts descending (already sorted)
        sample_top_p(c, p, 1)
        host_kept = set(c.ids.tolist())

        masked = np.asarray(_top_p_mask(jnp.asarray(logits), p))
        dev_kept = {i for i, v in enumerate(masked) if np.isfinite(v)}
        assert dev_kept == host_kept, (trial, p, dev_kept, host_kept)


def test_device_tfs_typical_support_matches_host():
    """Device top_k->tfs->typical->top_p filter chain keeps exactly the
    host chain's candidate set, across random logits and parameters."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        _tfs_mask, _top_p_mask, _typical_mask,
    )
    from llama_cpp_q_4_0_tpu.runtime.sampling import (
        Candidates, sample_tail_free, sample_top_k, sample_top_p,
        sample_typical,
    )

    rng = np.random.default_rng(7)
    for trial in range(25):
        v = 48
        logits = rng.normal(0, 2.5, v).astype(np.float32)
        top_k = int(rng.integers(8, v))
        tfs_z = float(rng.uniform(0.6, 0.999)) if trial % 2 else 1.0
        typ_p = float(rng.uniform(0.5, 0.999)) if trial % 3 else 1.0
        top_p = float(rng.uniform(0.5, 0.999))

        c = Candidates.from_logits(logits)
        sample_top_k(c, top_k, 1)
        sample_tail_free(c, tfs_z, 1)
        sample_typical(c, typ_p, 1)
        sample_top_p(c, top_p, 1)
        host_kept = set(c.ids.tolist())

        vals, idx = jax.lax.top_k(jnp.asarray(logits), top_k)
        if tfs_z < 1.0:
            vals = _tfs_mask(vals, tfs_z)
        if typ_p < 1.0:
            vals = _typical_mask(vals, typ_p)
        vals = _top_p_mask(vals, top_p)
        m = np.asarray(vals)
        dev_kept = {int(np.asarray(idx)[j]) for j in range(top_k)
                    if np.isfinite(m[j])}
        assert dev_kept == host_kept, (trial, top_k, tfs_z, typ_p, top_p,
                                       dev_kept ^ host_kept)


def test_device_mirostat2_semantics():
    """Low mu forces the argmax and mu tracks -eta*(surprise - tau);
    generous mu leaves the distribution untruncated."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, _mirostat2_sample,
    )

    ds = DeviceSampling(temp=1.0, mirostat=2, mirostat_tau=5.0,
                        mirostat_eta=0.1)
    logits = jnp.asarray([[4.0, 2.0, 1.0, -1.0]])
    key = jax.random.key(0)

    # mu below every non-top surprise -> argmax deterministic
    tok, mu2 = _mirostat2_sample(logits, key, ds, jnp.asarray([0.01]))
    assert int(tok[0]) == 0
    # truncated support = {0}: observed surprise = 0 bits
    np.testing.assert_allclose(np.asarray(mu2),
                               [0.01 - 0.1 * (0.0 - 5.0)], rtol=1e-5)

    # huge mu: nothing truncated; over many keys the empirical dist
    # matches softmax
    p = np.exp(np.asarray(logits[0])); p /= p.sum()
    counts = np.zeros(4)
    for i in range(400):
        tok, _ = _mirostat2_sample(logits, jax.random.key(i), ds,
                                   jnp.asarray([100.0]))
        counts[int(tok[0])] += 1
    assert np.abs(counts / 400 - p).max() < 0.07


def test_device_mirostat2_generation_runs(tmp_path):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.runtime.context import Context
    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, generate_ondevice,
    )

    path = str(tmp_path / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    ctx = Context(cfg, load_transformer(gf, cfg))
    out = generate_ondevice(
        ctx, [5, 9, 23], 16,
        sampling=DeviceSampling(temp=0.9, mirostat=2), chunk=4,
        eos_token=-1)
    assert len(out) == 16 and all(0 <= t < 256 for t in out)


def test_device_mirostat1_semantics():
    """Mirostat v1: on a near-deterministic distribution both chains pick
    the dominant token and agree on the mu update; generation runs."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, _mirostat1_sample,
    )
    from llama_cpp_q_4_0_tpu.runtime.sampling import (
        Candidates, sample_token_mirostat, sample_temperature,
    )

    rng = np.random.default_rng(0)
    v = 256
    logits = rng.normal(0, 0.1, v).astype(np.float32)
    logits[7] = 25.0  # dominant token: sampled w.p. ~1 by both chains
    tau, eta, mu0 = 5.0, 0.1, 10.0

    c = Candidates.from_logits(logits)
    sample_temperature(c, 1.0)
    tok_h, mu_h = sample_token_mirostat(
        c, np.random.default_rng(1), tau, eta, 100, mu0, v)

    ds = DeviceSampling(temp=1.0, mirostat=1, mirostat_tau=tau,
                        mirostat_eta=eta)
    tok_d, mu_d = _mirostat1_sample(jnp.asarray(logits)[None, :],
                                    jax.random.key(0), ds,
                                    jnp.asarray([mu0]))
    assert int(tok_d[0]) == tok_h == 7
    np.testing.assert_allclose(float(mu_d[0]), mu_h, rtol=1e-3)


def test_device_mirostat1_generation_runs(tmp_path):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.runtime.context import Context
    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, generate_ondevice,
    )

    path = str(tmp_path / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    ctx = Context(cfg, load_transformer(gf, cfg))
    out = generate_ondevice(
        ctx, [5, 9, 23], 12,
        sampling=DeviceSampling(temp=0.9, mirostat=1), chunk=4,
        eos_token=-1)
    assert len(out) == 12 and all(0 <= t < 256 for t in out)
