"""RWKV v4 recurrent runtime tests + reference-binary parity."""

import dataclasses
import os
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/refbuild"
ORACLE = f"{BUILD}/ref_rwkv_logits"


def _build_model(tmp_path, qtype_name="F32", **kw):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType

    path = str(tmp_path / "rwkv.ggjt")
    make_rwkv_ggjt(path, qtype=GGMLType[qtype_name], **kw)
    return path


def _load(path, compute="float32"):
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv
    from llama_cpp_q_4_0_tpu.runtime.context import RwkvContext

    gf = read_ggjt(path, "rwkv")
    cfg = dataclasses.replace(config_from_ggjt(gf), compute_dtype=compute)
    params = load_rwkv(gf, cfg)
    return cfg, RwkvContext(cfg, params)


def test_scan_equals_stepwise(tmp_path):
    """Prefill-by-scan must equal token-by-token stepping (state carry)."""
    path = _build_model(tmp_path)
    cfg, ctx = _load(path)
    toks = [1, 9, 42, 7, 3]
    la = ctx.eval(np.asarray([toks], np.int32), logits_all=True)

    _, ctx2 = _load(path)
    outs = [ctx2.eval(np.asarray([[t]], np.int32))[0, -1] for t in toks]
    np.testing.assert_allclose(la[0], np.stack(outs), rtol=2e-4, atol=2e-5)


def test_rescale_every_applied(tmp_path):
    path = _build_model(tmp_path, n_layer=4, rescale_every=2)
    cfg, ctx = _load(path)
    out = ctx.eval(np.asarray([[1, 2]], np.int32), logits_all=True)
    assert np.isfinite(out).all()


@pytest.fixture(scope="module")
def oracle_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if not os.path.exists(ORACLE):
        os.makedirs(BUILD, exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "oracle", "ref_rwkv_logits.cpp")
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}",
                 f"-I{REF}/arch", f"-I{REF}/arch/rwkv"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}", "-o", obj],
                                   check=True, capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src, f"{REF}/arch/rwkv/rwkv.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o", "-o", ORACLE],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build rwkv oracle: {getattr(e, 'stderr', '')[-400:]}")
    return ORACLE


@pytest.mark.parametrize("qtype_name", ["F32", "Q4_0"])
def test_rwkv_parity_vs_reference(tmp_path, oracle_bin, qtype_name):
    # n_layer=12 -> MODEL_169M: the reference maps unknown layer counts to
    # MODEL_UNKNOWN and crashes on its MEM_REQ map (rwkv.cpp:1064)
    path = _build_model(tmp_path, qtype_name=qtype_name, n_embd=64, n_layer=12)
    toks = [1, 5, 42, 260, 17]
    res = subprocess.run([oracle_bin, path, ",".join(map(str, toks))],
                         check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    n_tok, n_vocab = map(int, lines[0].split())
    ref_probs = np.array([[float(x) for x in l.split()] for l in lines[1 : 1 + n_tok]])

    cfg, ctx = _load(path, compute="float32")
    logits = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    ours = np.exp(logits - logits.max(-1, keepdims=True))
    ours = ours / ours.sum(-1, keepdims=True)

    # reference's quantized matmul quantizes activations to q8; allow more
    # slack there (same reasoning as test_reference_parity.py)
    tol = 2e-3 if qtype_name == "F32" else 2e-2
    assert np.abs(ours - ref_probs).max() < tol
    agree = (np.argmax(ours, -1) == np.argmax(ref_probs, -1)).mean()
    assert agree >= (1.0 if qtype_name == "F32" else 0.6)


@pytest.mark.parametrize("qtype_name", ["F32", "Q4_0"])
def test_parallel_prefill_matches_sequential(tmp_path, qtype_name):
    """Associative-scan prefill must match the sequential token scan:
    logits at every valid position and the carried state (incl. ragged
    batch rows via trailing-padding valid masks)."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models import rwkv as rwkv_mod
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv

    path = _build_model(tmp_path, qtype_name, n_vocab=128, n_embd=64,
                        n_layer=4, rescale_every=2)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf)
    params = load_rwkv(gf, cfg)

    rng = np.random.default_rng(0)
    t = 16
    toks = jnp.asarray(rng.integers(1, 128, (2, t)), jnp.int32)
    valid = jnp.asarray(np.arange(t)[None, :] < np.asarray([[13], [16]]))

    seq_l, seq_st = rwkv_mod.forward(cfg, params, toks,
                                     rwkv_mod.init_state(cfg, 2),
                                     valid=valid, parallel=False)
    par_l, par_st = rwkv_mod.forward(cfg, params, toks,
                                     rwkv_mod.init_state(cfg, 2),
                                     valid=valid, parallel=True)
    mask = np.asarray(valid)[:, :, None]
    np.testing.assert_allclose(np.where(mask, np.asarray(par_l), 0),
                               np.where(mask, np.asarray(seq_l), 0),
                               rtol=2e-4, atol=2e-5)
    for k in seq_st:
        np.testing.assert_allclose(np.asarray(par_st[k]),
                                   np.asarray(seq_st[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_parallel_prefill_then_decode_greedy_parity(tmp_path):
    """Greedy decode continued from a parallel prefill must emit the same
    token chain as a fully sequential run."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models import rwkv as rwkv_mod
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv

    path = _build_model(tmp_path, "F32", n_vocab=96, n_embd=48, n_layer=3)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf)
    params = load_rwkv(gf, cfg)
    prompt = jnp.asarray([[3, 17, 42, 9, 61, 5, 28, 77, 11, 2]], jnp.int32)

    def run(parallel):
        lg, st = rwkv_mod.forward(cfg, params, prompt,
                                  rwkv_mod.init_state(cfg, 1),
                                  last_only=True, parallel=parallel)
        out = []
        for _ in range(12):
            tok = int(np.asarray(lg)[0, -1].argmax())
            out.append(tok)
            lg, st = rwkv_mod.forward(
                cfg, params, jnp.asarray([[tok]], jnp.int32), st,
                parallel=False)
        return out

    assert run(True) == run(False)


def test_rwkv_bucket_padding_state_exact(tmp_path):
    """Bucket-padded prompts must leave state and logits identical to the
    exact-length eval (padded steps pass the carry through)."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.models import rwkv as rwkv_mod
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_rwkv

    path = _build_model(tmp_path, "F32", n_vocab=128, n_embd=32, n_layer=2)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf)
    params = load_rwkv(gf, cfg)
    toks = np.asarray([[5, 9, 11]], np.int32)  # t=3 pads to bucket 8

    st0 = rwkv_mod.init_state(cfg, 1)
    ref_logits, ref_state = rwkv_mod.forward(cfg, params, jnp.asarray(toks),
                                             st0, last_only=True)

    from llama_cpp_q_4_0_tpu.runtime.context import RwkvContext

    ctx = RwkvContext(cfg, params)
    got = ctx.eval(toks)
    np.testing.assert_allclose(got, np.asarray(ref_logits), rtol=1e-5,
                               atol=1e-5)
    for k in ref_state:
        np.testing.assert_allclose(np.asarray(ctx.state[k]),
                                   np.asarray(ref_state[k]),
                                   rtol=1e-5, atol=1e-5)
