"""End-to-end perplexity parity against the compiled reference.

The reference's headline quality table is a wikitext-2 ppl per ftype
(README.md:464, quantize.cpp:15-115).  No real checkpoint exists in this
environment, so the gate runs the reference's FULL perplexity loop
(examples/perplexity/perplexity.cpp:28-119, compiled from /root/reference)
and ours on the same tiny model + multi-chunk corpus and requires the ppl
VALUES to match — failing if any of format, loader, forward, windowing, or
NLL accumulation drifts.  A second test drives the whole quantize-tool
chain (F32 file -> our quantize CLI -> ppl both sides) and gates the
Δppl ordering across ftypes."""

import os
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/refbuild"
PPL_ORACLE = f"{BUILD}/ref_perplexity"


@pytest.fixture(scope="module")
def ppl_oracle_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if not os.path.exists(PPL_ORACLE):
        os.makedirs(BUILD, exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "oracle",
                           "ref_perplexity.cpp")
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src, f"{REF}/llama.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o", "-o", PPL_ORACLE],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build ppl oracle: "
                        f"{getattr(e, 'stderr', '')[-500:]}")
    return PPL_ORACLE


def _ref_ppl(oracle, path, n_ctx, n_batch, tokens):
    res = subprocess.run(
        [oracle, path, str(n_ctx), str(n_batch),
         ",".join(map(str, tokens))],
        check=True, capture_output=True, text=True)
    for line in res.stdout.strip().splitlines()[::-1]:
        if line.startswith("RESULT "):
            _, nll, count, ppl = line.split()
            return float(nll), int(count), float(ppl)
    raise AssertionError(f"no RESULT line in oracle output:\n{res.stdout}")


def _our_ppl(path, n_ctx, n_batch, tokens):
    import dataclasses

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.runtime.context import Context
    from llama_cpp_q_4_0_tpu.runtime.perplexity import perplexity

    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=n_ctx)
    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, n_ctx=n_ctx, cache_dtype=jnp.float32)
    return perplexity(ctx, tokens, n_ctx=n_ctx, n_batch=n_batch)


@pytest.mark.parametrize("qtype_name", ["F16", "Q4_0", "Q4_K"])
def test_ppl_matches_reference(tmp_path, ppl_oracle_bin, qtype_name):
    """Our ppl == the compiled reference's ppl to <0.5% per ftype, on a
    4-chunk corpus with 2 batches per chunk (exercises the BOS swap, the
    batch loop with n_past offsets, and the second-half NLL window)."""
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType

    path = str(tmp_path / "tiny.ggjt")
    make_llama_ggjt(path, n_vocab=512, n_embd=256, n_mult=256, n_head=4,
                    n_layer=2, qtype=GGMLType[qtype_name], seed=3)

    n_ctx, n_batch = 64, 32
    rng = np.random.default_rng(11)
    tokens = rng.integers(3, 500, 4 * n_ctx).tolist()

    ref_nll, ref_count, ref_ppl = _ref_ppl(
        ppl_oracle_bin, path, n_ctx, n_batch, tokens)
    got = _our_ppl(path, n_ctx, n_batch, tokens)

    assert got.count == ref_count  # identical windowing
    rel = abs(got.ppl - ref_ppl) / ref_ppl
    assert rel < 5e-3, f"{qtype_name}: ours {got.ppl} vs ref {ref_ppl} " \
                       f"(rel {rel:.4f})"


def test_quantize_chain_delta_ppl_ordering(tmp_path, ppl_oracle_bin):
    """The reference's headline quality chain: F32 file -> quantize tool ->
    perplexity.  Corpus is SAMPLED FROM the F32 model (temp 1.0), so its
    ppl is near the model's entropy floor and quantization damage is
    measurable: Δppl(Q4_0) > Δppl(Q8_0), Δppl(Q8_0) small — gated on both
    our runtime and the compiled reference, plus ours == reference per
    file."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.cli import quantize as qcli
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context
    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, generate_ondevice,
    )

    f32 = str(tmp_path / "f32.ggjt")
    make_llama_ggjt(f32, n_vocab=512, n_embd=256, n_mult=256, n_head=4,
                    n_layer=2, qtype=GGMLType.F32, seed=7)

    # corpus = the model's own temp-1.0 sample stream: cross-entropy is
    # minimized at the generating distribution, so quantization can only
    # hurt (in expectation) — the Δppl ordering becomes a real signal
    gf = read_ggjt(f32, "llama")
    n_ctx, n_batch = 64, 64
    cfg = config_from_ggjt(gf, n_ctx=256)
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, n_ctx=256, cache_dtype=jnp.float32)
    prompt = [1, 5, 42]
    corpus = prompt + generate_ondevice(
        ctx, prompt, 3 * n_ctx, sampling=DeviceSampling(temp=1.0, top_k=0),
        seed=3, chunk=32, eos_token=-1)
    assert len(corpus) >= 3 * n_ctx

    paths = {"f32": f32}
    for name in ("q8_0", "q4_0"):
        out = str(tmp_path / f"{name}.ggjt")
        rc = qcli.run(qcli.build_parser().parse_args(
            [f32, out, name, "--leave-output-tensor"]))
        assert rc == 0
        paths[name] = out

    ours, refs = {}, {}
    for name, p in paths.items():
        ours[name] = _our_ppl(p, n_ctx, n_batch, corpus).ppl
        refs[name] = _ref_ppl(ppl_oracle_bin, p, n_ctx, n_batch, corpus)[2]

    for name in paths:
        rel = abs(ours[name] - refs[name]) / refs[name]
        assert rel < 5e-3, f"{name}: ours {ours[name]} vs ref {refs[name]}"

    for side in (ours, refs):
        d8 = side["q8_0"] - side["f32"]
        d4 = side["q4_0"] - side["f32"]
        assert d4 > d8, f"Δppl ordering broken: {side}"
        assert d4 > 0, f"q4_0 should measurably hurt: {side}"
        assert abs(d8) < 0.25 * d4, f"q8_0 damage should be small: {side}"
