"""Auxiliary-subsystem parity: eval_embd / embd-input, rwkv_opt online
training, graph export/import replay, update tool, checksum tool
(SURVEY.md §2 items 11, 19, 33-36)."""

import json
import os

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.quant.types import GGMLType
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.tokenizer import Tokenizer, Vocab


@pytest.fixture(scope="module")
def loaded(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aux") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    return cfg, load_transformer(gf, cfg), gf


def test_eval_embd_matches_token_eval(loaded):
    """Feeding the model's own embedding rows must equal token eval
    (llama_eval_embd contract)."""
    import jax.numpy as jnp

    cfg, params, _ = loaded
    toks = np.asarray([[3, 7, 11]], np.int32)
    ctx_a = Context(cfg, params, n_ctx=64, cache_dtype=jnp.float32)
    ref = ctx_a.eval(toks)

    from llama_cpp_q_4_0_tpu.models.transformer import _embed

    emb = np.asarray(_embed(params, jnp.asarray(toks)))
    ctx_b = Context(cfg, params, n_ctx=64, cache_dtype=jnp.float32)
    got = ctx_b.eval_embd(emb)  # last-token logits only
    np.testing.assert_allclose(got[:, -1], ref[:, -1], rtol=1e-5, atol=1e-5)
    assert ctx_b.n_past == 3


def test_embd_input_driver(loaded):
    cfg, params, gf = loaded
    from llama_cpp_q_4_0_tpu.runtime.embd_input import EmbdInput, LinearProjector
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

    rng = np.random.default_rng(0)
    proj = LinearProjector(rng.standard_normal((cfg.n_embd, 16)) * 0.1,
                           np.zeros(cfg.n_embd))
    feats = rng.standard_normal((4, 16)).astype(np.float32)
    ctx = Context(cfg, params, n_ctx=64)
    tok = Tokenizer(Vocab.from_ggjt(gf))
    mi = EmbdInput(ctx, tok, SamplingParams(temp=0.8), seed=3)
    mi.eval_text("hi", bos=True)
    mi.eval_float(proj(feats))
    out = mi.generate_text(n_predict=4)
    assert isinstance(out, str) and ctx.n_past > 5


def test_rwkv_opt_reduces_error(tmp_path):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import load_rwkv
    from llama_cpp_q_4_0_tpu.runtime.context import RwkvContext
    from llama_cpp_q_4_0_tpu.training.rwkv_opt import rwkv_opt

    path = str(tmp_path / "r.bin")
    cfg = make_rwkv_ggjt(path, n_vocab=128, n_embd=32, n_layer=1,
                         qtype=GGMLType.F32)
    gf = read_ggjt(path, "rwkv")
    cfg = config_from_ggjt(gf, n_ctx=64)
    params = load_rwkv(gf, cfg)
    ctx = RwkvContext(cfg, params)
    ctx.eval(np.asarray([[5, 9]], np.int32))
    before, after = rwkv_opt(ctx, token=11, actual=42, n_iter=4)
    assert np.isfinite(before) and np.isfinite(after)
    assert after < before, (before, after)
    assert ctx.n_past == 3  # 2 prompt + 1 trained
    # the updated weights should rank the trained target higher now
    logits = ctx.eval(np.asarray([[11]], np.int32))
    assert np.isfinite(logits).all()


def test_export_graph_roundtrip(tmp_path, loaded):
    cfg, params, _ = loaded
    from llama_cpp_q_4_0_tpu.runtime.export import export_decode, load_exported

    path = str(tmp_path / "step.ggtx")
    export_decode(cfg, params, path, n_ctx=64)
    m = load_exported(path)

    ctx = Context(cfg, params, n_ctx=64)
    toks = [3, 9, 27]
    outs_ref = []
    for t in toks:
        outs_ref.append(ctx.eval(np.asarray([[t]], np.int32)))
    for t, ref in zip(toks, outs_ref):
        got = m.step(np.asarray([[t]], np.int32))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    with pytest.raises(ValueError, match="not an exported"):
        import zipfile

        bad = str(tmp_path / "bad.ggtx")
        with zipfile.ZipFile(bad, "w") as z:
            z.writestr("meta.json", json.dumps({"magic": "nope"}))
        load_exported(bad)


def test_update_tool(tmp_path):
    from llama_cpp_q_4_0_tpu.cli import update as update_cli

    src = str(tmp_path / "src.bin")
    make_llama_ggjt(src, n_vocab=256, n_embd=64, n_head=4, n_layer=1)
    dst = str(tmp_path / "dst.bin")
    assert update_cli.main([src, dst]) == 0

    a, b = read_ggjt(src, "llama"), read_ggjt(dst, "llama")
    assert a.hparams == b.hparams and a.ftype == b.ftype
    assert list(a.tensors) == list(b.tensors)
    for name in a.tensors:
        np.testing.assert_array_equal(a.tensor_bytes(name), b.tensor_bytes(name))


def test_verify_checksums(tmp_path, capsys):
    import hashlib

    from llama_cpp_q_4_0_tpu.cli import verify_checksums as vc

    f = tmp_path / "model.bin"
    f.write_bytes(b"hello model")
    good = hashlib.sha256(b"hello model").hexdigest()
    sums = tmp_path / "SHA256SUMS"
    sums.write_text(f"{good}  model.bin\n{'0' * 64}  missing.bin\n")
    assert vc.main([str(sums)]) == 1
    out = capsys.readouterr().out
    assert "model.bin: OK" in out and "missing.bin: MISSING" in out

    sums.write_text(f"{good}  model.bin\n")
    assert vc.main([str(sums)]) == 0


def test_fp8_kv_cache(loaded):
    """f8 KV cache (capability beyond the reference): decode runs and stays
    close to the bf16-cache logits."""
    import jax.numpy as jnp

    cfg, params, _ = loaded
    toks = np.asarray([[3, 7, 11, 19]], np.int32)
    ref = Context(cfg, params, n_ctx=64).eval(toks)
    ctx8 = Context(cfg, params, n_ctx=64, cache_dtype=jnp.float8_e4m3fn)
    got = ctx8.eval(toks)
    assert ctx8.cache_k[0].dtype == jnp.float8_e4m3fn
    # fp8 cache only quantizes K/V of *attended* history; logits stay close
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, rel
    nxt = ctx8.eval(np.asarray([[5]], np.int32))
    assert np.isfinite(nxt).all()


def test_multihost_helpers_single_process():
    from llama_cpp_q_4_0_tpu.parallel import distributed

    assert distributed.is_primary()
    distributed.sync_hosts()  # no-op single process
    mesh = distributed.pod_mesh(tp=2, sp=1)
    assert mesh.shape["tp"] == 2 and mesh.shape["dp"] * 2 == 8


def test_memory_estimate():
    from llama_cpp_q_4_0_tpu.models.config import ModelConfig
    from llama_cpp_q_4_0_tpu.utils.memory import estimate

    cfg = ModelConfig.llama()  # 7B defaults
    est = estimate(cfg, GGMLType.Q4_0, n_ctx=2048)
    # 7B q4_0 device footprint: ~4.2 GiB weights (0.625 B/w), ~1 GiB KV
    assert 3.5e9 < est.weights_bytes < 5.5e9, est.weights_bytes
    assert 0.5e9 < est.kv_bytes < 1.5e9, est.kv_bytes
    assert "GiB" in est.report()
    est8 = estimate(cfg, GGMLType.Q8_0, n_ctx=2048)
    assert est8.weights_bytes > est.weights_bytes


def test_ondevice_generate_matches_greedy(loaded):
    """Device-resident chunked decode (greedy) == host greedy loop."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, generate_ondevice,
    )

    cfg, params, _ = loaded
    prompt = [3, 9, 27]
    ctx = Context(cfg, params, n_ctx=64)
    logits = ctx.eval(np.asarray([prompt], np.int32))
    want = []
    for _ in range(10):
        t = int(np.argmax(logits[0, -1]))
        want.append(t)
        logits = ctx.eval(np.asarray([[t]], np.int32))

    ctx2 = Context(cfg, params, n_ctx=64)
    got = generate_ondevice(ctx2, prompt, 10,
                            sampling=DeviceSampling(temp=-1.0), chunk=4)
    assert got == want, (got, want)

    # sampled path: deterministic per seed, differs across seeds (usually)
    ctx3 = Context(cfg, params, n_ctx=64)
    a = generate_ondevice(ctx3, prompt, 8,
                          sampling=DeviceSampling(temp=0.8, top_k=40), seed=1)
    ctx4 = Context(cfg, params, n_ctx=64)
    b = generate_ondevice(ctx4, prompt, 8,
                          sampling=DeviceSampling(temp=0.8, top_k=40), seed=1)
    assert a == b


def test_ondevice_generate_eos_rewinds_n_past(loaded):
    """Mid-chunk EOS must rewind n_past past the post-EOS garbage slots so
    callers continuing from ctx (session save, chat reuse) see clean
    history ending at the last emitted token."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import (
        DeviceSampling, generate_ondevice,
    )

    cfg, params, _ = loaded
    prompt = [3, 9, 27]
    ctx = Context(cfg, params, n_ctx=64)
    full = generate_ondevice(ctx, prompt, 10,
                             sampling=DeviceSampling(temp=-1.0), chunk=4)
    assert len(full) >= 3
    eos = full[2]  # trips mid-chunk (chunk=4, first token is pre-chunk)
    ctx2 = Context(cfg, params, n_ctx=64)
    got = generate_ondevice(ctx2, prompt, 10,
                            sampling=DeviceSampling(temp=-1.0), chunk=4,
                            eos_token=eos)
    assert got == full[:2]
    # prefill set n_past=len(prompt); each emitted token occupies one slot
    assert ctx2.n_past == len(prompt) + len(got)


def test_perplexity_ondevice_matches_host(loaded):
    from llama_cpp_q_4_0_tpu.runtime.perplexity import (
        perplexity, perplexity_ondevice,
    )

    cfg, params, _ = loaded
    rng = np.random.default_rng(0)
    toks = rng.integers(4, 250, 3 * 32).astype(np.int32)
    host = perplexity(Context(cfg, params, n_ctx=32), toks, n_ctx=32,
                      n_batch=32)
    dev = perplexity_ondevice(Context(cfg, params, n_ctx=32), toks, n_ctx=32)
    assert abs(host.ppl - dev.ppl) / host.ppl < 1e-3, (host.ppl, dev.ppl)
    assert host.count == dev.count


def test_profiler_trace_cpu(tmp_path):
    """jax.profiler device tracing works through utils.profiling.trace on
    backends that support it (the axon tunnel hangs it — platform issue,
    not a code path issue; this pins the code path)."""
    import glob

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.utils import profiling

    with profiling.trace(str(tmp_path)):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    files = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
    assert files, "no trace artifacts written"


def test_time_jit_hard_sync(loaded):
    import jax

    from llama_cpp_q_4_0_tpu.utils.profiling import time_jit

    cfg, params, _ = loaded
    import jax.numpy as jnp

    fn = jax.jit(lambda a, b: a @ b)
    ms = time_jit(fn, (jnp.ones((64, 64)), jnp.ones((64, 64))), iters=3)
    assert ms > 0
