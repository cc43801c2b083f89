"""Explicit shard_map tensor-parallel forward (parallel/tp.py) vs the
single-device forward — the multi-chip hot path with manual psum/all_gather
placement, validated on the virtual CPU mesh.

WHOLE-MODULE PROCESS ISOLATION: compiling this module's large shard_map
executables segfaults inside jaxlib when the full suite's process state has
accumulated — observed repeatedly, always at the first big compile REACHED
in this file (first staggered_occupancy 4/4 runs, then — after those were
isolated — per_row_n_past), with the native frame varying
(backend_compile_and_load, executable serialize AND deserialize), while
every test passes in a fresh process.  That pattern (any large native
compile entry point, late-process only, victim moves as the suite grows)
points at XLA-CPU/LLVM-JIT state exhaustion, not at our code.  Per-test
isolation was whack-a-mole, so ``test_tp_module_isolated`` runs this WHOLE
file in one fresh pytest child; every other test skips in the parent and
runs for real inside the child."""

import dataclasses
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.models import transformer
from llama_cpp_q_4_0_tpu.models.config import ModelConfig
from llama_cpp_q_4_0_tpu.parallel import make_mesh
from llama_cpp_q_4_0_tpu.parallel.tp import prepare_tp_params, tp_forward
from llama_cpp_q_4_0_tpu.quant.types import GGMLType

from test_parallel import tiny_q_model

_CHILD = os.environ.get("_LLAMA_TP_CHILD") == "1"


@pytest.fixture(autouse=True)
def _module_child_only(request):
    if not _CHILD and request.node.name != "test_tp_module_isolated":
        pytest.skip("runs inside test_tp_module_isolated's fresh process")
    yield


def test_tp_module_isolated():
    """Gate: every test in this file, green, in one fresh child process
    (see module docstring for why)."""
    if _CHILD:
        pytest.skip("already in the module child")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", __file__, "-q",
         "-p", "no:cacheprovider"],
        env={**os.environ, "_LLAMA_TP_CHILD": "1"},
        capture_output=True, text=True, timeout=3000,
    )
    assert r.returncode == 0, (
        f"isolated test_tp module failed (rc={r.returncode}):\n"
        f"{r.stdout[-6000:]}\n{r.stderr[-2000:]}")


def _tiny_mqa(seed=0, n_vocab=256, e=128, n_head=4, n_layer=1, f=256):
    """Falcon-style MQA quantized model (1 KV head -> replicated KV)."""
    from llama_cpp_q_4_0_tpu.models.transformer import Block, TransformerParams
    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

    cfg = ModelConfig.falcon(n_vocab=n_vocab, n_embd=e, n_head=n_head,
                             n_layer=n_layer, n_ctx=64)
    cfg = dataclasses.replace(cfg, n_ff=f)
    rng = np.random.default_rng(seed)
    q = lambda n, k: QTensor.quantize(
        rng.standard_normal((n, k), dtype=np.float32) * 0.05, GGMLType.Q4_0)
    d = cfg.head_dim
    blocks = tuple(
        Block(attn_norm_w=jnp.ones((e,)), attn_norm_b=jnp.zeros((e,)),
              wq=q(e, e), wk=q(d, e), wv=q(d, e), wo=q(e, e),
              w_up=q(f, e), w_down=q(e, f))
        for _ in range(n_layer))
    params = TransformerParams(tok_embeddings=q(n_vocab, e), blocks=blocks,
                               out_norm_w=jnp.ones((e,)),
                               out_norm_b=jnp.zeros((e,)),
                               output=q(n_vocab, e))
    return cfg, params


def _run_pair(cfg, params, tp):
    mesh = make_mesh(dp=1, sp=1, tp=tp)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, 255, (2, 8)), jnp.int32)
    step = jnp.asarray(rng.integers(0, 255, (2, 1)), jnp.int32)

    # reference: plain forward
    ck, cv = transformer.init_cache(cfg, 2, 32, dtype=jnp.float32)
    ref1, ck, cv = transformer.forward(cfg, params, prompt, jnp.int32(0),
                                       ck, cv, last_only=True)
    ref2, _, _ = transformer.forward(cfg, params, step, jnp.int32(8),
                                     ck, cv, last_only=True)

    # tp: prepared params + explicit collectives, prefill then decode
    sp = prepare_tp_params(params, mesh, cfg)
    tck, tcv = transformer.init_cache(cfg, 2, 32, dtype=jnp.float32)
    from llama_cpp_q_4_0_tpu.parallel.shard import shard_cache

    tck, tcv = shard_cache(tck, tcv, cfg, mesh)
    got1, tck, tcv = tp_forward(cfg, sp, prompt, jnp.int32(0), tck, tcv,
                                mesh, last_only=True)
    got2, _, _ = tp_forward(cfg, sp, step, jnp.int32(8), tck, tcv, mesh,
                            last_only=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)


def test_tp_forward_llama_tp4():
    cfg, params = tiny_q_model(n_layer=1)
    _run_pair(cfg, params, tp=4)


def test_tp_forward_mqa_tp2():
    cfg, params = _tiny_mqa()
    _run_pair(cfg, params, tp=2)


def test_unpack_roundtrip():
    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

    rng = np.random.default_rng(2)
    w = (rng.standard_normal((64, 256)) * 0.2).astype(np.float32)
    qp = QTensor.quantize(w, GGMLType.Q4_0)
    assert qp.packed
    qu = qp.unpack()
    assert not qu.packed
    np.testing.assert_array_equal(np.asarray(qp.dequantize()),
                                  np.asarray(qu.dequantize()))


def test_tp_forward_gptneox_biases_tp2():
    """NeoX exercises the bias paths (bq/bk/bv/bo/b_up/b_down) and
    LayerNorm through the explicit-collective forward."""
    from llama_cpp_q_4_0_tpu.models.transformer import Block, TransformerParams
    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

    e, heads, layers, f, v = 128, 4, 1, 256, 256
    cfg = ModelConfig.gptneox(n_vocab=v, n_embd=e, n_head=heads,
                              n_layer=layers, n_rot=16,
                              use_parallel_residual=0, n_ctx=64)
    rng = np.random.default_rng(3)
    q = lambda n, k: QTensor.quantize(
        rng.standard_normal((n, k), dtype=np.float32) * 0.05, GGMLType.Q4_0)
    vec = lambda n: jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32)
    blocks = tuple(
        Block(attn_norm_w=jnp.ones((e,)), attn_norm_b=vec(e),
              wq=q(e, e), wk=q(e, e), wv=q(e, e),
              bq=vec(e), bk=vec(e), bv=vec(e),
              wo=q(e, e), bo=vec(e),
              ffn_norm_w=jnp.ones((e,)), ffn_norm_b=vec(e),
              w_up=q(f, e), b_up=vec(f), w_down=q(e, f), b_down=vec(e))
        for _ in range(layers))
    params = TransformerParams(tok_embeddings=q(v, e), blocks=blocks,
                               out_norm_w=jnp.ones((e,)), out_norm_b=vec(e),
                               output=q(v, e))
    _run_pair(cfg, params, tp=2)


def test_repack_row_shards_lossless():
    """Per-shard repack reassembles to exactly the original dequant."""
    from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor

    rng = np.random.default_rng(5)
    n, k, tp = 64, 512, 4
    w = (rng.standard_normal((n, k)) * 0.2).astype(np.float32)
    for qt in (GGMLType.Q4_0, GGMLType.Q4_1):
        q = QTensor.quantize(w, qt)
        rs = q.repack_row_shards(tp)
        assert rs.shape == (n, k // tp)
        kl = k // tp
        k2p = rs.levels_t.shape[0] // tp
        full = np.asarray(q.dequantize())  # [N, K]
        for s in range(tp):
            local = QTensor(
                levels_t=rs.levels_t[s * k2p:(s + 1) * k2p],
                gscale_t=rs.gscale_t[2 * s:2 * s + 2],
                gbias_t=None if rs.gbias_t is None
                else rs.gbias_t[2 * s:2 * s + 2],
                gsize=rs.gsize, qtype=rs.qtype, shape=rs.shape,
                pack_zero=rs.pack_zero)
            np.testing.assert_array_equal(
                np.asarray(local.dequantize()),
                full[:, s * kl:(s + 1) * kl])


def test_tp_forward_with_fused_input():
    """prepare_tp_params must accept loader-fused params (defuse first)."""
    from llama_cpp_q_4_0_tpu.models.fuse import fuse_projections

    cfg, params = tiny_q_model(n_layer=1)
    fused = fuse_projections(cfg, params)
    assert fused.blocks[0].wqkv is not None
    _run_pair(cfg, fused, tp=2)


def test_defuse_roundtrip():
    from llama_cpp_q_4_0_tpu.models.fuse import defuse_projections, fuse_projections

    cfg, params = tiny_q_model(n_layer=1)
    back = defuse_projections(cfg, fuse_projections(cfg, params))
    assert back.blocks[0].wqkv is None and back.blocks[0].wq is not None
    for name in ("wq", "wk", "wv", "w_gate", "w_up"):
        a = getattr(params.blocks[0], name)
        b = getattr(back.blocks[0], name)
        np.testing.assert_array_equal(np.asarray(a.dequantize()),
                                      np.asarray(b.dequantize()))


def test_tp_forward_per_row_n_past_and_window():
    """[B] n_past + kv_window through the explicit TP path == the plain
    forward with the same arguments (the contract the batch engine needs)."""
    cfg, params = tiny_q_model(n_layer=1)
    mesh = make_mesh(dp=1, sp=1, tp=4)
    from llama_cpp_q_4_0_tpu.parallel.shard import shard_cache

    rng = np.random.default_rng(7)
    b, s = 3, 32
    offs = jnp.asarray([0, 3, 7], jnp.int32)
    tok = jnp.asarray(rng.integers(0, 255, (b, 1)), jnp.int32)

    ck, cv = transformer.init_cache(cfg, b, s, dtype=jnp.float32)
    prim = jnp.asarray(rng.integers(0, 255, (b, 8)), jnp.int32)
    _, ck, cv = transformer.forward(cfg, params, prim, jnp.int32(0), ck, cv,
                                    last_only=True)

    want, wck, wcv = transformer.forward(cfg, params, tok, offs, ck, cv,
                                         last_only=True, kv_window=16)

    sp = prepare_tp_params(params, mesh, cfg)
    tck, tcv = shard_cache(ck, cv, cfg, mesh)
    got, gck, gcv = tp_forward(cfg, sp, tok, offs, tck, tcv, mesh,
                               last_only=True, kv_window=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    for l in range(cfg.n_layer):
        np.testing.assert_allclose(np.asarray(gck[l]), np.asarray(wck[l]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gcv[l]), np.asarray(wcv[l]),
                                   rtol=2e-4, atol=2e-4)


def _run_engine(cfg, params, prompts, **kw):
    from llama_cpp_q_4_0_tpu.runtime.batch_engine import BatchEngine, Request
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams

    greedy = SamplingParams(temp=-1.0, top_k=0, repeat_penalty=1.0,
                            repeat_last_n=0)
    eng = BatchEngine(cfg, params, n_slots=2, n_ctx=64, **kw)
    eng.start()
    try:
        reqs = [eng.submit(Request(p, n_predict=6, sampling=greedy))
                for p in prompts]
        return [list(r.tokens()) for r in reqs]
    finally:
        eng.stop()


def test_tp_engine_staggered_occupancy():
    """BatchEngine(tp_mesh=...) — every forward (admission prefill and
    per-row-n_past decode ticks) through the explicit shard_map TP path —
    emits the same greedy tokens as the plain engine.  3 requests of
    different lengths onto 2 slots force queueing, so the decode ticks run
    at staggered per-slot positions (VERDICT #7)."""
    cfg, params = tiny_q_model(n_layer=1)
    mesh = make_mesh(dp=1, sp=1, tp=4)
    prompts = [[3, 5, 7], [11, 13], [100, 90, 80, 70, 60]]
    want = _run_engine(cfg, params, prompts)
    got = _run_engine(cfg, params, prompts, tp_mesh=mesh)
    assert got == want, (want, got)


def test_tp_engine_chunked_ticks():
    """Chunked device-sampled ticks (decode_chunk) routed through the TP
    forward match the plain chunked engine token-for-token."""
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling

    cfg, params = tiny_q_model(n_layer=1)
    mesh = make_mesh(dp=1, sp=1, tp=4)
    prompts = [[3, 5, 7], [11, 13, 17, 19]]
    ds = DeviceSampling(temp=-1.0)
    want = _run_engine(cfg, params, prompts, chunk=2, device_sampling=ds)
    got = _run_engine(cfg, params, prompts, chunk=2, device_sampling=ds,
                      tp_mesh=mesh)
    assert got == want, (want, got)


def test_tp_speculative_verify_matches_plain():
    """Speculative decoding with the verify forward routed through the
    EXPLICIT shard_map TP path (spec_forward adapter): same emitted
    tokens as the plain spec_chunk on identical state."""
    import jax
    from llama_cpp_q_4_0_tpu.parallel.shard import shard_cache
    from llama_cpp_q_4_0_tpu.parallel.tp import spec_forward
    from llama_cpp_q_4_0_tpu.runtime.device_sample import DeviceSampling
    from llama_cpp_q_4_0_tpu.runtime.device_spec import spec_chunk

    cfg, params = _tiny_mqa(n_head=4)
    tp = 4
    mesh = make_mesh(dp=1, sp=1, tp=tp)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 255, 10).tolist()

    def run(use_tp):
        ck, cv = transformer.init_cache(cfg, 1, 64, dtype=jnp.float32)
        if use_tp:
            p = prepare_tp_params(params, mesh, cfg)
            ck, cv = shard_cache(ck, cv, cfg, mesh)
        else:
            p = params
        # prefill all but the last prompt token
        toks = jnp.asarray([prompt[:-1]], jnp.int32)
        if use_tp:
            _, ck, cv = tp_forward(cfg, p, toks, jnp.int32(0), ck, cv,
                                   mesh, last_only=True)
        else:
            _, ck, cv = transformer.forward(cfg, p, toks, jnp.int32(0),
                                            ck, cv, last_only=True)
        hist = jnp.zeros((1, 64), jnp.int32).at[0, :len(prompt)].set(
            jnp.asarray(prompt))
        out = spec_chunk(
            cfg, p, hist, jnp.asarray([len(prompt)], jnp.int32), ck, cv,
            jax.random.key(0), jnp.zeros((1,), bool),
            k=3, n_steps=4, ds=DeviceSampling(temp=-1.0), kv_window=64,
            max_ngram=3, min_ngram=1, eos=-1, ignore_eos=True,
            forward_fn=spec_forward(mesh) if use_tp else None,
        )
        emit_toks, emit_ns = np.asarray(out[7])[:, 0], np.asarray(out[8])[:, 0]
        toks_out = []
        for s in range(len(emit_ns)):
            toks_out += emit_toks[s, : int(emit_ns[s])].tolist()
        return toks_out

    want = run(False)
    got = run(True)
    assert got == want, (want, got)
