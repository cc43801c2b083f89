"""End-to-end numerical parity against the compiled reference llama.cpp.

Builds a tiny random q4_0 LLaMA GGJT file with OUR writer + quantizers, then
evaluates the same token sequence with (a) the reference llama.cpp compiled
from /root/reference and (b) our JAX runtime (f32 compute), and compares
logits.  This is the strongest correctness gate short of a full wikitext
perplexity run: it exercises file format, quantization, dequantization, the
whole transformer graph, RoPE layout, and the KV cache in one shot.
"""

import os
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/refbuild"
ORACLE = f"{BUILD}/ref_logits"


@pytest.fixture(scope="module")
def oracle_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if not os.path.exists(ORACLE):
        os.makedirs(BUILD, exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "oracle", "ref_logits.cpp")
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            # ggml.c / k_quants.c are C (not valid C++): compile separately
            subprocess.run(["gcc", *flags, "-c", f"{REF}/ggml.c", "-o", f"{BUILD}/ggml.o"],
                           check=True, capture_output=True, text=True)
            subprocess.run(["gcc", *flags, "-c", f"{REF}/k_quants.c", "-o", f"{BUILD}/k_quants.o"],
                           check=True, capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src, f"{REF}/llama.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o", "-o", ORACLE],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build oracle: {getattr(e, 'stderr', '')[-500:]}")
    return ORACLE


@pytest.mark.parametrize("qtype_name", ["F32", "Q4_0", "Q8_0", "F16", "Q4_K"])
def test_llama_logits_parity(tmp_path, oracle_bin, qtype_name):
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    import jax.numpy as jnp

    qtype = GGMLType[qtype_name]
    path = str(tmp_path / "tiny.ggjt")
    # n_embd 256 / n_mult 256 so rows are QK_K-divisible for k-quants
    make_llama_ggjt(path, n_vocab=512, n_embd=256, n_mult=256, n_head=4,
                    n_layer=2, qtype=qtype, seed=3)

    toks = [1, 5, 42, 260, 400, 17, 9, 300]
    res = subprocess.run(
        [oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True,
    )
    lines = res.stdout.strip().splitlines()
    n_tok, n_vocab = map(int, lines[0].split())
    ref = np.array([[float(x) for x in l.split()] for l in lines[1 : 1 + n_tok]])
    assert ref.shape == (len(toks), 512)

    import dataclasses

    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=128)
    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, n_ctx=128, cache_dtype=jnp.float32)
    ours = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]

    # Expected residual differences vs the reference CPU path:
    #  - quantized mul_mat quantizes *activations* to q8_0/q8_K first
    #    (ggml.c:11353-11367); we keep activations in f32/bf16 (strictly
    #    more accurate)
    #  - ggml's silu/gelu go through fp16 lookup tables (ggml.c:120-122)
    # so F32 files gate tightly; quantized files gate loosely + argmax.
    scale = np.abs(ref).max()
    err = np.abs(ours - ref).max() / scale
    tol = 5e-3 if qtype_name == "F32" else 5e-2
    assert err < tol, f"max rel logit err {err}"
    agree = (np.argmax(ours, -1) == np.argmax(ref, -1)).mean()
    # near-tied logits on a tiny random model can flip under the (expected)
    # activation-precision differences; require strong majority agreement
    min_agree = 1.0 if qtype_name == "F32" else 0.75
    assert agree >= min_agree, f"argmax agreement {agree}"

    # and the default bf16 path must stay close to the f32 reference
    cfg_bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    ctx_bf = Context(cfg_bf, params, n_ctx=128)
    ours_bf = ctx_bf.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    err_bf = np.abs(ours_bf - ref).max() / scale
    assert err_bf < 8e-2, f"bf16 rel logit err {err_bf}"
    assert (np.argmax(ours_bf, -1) == np.argmax(ref, -1)).mean() >= 0.75


@pytest.mark.parametrize("qtype_name", ["Q4_0", "Q4_1", "Q5_0", "Q5_1",
                                        "Q8_0", "Q2_K", "Q3_K", "Q4_K",
                                        "Q5_K", "Q6_K"])
def test_llama_logits_parity_ref_int8(tmp_path, oracle_bin, qtype_name):
    """TIGHT quantized gate, every format: compute_dtype='ref_int8'
    reproduces the reference's ACTUAL quantized-matmul semantics —
    q8_0 activations + integer group dots for the 32-group legacy
    formats, q8_1 (f32 d + group sums) for the affine ones, q8_K
    per-256-superblock round-half-even for k-quants
    (ggml.c:1618-1747, k_quants.c:1133) — and act_f16_table ggml's fp16
    gelu/silu/exp tables plus the double-accumulated rms_norm.

    Every op is then EXACT (see test_q_matmul_ref_int8_exact), and on a
    fixed vector whole forwards reproduce the compiled reference to
    float-summation noise (the pinned Q8_0 case below).  Model-level
    parity in general is bounded by REQUANTIZATION CHAOS: the
    reference's vec_dot accumulates d_x*d_w products in
    sequential/AVX2-lane f32 order; a 1-ulp association difference
    flips the next layer's activation-quantizer round on a near-tie and
    gets amplified ~1000x.  Measured bound across formats/prompts: ~2.5%
    worst-logit wobble with EXACT argmax everywhere — which is what this
    gate pins (vs 5e-2 + 75%-argmax for the f32-activation gate)."""
    import dataclasses

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / "tiny8.ggjt")
    make_llama_ggjt(path, n_vocab=512, n_embd=256, n_mult=256, n_head=4,
                    n_layer=2, qtype=GGMLType[qtype_name], seed=3)
    toks = [1, 5, 42, 260, 400, 17, 9, 300]
    res = subprocess.run(
        [oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    n_tok, _ = map(int, lines[0].split())
    ref = np.array([[float(x) for x in l.split()]
                    for l in lines[1:1 + n_tok]])

    gf = read_ggjt(path, "llama")
    cfg = dataclasses.replace(config_from_ggjt(gf, n_ctx=128),
                              compute_dtype="ref_int8", act_f16_table=True)
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, n_ctx=128, cache_dtype=jnp.float32)
    got = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    err = np.abs(got - ref).max()
    if qtype_name == "Q8_0":
        # this specific (seed, prompt) pair traverses the whole forward
        # without a single requantization flip on either side — a pinned
        # DETERMINISTIC regression proving the op-exact emulation
        # composes end-to-end (float-summation-order noise only)
        assert err < 1e-5, f"pinned q8_0 vector drifted: {err}"
    else:
        assert err / np.abs(ref).max() < 5e-2, f"max logit err {err}"
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


NEOX_ORACLE = f"{BUILD}/ref_gptneox_logits"


@pytest.fixture(scope="module")
def neox_oracle_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    src = os.path.join(os.path.dirname(__file__), "oracle",
                       "ref_gptneox_logits.cpp")
    if (not os.path.exists(NEOX_ORACLE)
            or os.path.getmtime(NEOX_ORACLE) < os.path.getmtime(src)):
        os.makedirs(BUILD, exist_ok=True)
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src,
                 f"{REF}/arch/gptneox/gptneox.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o",
                 "-o", NEOX_ORACLE],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build neox oracle: "
                        f"{getattr(e, 'stderr', '')[-400:]}")
    return NEOX_ORACLE


@pytest.mark.parametrize("parallel_residual", [1, 0])
def test_gptneox_logits_parity(tmp_path, neox_oracle_bin, parallel_residual):
    """Our unified forward vs the fork's compiled GPT-NeoX runtime (fused
    QKV + biases, LayerNorm, partial rope, parallel/serial residual) on a
    file written by OUR writer — validates format + graph end-to-end.
    n_layer=16 so the reference maps to MODEL_3B (unknown layer counts
    crash its MEM_REQ maps, gptneox.cpp:910-921)."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_gptneox_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / f"neox{parallel_residual}.bin")
    make_gptneox_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=16,
                      use_parallel_residual=parallel_residual,
                      qtype=GGMLType.Q4_0)
    toks = [1, 5, 42, 200, 17, 9]
    res = subprocess.run(
        [neox_oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True)
    # the fork's loader chats on stdout: find our header from the end
    lines = res.stdout.strip().splitlines()
    hdr = max(i for i, l in enumerate(lines)
              if len(l.split()) == 2
              and all(t.isdigit() for t in l.split()))
    n_tok, n_vocab = map(int, lines[hdr].split())
    ref = np.array([[float(x) for x in l.split()]
                    for l in lines[hdr + 1:hdr + 1 + n_tok]])

    gf = read_ggjt(path, "gptneox")
    cfg = config_from_ggjt(gf, n_ctx=128)
    import dataclasses

    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, cache_dtype=jnp.float32)
    got = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    # ggml's GELU goes through an fp16 lookup table (ggml.c table_gelu)
    # and this fixture is forced to 16 layers (reference size map), so
    # activations accumulate ~1e-3 relative noise per layer — compare to
    # a correspondingly loose tolerance plus greedy-choice agreement
    # (the TIGHT gate is test_gptneox_logits_parity_f32_table below)
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.1)
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


@pytest.mark.parametrize("parallel_residual", [1, 0])
def test_gptneox_logits_parity_f32_table(tmp_path, neox_oracle_bin,
                                         parallel_residual):
    """TIGHT NeoX gate: F32 weights (no activation-quantization slack) +
    our exact emulation of ggml's fp16 GELU table (act_f16_table) leave
    only float-rounding differences — a per-logit 2e-3 absolute bound
    over 16 layers, ~10x tighter than the quantized gate above."""
    import dataclasses

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_gptneox_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / f"neoxf{parallel_residual}.bin")
    make_gptneox_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=16,
                      use_parallel_residual=parallel_residual,
                      qtype=GGMLType.F32, ftype=0)
    toks = [1, 5, 42, 200, 17, 9]
    res = subprocess.run(
        [neox_oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    hdr = max(i for i, l in enumerate(lines)
              if len(l.split()) == 2
              and all(t.isdigit() for t in l.split()))
    n_tok, _ = map(int, lines[hdr].split())
    ref = np.array([[float(x) for x in l.split()]
                    for l in lines[hdr + 1:hdr + 1 + n_tok]])

    gf = read_ggjt(path, "gptneox")
    cfg = dataclasses.replace(config_from_ggjt(gf, n_ctx=128),
                              compute_dtype="float32", act_f16_table=True)
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, cache_dtype=jnp.float32)
    got = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    err = np.abs(got - ref).max()
    assert err < 2e-3, f"max abs logit err {err}"
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


FALCON_ORACLE = f"{BUILD}/ref_falcon_logits"


@pytest.fixture(scope="module")
def falcon_oracle_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    src = os.path.join(os.path.dirname(__file__), "oracle",
                       "ref_falcon_logits.cpp")
    if (not os.path.exists(FALCON_ORACLE)
            or os.path.getmtime(FALCON_ORACLE) < os.path.getmtime(src)):
        os.makedirs(BUILD, exist_ok=True)
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src,
                 f"{REF}/arch/falcon/falcon.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o",
                 "-o", FALCON_ORACLE],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build falcon oracle: "
                        f"{getattr(e, 'stderr', '')[-400:]}")
    return FALCON_ORACLE


def test_falcon_logits_parity(tmp_path, falcon_oracle_bin):
    """Our unified forward vs the fork's compiled Falcon runtime (MQA:
    one KV head broadcast to n_head).  n_layer=32 + n_embd<4544 maps to
    the reference's MODEL_3B (falcon.cpp:907-915)."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_falcon_like_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / "falcon.bin")
    make_falcon_like_ggjt(path, "falcon", n_vocab=256, n_embd=64, n_head=4,
                          n_layer=32, qtype=GGMLType.Q4_0)
    toks = [1, 5, 42, 200, 17, 9]
    res = subprocess.run(
        [falcon_oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    hdr = max(i for i, l in enumerate(lines)
              if len(l.split()) == 2
              and all(t.isdigit() for t in l.split()))
    n_tok, n_vocab = map(int, lines[hdr].split())
    ref = np.array([[float(x) for x in l.split()]
                    for l in lines[hdr + 1:hdr + 1 + n_tok]])

    gf = read_ggjt(path, "falcon")
    cfg = config_from_ggjt(gf, n_ctx=128)
    import dataclasses

    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, cache_dtype=jnp.float32)
    got = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    # fp16 GELU table noise over 32 forced layers (see neox test; the
    # TIGHT gate is test_falcon_logits_parity_f32_table below)
    np.testing.assert_allclose(got, ref, rtol=0.15, atol=0.15)
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


def test_falcon_logits_parity_f32_table(tmp_path, falcon_oracle_bin):
    """TIGHT Falcon gate: F32 weights + exact fp16-GELU-table emulation
    (see the NeoX analogue) — per-logit 2e-3 absolute bound over the 32
    forced layers, vs 0.15 for the quantized gate."""
    import dataclasses

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_falcon_like_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / "falconf.bin")
    make_falcon_like_ggjt(path, "falcon", n_vocab=256, n_embd=64, n_head=4,
                          n_layer=32, qtype=GGMLType.F32, ftype=0)
    toks = [1, 5, 42, 200, 17, 9]
    res = subprocess.run(
        [falcon_oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    hdr = max(i for i, l in enumerate(lines)
              if len(l.split()) == 2
              and all(t.isdigit() for t in l.split()))
    n_tok, _ = map(int, lines[hdr].split())
    ref = np.array([[float(x) for x in l.split()]
                    for l in lines[hdr + 1:hdr + 1 + n_tok]])

    gf = read_ggjt(path, "falcon")
    cfg = dataclasses.replace(config_from_ggjt(gf, n_ctx=128),
                              compute_dtype="float32", act_f16_table=True)
    params = load_transformer(gf, cfg)
    ctx = Context(cfg, params, cache_dtype=jnp.float32)
    got = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    err = np.abs(got - ref).max()
    assert err < 2e-3, f"max abs logit err {err}"
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


BONSAI_ORACLE = f"{BUILD}/ref_bonsai_logits"


@pytest.fixture(scope="module")
def bonsai_oracle_bin():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if not os.path.exists(BONSAI_ORACLE):
        os.makedirs(BUILD, exist_ok=True)
        src = os.path.join(os.path.dirname(__file__), "oracle",
                           "ref_bonsai_logits.cpp")
        flags = ["-O2", "-fPIC", "-pthread", "-DGGML_USE_K_QUANTS", f"-I{REF}"]
        try:
            for cf in ("ggml.c", "k_quants.c"):
                obj = f"{BUILD}/{cf.replace('.c', '.o')}"
                if not os.path.exists(obj):
                    subprocess.run(["gcc", *flags, "-c", f"{REF}/{cf}",
                                    "-o", obj], check=True,
                                   capture_output=True, text=True)
            subprocess.run(
                ["g++", "-std=c++11", *flags, src,
                 f"{REF}/arch/bonsai/bonsai.cpp",
                 f"{BUILD}/ggml.o", f"{BUILD}/k_quants.o",
                 "-o", BONSAI_ORACLE],
                check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build bonsai oracle: "
                        f"{getattr(e, 'stderr', '')[-400:]}")
    return BONSAI_ORACLE


def test_bonsai_reference_layers_are_dead_code(tmp_path, bonsai_oracle_bin):
    """DISCOVERY: the reference Bonsai runtime never executes its
    transformer layers.  bonsai.cpp:1225 declares
    `struct ggml_tensor * inpL = cur;` INSIDE the layer loop, shadowing
    the loop-carried activation — every layer's residual accumulates into
    the shadow (discarded at the iteration's end), the next layer reads
    the OUTER inpL (still the raw embedding), and the final
    ggml_build_forward_expand therefore captures only
    lm_head(bonsai_norm(embedding)).  This test pins that behavior: the
    compiled reference's logits equal our head(norm(embed)) to
    quantization noise, and a REAL 24-layer forward differs.  Our bonsai
    runtime implements the working falcon-family graph instead (gated by
    test_model_runtime)."""
    import dataclasses

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import make_falcon_like_ggjt
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.models.transformer import bonsai_rms_norm
    from llama_cpp_q_4_0_tpu.ops.qmatmul import q_matmul
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / "bonsai.bin")
    make_falcon_like_ggjt(path, "bonsai", n_vocab=256, n_embd=64, n_head=4,
                          n_layer=24, qtype=GGMLType.Q4_0)
    toks = [1, 5, 42, 200, 17, 9]
    res = subprocess.run(
        [bonsai_oracle_bin, path, ",".join(map(str, toks))],
        check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    hdr = max(i for i, l in enumerate(lines)
              if len(l.split()) == 2
              and all(t.isdigit() for t in l.split()))
    n_tok, n_vocab = map(int, lines[hdr].split())
    ref = np.array([[float(x) for x in l.split()]
                    for l in lines[hdr + 1:hdr + 1 + n_tok]])

    gf = read_ggjt(path, "bonsai")
    cfg = config_from_ggjt(gf, n_ctx=128)
    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params = load_transformer(gf, cfg)

    # the reference output == head(norm(embedding)) — layers dead
    emb = params.tok_embeddings.rows(jnp.asarray(toks))
    x = bonsai_rms_norm(emb, params.out_norm_w, params.out_norm_b)
    embed_only = np.asarray(q_matmul(x, params.output,
                                     compute_dtype=jnp.float32,
                                     use_pallas=False))
    np.testing.assert_allclose(embed_only, ref, rtol=0.08, atol=0.08)

    # our runtime actually runs the 24 layers: output must differ
    ctx = Context(cfg, params, cache_dtype=jnp.float32)
    got = ctx.eval(np.asarray([toks], np.int32), logits_all=True)[0]
    assert np.abs(got - ref).max() > 0.5


def _oracle_logits(bin_path, model_path, spec: str) -> np.ndarray:
    res = subprocess.run([bin_path, model_path, spec],
                         check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    hdr = max(i for i, l in enumerate(lines)
              if len(l.split()) == 2 and all(t.isdigit() for t in l.split()))
    n_tok, _ = map(int, lines[hdr].split())
    return np.array([[float(x) for x in l.split()]
                     for l in lines[hdr + 1:hdr + 1 + n_tok]])


@pytest.mark.parametrize("arch", ["gptneox", "falcon"])
def test_incremental_decode_chain_parity(tmp_path, arch, request):
    """Sequential evals (prefill + two decode steps) against the compiled
    arch runtimes: the fork stores UN-roped K and re-ropes the whole cache
    every step (gptneox.cpp:1220-1230, falcon.cpp:1260-1274) so shifted
    positions stay consistent; our design ropes at insert (slot ==
    position).  Equal logits across an incremental chain — not just one
    n_past=0 eval — proves the two cache designs equivalent, including
    cache REUSE of slots written by a previous eval."""
    import dataclasses

    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.fixtures import (
        make_falcon_like_ggjt, make_gptneox_ggjt,
    )
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (
        config_from_ggjt, load_transformer,
    )
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    path = str(tmp_path / f"{arch}_inc.bin")
    if arch == "gptneox":
        oracle = request.getfixturevalue("neox_oracle_bin")
        make_gptneox_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=16,
                          qtype=GGMLType.F32, ftype=0)
    else:
        oracle = request.getfixturevalue("falcon_oracle_bin")
        make_falcon_like_ggjt(path, "falcon", n_vocab=256, n_embd=64,
                              n_head=4, n_layer=32, qtype=GGMLType.F32,
                              ftype=0)
    segs = [[1, 5, 42, 200], [17], [9, 33]]
    spec = ";".join(",".join(map(str, s)) for s in segs)
    ref = _oracle_logits(oracle, path, spec)

    gf = read_ggjt(path, arch)
    cfg = dataclasses.replace(config_from_ggjt(gf, n_ctx=128),
                              compute_dtype="float32", act_f16_table=True)
    ctx = Context(cfg, load_transformer(gf, cfg), cache_dtype=jnp.float32)
    got = np.concatenate([
        np.asarray(ctx.eval(np.asarray([s], np.int32), logits_all=True)[0])
        for s in segs])
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 2e-3, f"{arch}: max abs logit err {err}"
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))
    # sanity: the chain must equal the single-shot eval too
    flat = [t for s in segs for t in s]
    ref_flat = _oracle_logits(oracle, path, ",".join(map(str, flat)))
    assert np.abs(ref - ref_flat).max() < 1e-5
