"""ggla file IO + LoRA apply (convert-lora-to-ggml.py, llama.cpp:2716-2991)."""

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.formats.ggla import GglaFile, read_ggla, write_ggla
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.models.lora import apply_lora
from llama_cpp_q_4_0_tpu.ops.qtensor import QTensor
from llama_cpp_q_4_0_tpu.quant.types import GGMLType


def test_ggla_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "layers.0.attention.wq.weight.loraA": rng.standard_normal((64, 4)).astype(np.float32),
        "layers.0.attention.wq.weight.loraB": rng.standard_normal((64, 4)).astype(np.float32),
    }
    p = str(tmp_path / "a.ggla")
    write_ggla(p, r=4, alpha=8, tensors=tensors)
    gf = read_ggla(p)
    assert gf.r == 4 and gf.alpha == 8 and gf.scaling == 2.0
    for k, v in tensors.items():
        np.testing.assert_array_equal(gf.tensors[k], v)
    pairs = gf.pairs()
    assert list(pairs) == ["layers.0.attention.wq.weight"]
    a, b = pairs["layers.0.attention.wq.weight"]
    np.testing.assert_allclose(
        gf.delta("layers.0.attention.wq.weight"), 2.0 * b @ a.T, rtol=1e-6)


def test_ggla_bad_magic(tmp_path):
    p = str(tmp_path / "bad.ggla")
    with open(p, "wb") as f:
        f.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        read_ggla(p)


@pytest.fixture(scope="module")
def loaded(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2,
                    qtype=GGMLType.F32)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    return cfg, load_transformer(gf, cfg), gf


def _adapter(e, r=4, alpha=8, seed=1):
    rng = np.random.default_rng(seed)
    gf = GglaFile(r=r, alpha=alpha)
    gf.tensors["layers.1.attention.wo.weight.loraA"] = \
        rng.standard_normal((e, r)).astype(np.float32) * 0.1
    gf.tensors["layers.1.attention.wo.weight.loraB"] = \
        rng.standard_normal((e, r)).astype(np.float32) * 0.1
    return gf


def test_apply_lora_dense(loaded):
    cfg, params, _ = loaded
    ad = _adapter(cfg.n_embd)
    out = apply_lora(params, ad)
    want = np.asarray(params.blocks[1].wo, np.float32) + \
        ad.delta("layers.1.attention.wo.weight")
    np.testing.assert_allclose(np.asarray(out.blocks[1].wo, np.float32), want,
                               rtol=1e-2, atol=1e-2)  # bf16 storage
    # untouched tensors stay identical
    np.testing.assert_array_equal(np.asarray(out.blocks[0].wo),
                                  np.asarray(params.blocks[0].wo))


def test_apply_lora_quantized(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("q") / "q.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2,
                    qtype=GGMLType.Q4_0)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    params = load_transformer(gf, cfg)
    ad = _adapter(cfg.n_embd)
    out = apply_lora(params, ad)
    w = out.blocks[1].wo
    assert isinstance(w, QTensor) and w.qtype == GGMLType.Q4_0
    want = np.asarray(params.blocks[1].wo.dequantize()) + \
        ad.delta("layers.1.attention.wo.weight")
    got = np.asarray(w.dequantize())
    # requantization noise bounded by q4_0 round-trip error
    rmse = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rmse < 0.01, rmse


def test_apply_lora_dim_mismatch(loaded):
    cfg, params, _ = loaded
    ad = _adapter(cfg.n_embd // 2)
    with pytest.raises(ValueError, match="incompatible"):
        apply_lora(params, ad)


def test_apply_lora_unmerged_exact(loaded):
    """merge=False: base stays untouched, matmul output == base + x@deltaᵀ,
    end-to-end decode runs through Context."""
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.ops.lowrank import LowRankPatched
    from llama_cpp_q_4_0_tpu.ops.qmatmul import q_matmul

    cfg, params, gf = loaded
    ad = _adapter(cfg.n_embd)
    out = apply_lora(params, ad, merge=False)
    w = out.blocks[1].wo
    assert isinstance(w, LowRankPatched)
    # the base object is the SAME array (bit-exact, zero requantization)
    assert w.base is params.blocks[1].wo

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, cfg.n_embd)).astype(np.float32))
    got = np.asarray(q_matmul(x, w, use_pallas=False))
    want = np.asarray(q_matmul(x, params.blocks[1].wo, use_pallas=False)) \
        + np.asarray(x) @ ad.delta("layers.1.attention.wo.weight").T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # end to end decode
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    ctx = Context(cfg, out, n_ctx=64)
    logits = ctx.eval(np.asarray([[3, 9]], np.int32))
    assert np.isfinite(logits).all()
