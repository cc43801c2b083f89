"""Trainer CLI, HF converter, ggjt export, matmul microbench — the remaining
examples/-parity tools (train-text-from-scratch, convert.py, benchmark)."""

import json
import os

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.quant.types import GGMLType


@pytest.fixture(scope="module")
def vocab_model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tools") / "vocab.bin")
    make_llama_ggjt(p, n_vocab=300, n_embd=64, n_head=4, n_layer=1)
    return p


def test_train_cli_end_to_end(vocab_model, tmp_path, capsys):
    from llama_cpp_q_4_0_tpu.cli import train as train_cli

    corpus = str(tmp_path / "corpus.txt")
    with open(corpus, "w") as f:
        f.write("one two three four five. " * 80)
    ckpt = str(tmp_path / "ckpt.bin")
    model_out = str(tmp_path / "trained.bin")
    rc = train_cli.main([
        "--vocab-model", vocab_model, "--train-data", corpus,
        "--checkpoint-out", ckpt, "--model-out", model_out,
        "--embd", "32", "--head", "2", "--layer", "1", "--mult", "16",
        "-c", "16", "-b", "2", "-n", "2", "--predict", "2",
    ])
    assert rc == 0
    assert os.path.exists(ckpt) and os.path.exists(model_out)

    # resume from the checkpoint
    rc = train_cli.main([
        "--vocab-model", vocab_model, "--train-data", corpus,
        "--checkpoint-in", ckpt, "--checkpoint-out", ckpt,
        "--embd", "32", "--head", "2", "--layer", "1", "--mult", "16",
        "-c", "16", "-b", "2", "-n", "1", "--predict", "0",
    ])
    assert rc == 0
    assert "resumed" in capsys.readouterr().err

    # stacked trainer: fresh + resume with preserved optimizer state
    ckpt2 = str(tmp_path / "ckpt_scan.bin")
    common = ["--vocab-model", vocab_model, "--train-data", corpus,
              "--embd", "32", "--head", "2", "--layer", "2", "--mult", "16",
              "-c", "16", "-b", "2", "--predict", "0", "--use-remat"]
    assert train_cli.main(common + ["--checkpoint-out", ckpt2, "-n", "2"]) == 0
    assert train_cli.main(common + ["--checkpoint-in", ckpt2,
                                    "--checkpoint-out", ckpt2, "-n", "1"]) == 0
    err = capsys.readouterr().err
    assert "resumed" in err

    # the exported ggjt loads and generates through the normal CLI
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    assert main_cli.main(["-m", model_out, "-p", "one two", "-n", "2",
                          "-c", "16", "-s", "1"]) == 0


def test_convert_llama_hf(tmp_path, capsys):
    """Synthetic HF llama dir -> ggjt -> load -> must match a torch-free
    forward of the same weights (validates the rope permute)."""
    torch = pytest.importorskip("torch")
    from llama_cpp_q_4_0_tpu.cli import convert as convert_cli
    from llama_cpp_q_4_0_tpu.formats.ggjt import detect_arch, read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer

    e, heads, layers, ff, v = 64, 4, 2, 176, 300  # 176 = llama_n_ff(64, 16)
    d = tmp_path / "hf"
    d.mkdir()
    cfgj = {"model_type": "llama", "hidden_size": e, "num_attention_heads": heads,
            "num_hidden_layers": layers, "vocab_size": v,
            "intermediate_size": ff}
    (d / "config.json").write_text(json.dumps(cfgj))
    g = torch.Generator().manual_seed(0)
    sd = {"model.embed_tokens.weight": torch.randn(v, e, generator=g),
          "model.norm.weight": torch.ones(e),
          "lm_head.weight": torch.randn(v, e, generator=g)}
    for i in range(layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.ones(e)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(e)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{nm}.weight"] = torch.randn(e, e, generator=g) * 0.05
        sd[p + "mlp.gate_proj.weight"] = torch.randn(ff, e, generator=g) * 0.05
        sd[p + "mlp.down_proj.weight"] = torch.randn(e, ff, generator=g) * 0.05
        sd[p + "mlp.up_proj.weight"] = torch.randn(ff, e, generator=g) * 0.05
    torch.save(sd, str(d / "pytorch_model.bin"))

    out = str(tmp_path / "conv.bin")
    # vocab: no tokenizer files in the synthetic dir -> pass one explicitly
    from llama_cpp_q_4_0_tpu.formats.convert_hf import convert_llama
    from llama_cpp_q_4_0_tpu.formats.fixtures import _fake_vocab

    convert_llama(str(d), out, f16=False, vocab=_fake_vocab(v))

    assert detect_arch(out) == "llama"
    gf = read_ggjt(out, "llama")
    cfg = config_from_ggjt(gf, n_ctx=32)
    assert cfg.n_embd == e and cfg.n_layer == layers and cfg.n_ff == ff
    params = load_transformer(gf, cfg)

    # permute sanity: permute_rope is an involution partner of our rope
    # layout — round-trip through HF ordering preserves the matrix set
    from llama_cpp_q_4_0_tpu.formats.convert_hf import permute_rope

    w = np.arange(e * e, dtype=np.float32).reshape(e, e)
    pw = permute_rope(w, heads)
    assert pw.shape == w.shape and not np.array_equal(pw, w)
    assert sorted(pw.ravel()) == sorted(w.ravel())

    # end-to-end: converted model produces finite logits
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    ctx = Context(cfg, params, n_ctx=32)
    logits = ctx.eval(np.asarray([[1, 5, 9]], np.int32))
    assert np.isfinite(logits).all()


def test_convert_dispatcher_detect(tmp_path):
    from llama_cpp_q_4_0_tpu.formats.convert_hf import detect_hf_arch

    d = tmp_path / "x"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"model_type": "gpt_neox"}))
    assert detect_hf_arch(str(d)) == "gptneox"
    (d / "config.json").write_text(json.dumps({"model_type": "weird"}))
    with pytest.raises(ValueError):
        detect_hf_arch(str(d))


def test_export_quantized_roundtrip(tmp_path):
    """save_llama_ggjt with q4_0 -> reload -> dequantized weights close."""
    import jax

    from llama_cpp_q_4_0_tpu.formats.export import save_llama_ggjt
    from llama_cpp_q_4_0_tpu.formats.fixtures import _fake_vocab
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.config import ModelConfig
    from llama_cpp_q_4_0_tpu.models.loading import load_transformer
    from llama_cpp_q_4_0_tpu.training import init_transformer

    cfg = ModelConfig.llama(n_vocab=256, n_embd=64, n_mult=32, n_head=4,
                            n_layer=1, n_rot=16, n_ctx=32)
    params = init_transformer(cfg, jax.random.key(0))
    out = str(tmp_path / "exp.bin")
    save_llama_ggjt(out, cfg, params, _fake_vocab(256), qtype=GGMLType.Q4_0)
    gf = read_ggjt(out, "llama")
    p2 = load_transformer(gf, cfg, fuse=False)
    a = np.asarray(params.blocks[0].wq)
    b = np.asarray(p2.blocks[0].wq.dequantize())
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 0.01, rmse


def test_benchmark_matmult_cli(capsys):
    from llama_cpp_q_4_0_tpu.cli import benchmark as bm

    rc = bm.main(["-i", "2", "--sizex", "256", "--sizey", "256",
                  "--sizez", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "GFLOPS" in out and "speedup" in out


def test_gptq_dense_roundtrip():
    """gptq_dense inverts a synthetic GPTQ packing exactly
    (GPTQForLLaMaQuantizedTensor semantics, convert.py:277-508)."""
    from llama_cpp_q_4_0_tpu.formats.convert_hf import gptq_dense, resolve_gptq

    rng = np.random.default_rng(0)
    out_d, in_d, gs = 8, 64, 32
    groups = in_d // gs
    q = rng.integers(0, 16, (out_d, in_d)).astype(np.uint8)
    scales = rng.uniform(0.01, 0.1, (groups, out_d)).astype(np.float32)
    qz = rng.integers(0, 15, (groups, out_d)).astype(np.uint8)

    want = np.empty((out_d, in_d), np.float32)
    for o in range(out_d):
        for i in range(in_d):
            g = i // gs
            want[o, i] = (q[o, i] * scales[g, o]
                          - (qz[g, o] + 1.0) * scales[g, o])

    def pack(nibs):  # [R, C] nibbles -> int32 [R, C/8], value j at bits 4j
        r, c = nibs.shape
        u32 = np.zeros((r, c // 8), np.uint32)
        for j in range(8):
            u32 |= nibs[:, j::8].astype(np.uint32) << (4 * j)
        return u32.view(np.int32)

    # qweight packs along the INPUT dim -> [in/8, out]; qzeros along the
    # OUTPUT dim -> [groups, out/8]
    qweight = pack(q).T.copy()
    qzeros = pack(qz)

    got = gptq_dense(qweight, scales, qzeros=qzeros)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # g_idx variant (acts like the contiguous grouping here)
    g_idx = np.repeat(np.arange(groups, dtype=np.int32), gs)
    got2 = gptq_dense(qweight, scales, qzeros=qzeros, g_idx=g_idx)
    np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-6)

    # resolve_gptq rewrites the group into a dense .weight
    sd = {"model.layers.0.self_attn.q_proj.qweight": qweight,
          "model.layers.0.self_attn.q_proj.qzeros": qzeros,
          "model.layers.0.self_attn.q_proj.scales": scales,
          "model.layers.0.self_attn.q_proj.bias": np.zeros(out_d, np.float32),
          "other.weight": np.ones((2, 2), np.float32)}
    sd = resolve_gptq(sd)
    assert set(sd) == {"model.layers.0.self_attn.q_proj.weight",
                       "other.weight"}
    np.testing.assert_allclose(
        sd["model.layers.0.self_attn.q_proj.weight"], want, atol=1e-6)


def test_lazy_state_dict_safetensors(tmp_path):
    """LazyStateDict over safetensors shards: per-tensor lazy reads, shard
    merging, f16->f32 promotion, int dtypes preserved (the reference
    convert.py LazyModel analogue, convert.py:420-610)."""
    from safetensors.numpy import save_file

    from llama_cpp_q_4_0_tpu.formats.convert_hf import load_state_dict

    d = tmp_path / "hf"
    d.mkdir()
    a = np.arange(12, dtype=np.float16).reshape(3, 4)
    b = np.arange(6, dtype=np.int32).reshape(2, 3)
    c = np.ones((2, 2), np.float32) * 3
    save_file({"a": a, "b": b}, str(d / "model-00001.safetensors"))
    save_file({"c": c}, str(d / "model-00002.safetensors"))

    sd = load_state_dict(str(d))
    assert set(sd.keys()) == {"a", "b", "c"} and len(sd) == 3
    assert "a" in sd and "nope" not in sd
    assert sd["a"].dtype == np.float32  # promoted
    np.testing.assert_allclose(sd["a"], a.astype(np.float32))
    assert sd["b"].dtype == np.int32  # ints intact (GPTQ qweight contract)
    np.testing.assert_array_equal(sd["b"], b)
    got = dict(sd.items())
    np.testing.assert_allclose(got["c"], c)


def test_lazy_state_dict_gptq_synthesis(tmp_path):
    """GPTQ groups inside a torch checkpoint surface as a synthesized dense
    {base}.weight; the raw qweight/qzeros/scales/bias names are hidden."""
    torch = pytest.importorskip("torch")
    from llama_cpp_q_4_0_tpu.formats.convert_hf import (gptq_dense,
                                                        load_state_dict)

    rng = np.random.default_rng(1)
    out_d, in_d, gs = 8, 64, 32
    groups = in_d // gs
    q = rng.integers(0, 16, (out_d, in_d)).astype(np.uint8)
    scales = rng.uniform(0.01, 0.1, (groups, out_d)).astype(np.float32)
    qz = rng.integers(0, 15, (groups, out_d)).astype(np.uint8)

    def pack(nibs):
        r, c = nibs.shape
        u32 = np.zeros((r, c // 8), np.uint32)
        for j in range(8):
            u32 |= nibs[:, j::8].astype(np.uint32) << (4 * j)
        return u32.view(np.int32)

    qweight = pack(q).T.copy()
    qzeros = pack(qz)
    want = gptq_dense(qweight, scales, qzeros=qzeros)

    d = tmp_path / "hf"
    d.mkdir()
    base = "model.layers.0.self_attn.q_proj"
    torch.save({base + ".qweight": torch.from_numpy(qweight),
                base + ".qzeros": torch.from_numpy(qzeros),
                base + ".scales": torch.from_numpy(scales),
                base + ".bias": torch.zeros(out_d),
                "other.weight": torch.ones(2, 2)},
               str(d / "pytorch_model.bin"))

    sd = load_state_dict(str(d))
    assert set(sd.keys()) == {base + ".weight", "other.weight"}
    np.testing.assert_allclose(sd[base + ".weight"], want, atol=1e-6)


def test_convert_outtype_q4_and_vocab_only(tmp_path):
    """convert.py parity extras: --outtype q4_0 quantizes 2-D weights at
    conversion time (GGMLFileType.MostlyQ4_0, 1-D stays f32) and
    --vocab-only writes a weightless ggjt v1 vocab file
    (convert.py:997-1004)."""
    torch = pytest.importorskip("torch")
    import numpy as np

    from llama_cpp_q_4_0_tpu.formats.convert_hf import (convert_llama,
                                                        write_vocab_only)
    from llama_cpp_q_4_0_tpu.formats.fixtures import _fake_vocab
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.quant.types import GGMLType, LlamaFType
    from llama_cpp_q_4_0_tpu.runtime.context import Context

    e, heads, layers, ff, v = 64, 4, 2, 192, 300
    d = tmp_path / "hf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(
        {"model_type": "llama", "hidden_size": e,
         "num_attention_heads": heads, "num_hidden_layers": layers,
         "vocab_size": v, "intermediate_size": ff}))
    g = torch.Generator().manual_seed(3)
    sd = {"model.embed_tokens.weight": torch.randn(v, e, generator=g),
          "model.norm.weight": torch.ones(e),
          "lm_head.weight": torch.randn(v, e, generator=g)}
    for i in range(layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.ones(e)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(e)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{nm}.weight"] = \
                torch.randn(e, e, generator=g) * 0.05
        sd[p + "mlp.gate_proj.weight"] = torch.randn(ff, e, generator=g) * 0.05
        sd[p + "mlp.down_proj.weight"] = torch.randn(e, ff, generator=g) * 0.05
        sd[p + "mlp.up_proj.weight"] = torch.randn(ff, e, generator=g) * 0.05
    torch.save(sd, str(d / "pytorch_model.bin"))

    out = str(tmp_path / "q4.bin")
    convert_llama(str(d), out, vocab=_fake_vocab(v), outtype="q4_0")
    gf = read_ggjt(out, "llama")
    assert gf.ftype == int(LlamaFType.MOSTLY_Q4_0)
    assert gf.tensors["layers.0.attention.wq.weight"].qtype == GGMLType.Q4_0
    assert gf.tensors["tok_embeddings.weight"].qtype == GGMLType.Q4_0
    assert gf.tensors["norm.weight"].qtype == GGMLType.F32  # 1-D stays f32
    cfg = config_from_ggjt(gf, n_ctx=32)
    ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=32)
    logits = ctx.eval(np.asarray([[1, 5, 9]], np.int32))
    assert np.isfinite(np.asarray(logits)).all()

    vout = str(tmp_path / "vocab.bin")
    write_vocab_only(vout, _fake_vocab(v))
    gfv = read_ggjt(vout, "llama")
    assert len(gfv.vocab) == v
    assert not gfv.tensors
    assert gfv.hparams["n_embd"] == 0 and gfv.hparams["n_layer"] == 0
