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
