"""End-to-end CLI coverage: every examples/-parity tool driven through its
argv entry point against tiny fixture models (the reference validates these
apps only manually; we gate them in CI)."""

import http.client
import json
import threading

import numpy as np
import pytest

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.quant.types import GGMLType


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "tiny.bin")
    make_llama_ggjt(p, n_vocab=256, n_embd=64, n_head=4, n_layer=2,
                    qtype=GGMLType.Q4_0)
    return p


def test_main_cli(model_path, capsys):
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    rc = main_cli.main(["-m", model_path, "-p", "hello", "-n", "4",
                        "-c", "64", "-s", "1", "--temp", "0.8"])
    assert rc == 0
    out = capsys.readouterr()
    assert "hello" in out.out


def test_main_cli_prompt_cache(model_path, tmp_path, capsys):
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    cache = str(tmp_path / "sess.bin")
    args = ["-m", model_path, "-p", "hello world", "-n", "3", "-c", "64",
            "-s", "1", "--prompt-cache", cache]
    assert main_cli.main(args) == 0
    err1 = capsys.readouterr().err
    assert "session: saved" in err1
    assert main_cli.main(args) == 0
    err2 = capsys.readouterr().err
    assert "session: reused" in err2

    # the saved token list must stay aligned with the KV contents across
    # reuse cycles: run 2 rewound to |prompt|-1 and regenerated, so a
    # stale (untruncated) list would exceed what the cache actually holds
    # (the reference's session_tokens.resize, main.cpp:228) — verify by
    # loading the session and replaying its token list against a fresh
    # context: greedy continuation must match a third reuse run
    import jax.numpy as jnp

    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
    from llama_cpp_q_4_0_tpu.models.loading import (config_from_ggjt,
                                                    load_transformer)
    from llama_cpp_q_4_0_tpu.runtime.context import Context
    from llama_cpp_q_4_0_tpu.runtime.session import load_session

    gf = read_ggjt(model_path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=64)
    ctx = Context(cfg, load_transformer(gf, cfg), n_ctx=64)
    toks = load_session(cache, ctx)
    assert ctx.n_past == len(toks)  # alignment invariant
    # rewind + re-eval the last token (the reuse path): the logits must
    # equal a from-scratch replay of the stored list — only true when the
    # list matches the cache contents slot-for-slot
    ctx.n_past = len(toks) - 1
    got = np.asarray(ctx.eval(np.asarray([[toks[-1]]], np.int32)))
    fresh = Context(cfg, load_transformer(gf, cfg), n_ctx=64)
    fresh.eval(np.asarray([toks[:-1]], np.int32))
    want = np.asarray(fresh.eval(np.asarray([[toks[-1]]], np.int32)))
    np.testing.assert_allclose(got[0, -1], want[0, -1], rtol=2e-4,
                               atol=2e-4)


def test_quantize_cli(model_path, tmp_path, capsys):
    from llama_cpp_q_4_0_tpu.cli import quantize as quantize_cli
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt as mk

    f32 = str(tmp_path / "f32.bin")
    mk(f32, n_vocab=256, n_embd=64, n_head=4, n_layer=2, qtype=GGMLType.F32)
    out = str(tmp_path / "q5.bin")
    assert quantize_cli.main([f32, out, "q5_1"]) == 0

    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt

    gf = read_ggjt(out, "llama")
    assert gf.tensors["layers.0.attention.wq.weight"].qtype == GGMLType.Q5_1

    assert quantize_cli.main([f32, out, "nope"]) == 1


def test_perplexity_cli(model_path, tmp_path, capsys):
    from llama_cpp_q_4_0_tpu.cli import perplexity as ppl_cli

    txt = str(tmp_path / "corpus.txt")
    with open(txt, "w") as f:
        f.write("the quick brown fox jumps over the lazy dog. " * 40)
    rc = ppl_cli.main(["-m", model_path, "-f", txt, "-c", "32", "-b", "32"])
    assert rc == 0
    assert "PPL =" in capsys.readouterr().out


def test_embedding_cli(model_path, capsys):
    from llama_cpp_q_4_0_tpu.cli import embedding as emb_cli

    rc = emb_cli.main(["-m", model_path, "-p", "hello", "-c", "64"])
    assert rc == 0
    vals = capsys.readouterr().out.splitlines()[0].split()
    assert len(vals) == 64 and all(np.isfinite(float(v)) for v in vals)


def test_empty_prompt_starts_from_bos(model_path, capsys):
    """Empty text tokenizes to NOTHING (llama.cpp:1788-1790); every entry
    point must fall back to a bare BOS (main.cpp:345) instead of evaluating
    a zero-token batch and sampling padded-slot logits."""
    import llama_cpp_q_4_0_tpu.cli.main as main_cli
    from llama_cpp_q_4_0_tpu.cli import embedding as emb_cli

    rc = main_cli.main(["-m", model_path, "-p", "", "-n", "3", "-c", "64",
                        "-s", "1", "--temp", "-1"])
    assert rc == 0
    capsys.readouterr()
    rc = emb_cli.main(["-m", model_path, "-p", "", "-c", "64"])
    assert rc == 0
    vals = capsys.readouterr().out.splitlines()[0].split()
    assert len(vals) == 64 and all(np.isfinite(float(v)) for v in vals)

    # library surface: generate_text("") == generate over [BOS]
    import llama_cpp_q_4_0_tpu as pkg
    from llama_cpp_q_4_0_tpu.runtime.generate import (
        GenerateParams, generate, generate_text,
    )
    from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
    from llama_cpp_q_4_0_tpu.runtime.tokenizer import TOKEN_BOS

    ctx, tok = pkg.load(model_path, n_ctx=64)
    gp = GenerateParams(n_predict=4, sampling=SamplingParams(temp=-1.0),
                        seed=1)
    txt = generate_text(ctx, tok, "", gp)
    ctx.reset()
    want = tok.detokenize(
        list(generate(ctx, [TOKEN_BOS], gp))).decode(errors="replace")
    assert txt == want


def test_save_load_state_cli(model_path, capsys):
    from llama_cpp_q_4_0_tpu.cli import save_load_state as sls

    rc = sls.main(["-m", model_path, "-p", "hello", "-n", "6", "-c", "64"])
    assert rc == 0
    assert "identical" in capsys.readouterr().out


def test_quantize_stats_cli(model_path, tmp_path, capsys):
    from llama_cpp_q_4_0_tpu.cli import quantize_stats as qs
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt as mk

    f32 = str(tmp_path / "f32.bin")
    mk(f32, n_vocab=256, n_embd=256, n_head=4, n_layer=1, qtype=GGMLType.F32)
    rc = qs.main(["-m", f32, "-t", "q4_0", "-t", "q8_0",
                  "-l", "attention", "-p"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Q4_0" in out and "rmse" in out


def test_tool_dispatcher(capsys):
    from llama_cpp_q_4_0_tpu import cli

    assert cli.dispatch(["--help"]) == 0
    assert "perplexity" in capsys.readouterr().out
    assert cli.dispatch(["no-such-tool"]) == 1


def test_server_endpoints(model_path):
    from http.server import ThreadingHTTPServer

    from llama_cpp_q_4_0_tpu.cli.server import ServerState, make_handler
    from llama_cpp_q_4_0_tpu.cli.common import load_model

    class A:  # minimal args namespace
        model, arch, n_ctx, n_batch = model_path, None, 64, 64
        lora = lora_base = None
        memory_f32 = False

    lm = load_model(A())
    state = ServerState(lm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        def post(path, obj):
            conn.request("POST", path, json.dumps(obj),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, r.read()

        st, body = post("/tokenize", {"content": "hello world"})
        assert st == 200
        toks = json.loads(body)["tokens"]
        assert toks and all(isinstance(t, int) for t in toks)

        st, body = post("/completion",
                        {"prompt": "hello", "n_predict": 4, "seed": 3})
        assert st == 200
        res = json.loads(body)
        assert "content" in res and res["tokens_predicted"] <= 4

        st, body = post("/embedding", {"content": "hello"})
        assert st == 200
        emb = json.loads(body)["embedding"]
        assert len(emb) == 64

        st, body = post("/nope", {})
        assert st == 404

        # streaming returns SSE chunks
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn2.request("POST", "/completion",
                      json.dumps({"prompt": "hi", "n_predict": 2,
                                  "stream": True}),
                      {"Content-Type": "application/json"})
        r = conn2.getresponse()
        assert r.status == 200
        assert "text/event-stream" in r.getheader("Content-Type", "")
        raw = r.read().decode()
        assert '"stop": true' in raw
    finally:
        httpd.shutdown()


def test_server_openai_endpoints(model_path):
    """The OpenAI-compatible surface: /v1/models, /v1/completions (plain +
    SSE with [DONE]), /v1/chat/completions with usage accounting."""
    from http.server import ThreadingHTTPServer

    from llama_cpp_q_4_0_tpu.cli.common import load_model
    from llama_cpp_q_4_0_tpu.cli.server import ServerState, make_handler

    class A:
        model, arch, n_ctx, n_batch = model_path, None, 64, 64
        lora = lora_base = None
        memory_f32 = False

    lm = load_model(A())
    state = ServerState(lm, model_id="tiny.ggjt")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        conn.request("GET", "/v1/models")
        r = conn.getresponse()
        assert r.status == 200
        models = json.loads(r.read())
        assert models["data"][0]["id"] == "tiny.ggjt"

        def post(path, obj):
            conn.request("POST", path, json.dumps(obj),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, r.read()

        st, body = post("/v1/completions",
                        {"prompt": "hello", "max_tokens": 4, "seed": 3,
                         "temperature": 0.8})
        assert st == 200
        res = json.loads(body)
        assert res["object"] == "text_completion"
        assert res["choices"][0]["finish_reason"] in ("stop", "length")
        assert isinstance(res["choices"][0]["text"], str)
        u = res["usage"]
        assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
        assert u["completion_tokens"] <= 4

        st, body = post("/v1/chat/completions",
                        {"messages": [
                            {"role": "system", "content": "Be brief."},
                            {"role": "user", "content": "hi"}],
                         "max_tokens": 4, "seed": 1})
        assert st == 200
        res = json.loads(body)
        assert res["object"] == "chat.completion"
        msg = res["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)

        # streaming: role chunk first, deltas, then [DONE]
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn2.request("POST", "/v1/chat/completions",
                      json.dumps({"messages": [{"role": "user",
                                                "content": "hi"}],
                                  "max_tokens": 3, "stream": True}),
                      {"Content-Type": "application/json"})
        r = conn2.getresponse()
        assert r.status == 200
        assert "text/event-stream" in r.getheader("Content-Type", "")
        raw = r.read().decode()
        assert '"delta": {"role": "assistant"}' in raw
        assert "chat.completion.chunk" in raw
        assert raw.rstrip().endswith("data: [DONE]")
    finally:
        httpd.shutdown()


def test_toplevel_load_api(model_path):
    import llama_cpp_q_4_0_tpu as pkg

    ctx, tok = pkg.load(model_path, n_ctx=64)
    ids = tok.tokenize("hi", bos=True)
    logits = ctx.eval(np.asarray([ids], np.int32))
    assert np.isfinite(logits).all()


def test_quantize_cli_kquant(tmp_path):
    """k-quant ftype through the CLI exercises the layer-type rules
    (output.weight -> Q6_K etc., llama.cpp:2404-2440)."""
    from llama_cpp_q_4_0_tpu.cli import quantize as quantize_cli
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt as mk
    from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt

    f32 = str(tmp_path / "f32.bin")
    mk(f32, n_vocab=256, n_embd=256, n_mult=256, n_head=4, n_layer=2,
       qtype=GGMLType.F32)
    out = str(tmp_path / "q4k.bin")
    assert quantize_cli.main([f32, out, "q4_k_m"]) == 0
    gf = read_ggjt(out, "llama")
    assert gf.tensors["output.weight"].qtype == GGMLType.Q6_K
    assert gf.tensors["layers.0.attention.wq.weight"].qtype == GGMLType.Q4_K


def test_main_cli_with_lora(model_path, tmp_path):
    """--lora end to end (merge) and --lora-unmerged."""
    import llama_cpp_q_4_0_tpu.cli.main as main_cli
    from llama_cpp_q_4_0_tpu.formats.ggla import write_ggla

    rng = np.random.default_rng(0)
    tensors = {
        "layers.0.attention.wq.weight.loraA":
            rng.standard_normal((64, 4)).astype(np.float32) * 0.02,
        "layers.0.attention.wq.weight.loraB":
            rng.standard_normal((64, 4)).astype(np.float32) * 0.02,
    }
    ad = str(tmp_path / "a.ggla")
    write_ggla(ad, r=4, alpha=8, tensors=tensors)
    base = ["-m", model_path, "-p", "hi", "-n", "2", "-c", "64", "-s", "1",
            "--lora", ad]
    assert main_cli.main(base) == 0
    assert main_cli.main(base + ["--lora-unmerged"]) == 0


def test_main_cli_speculative(model_path, capsys):
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    rc = main_cli.main(["-m", model_path, "-p", "hello", "-n", "6",
                        "-c", "64", "-s", "1", "--temp", "-1",
                        "--draft", "4"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "speculative:" in err


def test_main_cli_speculative_draft_model(model_path, capsys):
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    rc = main_cli.main(["-m", model_path, "-p", "hello", "-n", "6",
                        "-c", "64", "-s", "1", "--temp", "-1",
                        "--draft", "4", "--draft-model", model_path])
    assert rc == 0
    err = capsys.readouterr().err
    assert "100% drafts accepted" in err


def test_main_cli_speculative_rwkv(tmp_path, capsys):
    """--draft on an RWKV model routes to the recurrent-state spec chunk."""
    import llama_cpp_q_4_0_tpu.cli.main as main_cli
    from llama_cpp_q_4_0_tpu.formats.fixtures import make_rwkv_ggjt

    path = str(tmp_path / "rwkv.ggjt")
    make_rwkv_ggjt(path)
    rc = main_cli.main(["-m", path, "-p", "hello", "-n", "6",
                        "-s", "1", "--temp", "-1", "--draft", "4"])
    assert rc == 0
    assert "speculative:" in capsys.readouterr().err


def test_main_cli_speculative_ondevice(model_path, capsys):
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    rc = main_cli.main(["-m", model_path, "-p", "hello", "-n", "6",
                        "-c", "64", "-s", "1", "--temp", "-1",
                        "--draft", "4", "--ondevice-sampling"])
    assert rc == 0
    assert "speculative:" in capsys.readouterr().err


def test_main_cli_speculative_draft_model_ondevice(model_path, capsys):
    import llama_cpp_q_4_0_tpu.cli.main as main_cli

    rc = main_cli.main(["-m", model_path, "-p", "hello", "-n", "6",
                        "-c", "64", "-s", "1", "--temp", "-1",
                        "--draft", "3", "--draft-model", model_path,
                        "--ondevice-sampling"])
    assert rc == 0
    assert "speculative:" in capsys.readouterr().err
