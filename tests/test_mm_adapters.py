"""Named multimodal adapters (examples/embd-input/{llava,minigpt4,panda_gpt}.py):
projector checkpoint key layouts, prompt/token protocols, stop-string
generation — driven with synthetic projector weights and stub encoders
(the vision towers themselves are not downloadable here)."""

import numpy as np
import pytest
import torch

from llama_cpp_q_4_0_tpu.formats.fixtures import make_llama_ggjt
from llama_cpp_q_4_0_tpu.formats.ggjt import read_ggjt
from llama_cpp_q_4_0_tpu.models.loading import config_from_ggjt, load_transformer
from llama_cpp_q_4_0_tpu.runtime.context import Context
from llama_cpp_q_4_0_tpu.runtime.embd_input import EmbdInput, LinearProjector
from llama_cpp_q_4_0_tpu.runtime.mm_adapters import (
    Llava, MiniGPT4, PandaGPT, load_torch_projector)
from llama_cpp_q_4_0_tpu.runtime.sampling import SamplingParams
from llama_cpp_q_4_0_tpu.runtime.tokenizer import Tokenizer, Vocab

VIS_DIM = 16


@pytest.fixture(scope="module")
def loaded(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mm") / "m.bin")
    make_llama_ggjt(path, n_vocab=256, n_embd=64, n_head=4, n_layer=2)
    gf = read_ggjt(path, "llama")
    cfg = config_from_ggjt(gf, n_ctx=512)
    return cfg, load_transformer(gf, cfg), gf


def _fresh(loaded, n_ctx=512):
    cfg, params, gf = loaded
    ctx = Context(cfg, params, n_ctx=n_ctx)
    tok = Tokenizer(Vocab.from_ggjt(gf))
    return ctx, EmbdInput(ctx, tok, SamplingParams(temp=-1.0))


@pytest.fixture(scope="module")
def proj_weights(tmp_path_factory):
    """One synthetic nn.Linear [n_embd=64 x VIS_DIM] saved in each of the
    three reference checkpoint layouts."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((64, VIS_DIM)).astype(np.float32) * 0.1
    b = rng.standard_normal(64).astype(np.float32) * 0.01
    d = tmp_path_factory.mktemp("proj")
    torch.save({"model.mm_projector.weight": torch.from_numpy(w),
                "model.mm_projector.bias": torch.from_numpy(b)},
               d / "llava.pth")
    torch.save({"model": {"llama_proj.weight": torch.from_numpy(w),
                          "llama_proj.bias": torch.from_numpy(b)}},
               d / "minigpt4.pth")
    torch.save({"llama_proj.weight": torch.from_numpy(w),
                "llama_proj.bias": torch.from_numpy(b)},
               d / "panda.pth")
    return d, w, b


def test_load_torch_projector_layouts(proj_weights):
    """Each adapter's load_projection must read its reference key layout
    (llava.py:24-28, minigpt4.py:101-105, panda_gpt.py:28-32)."""
    d, w, b = proj_weights
    feats = np.random.default_rng(1).standard_normal((5, VIS_DIM)).astype(np.float32)
    want = feats @ w.T + b
    for fname, loader in [
        ("llava.pth", lambda p: load_torch_projector(
            p, "model.mm_projector.weight", "model.mm_projector.bias")),
        ("minigpt4.pth", lambda p: load_torch_projector(
            p, "llama_proj.weight", "llama_proj.bias", root_key="model")),
        ("panda.pth", lambda p: load_torch_projector(
            p, "llama_proj.weight", "llama_proj.bias")),
    ]:
        proj = loader(str(d / fname))
        np.testing.assert_allclose(proj(feats), want, rtol=1e-6, atol=1e-6)


def test_llava_protocol(loaded, proj_weights):
    """chat_with_image consumes user-prefix + im_start + patches + im_patch
    padding + im_end + question + assistant-prefix before generating
    (llava.py:43-52)."""
    d, w, b = proj_weights
    ctx, model = _fresh(loaded)
    n_patches, image_token_len = 3, 8
    encoder_calls = []

    def encoder(image):
        encoder_calls.append(image)
        return np.full((n_patches, VIS_DIM), 0.25, np.float32)

    lv = Llava(model, encoder, image_token_len=image_token_len,
               im_patch=250, im_start=251, im_end=252)
    lv.load_projection(str(d / "llava.pth"))

    tok = model.tokenizer
    n_text = (len(tok.tokenize("user: ")) + len(tok.tokenize("q"))
              + len(tok.tokenize("\nassistant: ")))
    n_prompt = n_text + 1 + n_patches + (image_token_len - n_patches) + 1

    out = lv.chat_with_image("IMG", "q", n_predict=4)
    assert encoder_calls == ["IMG"]
    assert isinstance(out, str)
    # n_past advanced by the full protocol plus one eval per sampled token;
    # _last_tokens excludes the n_patches raw-embedding rows (no token ids)
    n_gen = len(model._last_tokens) - (n_prompt - n_patches)
    assert ctx.n_past == n_prompt + n_gen and 0 <= n_gen <= 4
    # the image markers landed in the transcript in order (the transcript
    # holds im_start, the im_patch padding, im_end — not the embd rows)
    ids = model._last_tokens
    i_start = ids.index(251)
    n_pad = image_token_len - n_patches
    assert ids[i_start + 1: i_start + 1 + n_pad] == [250] * n_pad
    assert ids[i_start + 1 + n_pad] == 252


def test_llava_text_only_chat(loaded, proj_weights):
    ctx, model = _fresh(loaded)
    lv = Llava(model)
    out = lv.chat("hello", n_predict=3)
    assert isinstance(out, str) and ctx.n_past > 0


def test_minigpt4_protocol(loaded, proj_weights):
    """System prompt primes the context at construction (minigpt4.py:70-73);
    chat_with_image wraps the Q-Former span in <Img></Img>."""
    d, w, b = proj_weights
    ctx, model = _fresh(loaded)
    mg = MiniGPT4(model, lambda img: np.full((4, VIS_DIM), 0.5, np.float32))
    assert ctx.n_past > 0  # system prompt already evaluated
    n_sys = ctx.n_past
    mg.load_projection(str(d / "minigpt4.pth"))
    out = mg.chat_with_image("IMG", "what?", n_predict=3)
    assert isinstance(out, str) and ctx.n_past > n_sys + 4


def test_pandagpt_multimodal(loaded, proj_weights):
    """Multiple modalities in one turn, fixed order, stateful ### chat
    (panda_gpt.py:36-63)."""
    d, w, b = proj_weights
    ctx, model = _fresh(loaded)
    seen = []
    enc = {
        "image": lambda paths: (seen.append(("image", tuple(paths))),
                                np.full((2, VIS_DIM), 0.1, np.float32))[1],
        "audio": lambda paths: (seen.append(("audio", tuple(paths))),
                                np.full((3, VIS_DIM), 0.2, np.float32))[1],
    }
    pg = PandaGPT(model, enc)
    pg.load_projection(str(d / "panda.pth"))
    out = pg.chat_with_image(
        {"image_paths": ["a.png"], "audio_paths": ["b.wav"]}, "q", n_predict=3)
    assert seen == [("image", ("a.png",)), ("audio", ("b.wav",))]
    assert pg.generated_text == out
    n1 = ctx.n_past
    pg.chat("followup", n_predict=2)  # second turn reuses the same context
    assert ctx.n_past > n1


def test_generate_text_stop_string(loaded):
    """generate_text(end=...) stops as soon as the decoded suffix matches
    (embd_input.py:42-49)."""
    _, model = _fresh(loaded)

    hash_id = None
    for i in range(256):
        if model.tokenizer.detokenize([i]) == b"#":
            hash_id = i
            break
    if hash_id is None:
        pytest.skip("fixture vocab has no '#' piece")
    model.generate = lambda n: iter([5, hash_id, hash_id, hash_id, 6, 7])
    out = model.generate_text(10, end="###")
    want = model.tokenizer.detokenize([5, hash_id, hash_id, hash_id])
    assert out == want.decode("utf-8", errors="replace")  # 6,7 never consumed
