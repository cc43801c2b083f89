"""The full sampling chain (llama.cpp:1804-2209, 12 public functions).

Operates on a Candidates array (the llama_token_data_array analogue) with
numpy on host — sampling is O(n_vocab) and latency-trivial next to the
device forward pass, and host-side logic keeps data-dependent control flow
(truncation sets, mirostat state) out of XLA graphs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Candidates:
    """llama_token_data_array: parallel (id, logit, p) arrays + sorted flag."""

    ids: np.ndarray  # int32 [size]
    logits: np.ndarray  # float32 [size]
    p: np.ndarray = None  # float32 [size]
    sorted: bool = False

    @staticmethod
    def from_logits(logits: np.ndarray) -> "Candidates":
        logits = np.asarray(logits, dtype=np.float32).reshape(-1)
        return Candidates(np.arange(logits.size, dtype=np.int32), logits.copy())

    @property
    def size(self) -> int:
        return self.ids.size

    def _take(self, order_or_mask):
        self.ids = self.ids[order_or_mask]
        self.logits = self.logits[order_or_mask]
        if self.p is not None:
            self.p = self.p[order_or_mask]


def sample_softmax(c: Candidates) -> None:
    if not c.sorted:
        order = np.argsort(-c.logits, kind="stable")
        c._take(order)
        c.sorted = True
    m = c.logits[0]
    e = np.exp((c.logits - m).astype(np.float32))
    c.p = (e / e.sum()).astype(np.float32)


def sample_top_k(c: Candidates, k: int, min_keep: int = 1) -> None:
    k = max(k, min_keep)
    k = min(k, c.size)
    if not c.sorted:
        order = np.argsort(-c.logits, kind="stable")
        c._take(order)
        c.sorted = True
    c._take(slice(0, k))


def sample_top_p(c: Candidates, p: float, min_keep: int = 1) -> None:
    if p >= 1.0:
        return
    sample_softmax(c)
    cum = np.cumsum(c.p)
    last_idx = c.size
    hit = np.nonzero((cum >= p) & (np.arange(c.size) + 1 >= min_keep))[0]
    if hit.size:
        last_idx = int(hit[0]) + 1
    c._take(slice(0, last_idx))


def sample_tail_free(c: Candidates, z: float, min_keep: int = 1) -> None:
    if z >= 1.0 or c.size <= 2:
        return
    sample_softmax(c)
    first = c.p[:-1] - c.p[1:]
    second = np.abs(first[:-1] - first[1:])
    ssum = second.sum()
    second = second / ssum
    cum = np.cumsum(second)
    last_idx = c.size
    hit = np.nonzero((cum > z) & (np.arange(second.size) >= min_keep))[0]
    if hit.size:
        last_idx = int(hit[0])
    c._take(slice(0, last_idx))


def sample_typical(c: Candidates, p: float, min_keep: int = 1) -> None:
    if p >= 1.0:
        return
    sample_softmax(c)
    with np.errstate(divide="ignore"):
        logp = np.log(c.p)
    entropy = float(-(c.p * logp).sum())
    shifted = np.abs(-logp - entropy)
    indices = np.argsort(shifted, kind="stable")
    cum = np.cumsum(c.p[indices])
    last_idx = indices.size
    hit = np.nonzero((cum > p) & (np.arange(indices.size) >= min_keep - 1))[0]
    if hit.size:
        last_idx = int(hit[0]) + 1
    c._take(indices[:last_idx])
    c.sorted = False


def sample_temperature(c: Candidates, temp: float) -> None:
    c.logits = c.logits / np.float32(temp)


def sample_repetition_penalty(c: Candidates, last_tokens, penalty: float) -> None:
    if len(last_tokens) == 0 or penalty == 1.0:
        return
    mask = np.isin(c.ids, np.asarray(last_tokens, dtype=np.int32))
    neg = c.logits <= 0
    c.logits = np.where(
        mask, np.where(neg, c.logits * penalty, c.logits / penalty), c.logits
    ).astype(np.float32)
    c.sorted = False


def sample_frequency_and_presence_penalties(
    c: Candidates, last_tokens, alpha_frequency: float, alpha_presence: float
) -> None:
    if len(last_tokens) == 0 or (alpha_frequency == 0.0 and alpha_presence == 0.0):
        return
    last = np.asarray(last_tokens, dtype=np.int64)
    counts = np.bincount(last, minlength=int(c.ids.max()) + 2)
    cnt = counts[c.ids]
    c.logits = (
        c.logits - cnt * np.float32(alpha_frequency) - (cnt > 0) * np.float32(alpha_presence)
    ).astype(np.float32)
    c.sorted = False


def sample_logit_bias(c: Candidates, logit_bias: dict[int, float]) -> None:
    """main.cpp applies params.logit_bias before penalties (main.cpp:440s)."""
    if not logit_bias:
        return
    for tid, bias in logit_bias.items():
        if bias == -np.inf or bias <= -1e9:
            c.logits[c.ids == tid] = -np.inf
        else:
            c.logits[c.ids == tid] += bias
    c.sorted = False


def sample_token_greedy(c: Candidates) -> int:
    return int(c.ids[int(np.argmax(c.logits))])


def sample_token(c: Candidates, rng: np.random.Generator) -> int:
    sample_softmax(c)
    probs = c.p / c.p.sum()
    idx = int(rng.choice(c.size, p=probs))
    return int(c.ids[idx])


def sample_token_mirostat(
    c: Candidates, rng: np.random.Generator, tau: float, eta: float, m: int,
    mu: float, n_vocab: int,
) -> tuple[int, float]:
    sample_softmax(c)
    n = min(m - 1, c.size - 1)
    i = np.arange(n, dtype=np.float32)
    t_i = np.log((i + 2) / (i + 1))
    b_i = np.log(c.p[:n] / c.p[1 : n + 1])
    s_hat = float((t_i * b_i).sum() / (t_i * t_i).sum())
    epsilon_hat = s_hat - 1
    k = ((epsilon_hat * (2.0**mu)) / (1 - float(n_vocab) ** (-epsilon_hat))) ** (
        1 / s_hat
    )
    sample_top_k(c, int(k), 1)
    x = sample_token(c, rng)
    x_idx = int(np.nonzero(c.ids == x)[0][0])
    observed_surprise = -np.log2(c.p[x_idx])
    mu = mu - eta * (observed_surprise - tau)
    return x, float(mu)


def sample_token_mirostat_v2(
    c: Candidates, rng: np.random.Generator, tau: float, eta: float, mu: float
) -> tuple[int, float]:
    sample_softmax(c)
    with np.errstate(divide="ignore"):
        surprise = -np.log2(c.p)
    over = np.nonzero(surprise > mu)[0]
    keep = int(over[0]) if over.size else c.size
    if keep == 0:
        keep = 1
    c._take(slice(0, keep))
    sample_softmax(c)
    x = sample_token(c, rng)
    x_idx = int(np.nonzero(c.ids == x)[0][0])
    observed_surprise = -np.log2(c.p[x_idx])
    mu = mu - eta * (observed_surprise - tau)
    return x, float(mu)


@dataclass
class SamplingParams:
    """The sampling knobs of gpt_params (examples/common.h:24-82)."""

    top_k: int = 40
    top_p: float = 0.95
    tfs_z: float = 1.0
    typical_p: float = 1.0
    temp: float = 0.8
    repeat_penalty: float = 1.1
    repeat_last_n: int = 64
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    penalize_nl: bool = True
    logit_bias: dict[int, float] = field(default_factory=dict)


class Sampler:
    """The main.cpp sampling chain (main.cpp:440-560) with mirostat state."""

    def __init__(self, params: SamplingParams, n_vocab: int, seed: int = -1,
                 newline_token: int = 13):
        self.params = params
        self.n_vocab = n_vocab
        self.rng = np.random.default_rng(None if seed < 0 else seed)
        self.mirostat_mu = 2.0 * params.mirostat_tau
        self.newline_token = newline_token

    def sample(self, logits: np.ndarray, last_tokens: list[int]) -> int:
        p = self.params
        c = Candidates.from_logits(logits)
        sample_logit_bias(c, p.logit_bias)
        nl_logit = float(logits[self.newline_token]) if self.newline_token < c.size else 0.0
        last_n = last_tokens[-p.repeat_last_n :] if p.repeat_last_n else []
        sample_repetition_penalty(c, last_n, p.repeat_penalty)
        sample_frequency_and_presence_penalties(
            c, last_n, p.frequency_penalty, p.presence_penalty
        )
        if not p.penalize_nl and self.newline_token < c.size:
            c.logits[c.ids == self.newline_token] = nl_logit

        if p.temp <= 0:
            return sample_token_greedy(c)
        if p.mirostat == 1:
            sample_temperature(c, p.temp)
            tok, self.mirostat_mu = sample_token_mirostat(
                c, self.rng, p.mirostat_tau, p.mirostat_eta, 100,
                self.mirostat_mu, self.n_vocab,
            )
            return tok
        if p.mirostat == 2:
            sample_temperature(c, p.temp)
            tok, self.mirostat_mu = sample_token_mirostat_v2(
                c, self.rng, p.mirostat_tau, p.mirostat_eta, self.mirostat_mu
            )
            return tok
        sample_top_k(c, p.top_k if p.top_k > 0 else self.n_vocab, 1)
        sample_tail_free(c, p.tfs_z, 1)
        sample_typical(c, p.typical_p, 1)
        sample_top_p(c, p.top_p, 1)
        sample_temperature(c, p.temp)
        return sample_token(c, self.rng)
