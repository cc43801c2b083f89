"""CPU-side hardware-queue preflight (VERDICT r4 #5).

For every entry in a hw-validate queue shell script (its
`run <name> <timeout> [env K=V ...] python <script> ...` lines), walk the
shapes that will reach `pallas_call` on the chip — engine admission
routing (batched vs chunked-lane), per-kernel scoped-VMEM plans for the
7B q4_0 matmul set, and the engine HBM plan — and FAIL LOCALLY if any
guard would trip.  Three multi-hour round-4 chip failures were all
computable in milliseconds on the host:

  - a 16x1900 batched admission flattened to a b=32768 qmm whose remote
    compile ground 45 min and wedged the tunnel (hw-validate-r4b);
  - hand-tuned q8x blocks sent a 19.62M-scoped-vmem kernel (> 16M) and
    every tune-q8x-prefill variant died rc=1 (hw-validate-r4c);
  - 16 slots x 2048 ctx bf16 KV = 17.2 GiB > 15.75 GiB HBM
    RESOURCE_EXHAUSTED'd engine-long (hw-validate-r4c).

The models are the SAME functions the runtime uses (packed_vmem_bytes /
packed_block_plan / q8x_plan from ops, the estimate_engine_hbm arithmetic,
the admission-routing rule from runtime/batch_engine._admit), so the
preflight cannot drift from the code it vets.  No reference counterpart —
the reference has no remote device to wedge; this is TPU-native
operational tooling.

Usage:
  python scripts/preflight.py scripts/hw-validate-r5.sh   # vet a queue
  python scripts/preflight.py --self-test                 # poisoned config
Exit 0 = every entry safe; exit 1 = violations printed.
"""
from __future__ import annotations

import os
import re
import shlex
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ----------------------------------------------------------------- device

V5E_HBM = int(15.75 * 2**30)  # measured bytes_limit on this chip
SCOPED_VMEM = 16 * 2**20
HBM_PLAN_FRACTION = 0.85      # runtime/batch_engine._HBM_PLAN_FRACTION

# 7B q4_0 post-fuse matmul set (bench.build_llama + models/fuse.py):
# (n, k, per-model count).  k2p = K/2 padded to 256 (QTensor packing).
LLAMA7B_SHAPES = [
    (12288, 4096, 32),   # fused qkv
    (4096, 4096, 32),    # wo
    (22016, 4096, 32),   # fused gate|up
    (4096, 11008, 32),   # down
    (32000, 4096, 2),    # tok_embeddings + output head
]
N_LAYER, KV_HEADS, HEAD_DIM = 32, 32, 128


def _k2p(k: int) -> int:
    return -(-(k // 2) // 256) * 256


def llama7b_weight_bytes(folded: bool = False,
                         f16_scales: bool = False) -> int:
    """Packed levels + lo/hi scale planes (+ gbias planes when the
    zero-folded decode view is materialized; split views share
    levels/scales, so 'folded' ADDS only gbias)."""
    total = 0
    s_item = 2 if f16_scales else 4
    for n, k, cnt in LLAMA7B_SHAPES:
        k2p = _k2p(k)
        planes = 2 * (k2p // 32) * n
        total += cnt * (k2p * n + planes * s_item
                        + (planes * s_item if folded else 0))
    return total


def engine_kv_bytes(n_slots: int, n_ctx: int, q8: bool) -> int:
    """Mirrors runtime/batch_engine.estimate_engine_hbm."""
    per = n_slots * n_ctx * KV_HEADS * N_LAYER
    kv = 2 * per * HEAD_DIM * (1 if q8 else 2)
    if q8:
        kv += 2 * per * 4  # QuantKV f32 scale planes
    return kv


# ------------------------------------------------------------- admission

PREFILL_CHUNK = 512    # BatchEngine.prefill_chunk
MAX_ROWS = 2048        # ops/qmatmul.MAX_PALLAS_ROWS


def _bucket(t: int) -> int:
    from llama_cpp_q_4_0_tpu.runtime.context import PREFILL_BUCKETS

    for b in PREFILL_BUCKETS:
        if t <= b:
            return b
    return ((t + 2047) // 2048) * 2048


def admission_row_counts(n_slots: int, n_ctx: int, prompt_len: int,
                         chunk: int) -> list[int]:
    """Every flattened x-row count the engine's admission + steady state
    will emit for a same-length burst, per the _admit routing rule
    (runtime/batch_engine.py): long prompts (> prefill_chunk) serialize
    through the chunked lane; short bursts batch under MAX_ROWS, else
    per-slot."""
    plen = min(prompt_len, n_ctx - 1)
    rows = []
    if plen > PREFILL_CHUNK:
        # chunked lane: [K, bucket(chunk)] lockstep cohort steps
        # (K <= LANE_WIDTH, default 4)
        lane_w = int(os.environ.get("LANE_WIDTH", "4"))
        rows.append(min(lane_w, n_slots) * _bucket(min(PREFILL_CHUNK, plen)))
    else:
        mp = 1
        while mp < n_slots:
            mp *= 2
        pad = min(_bucket(plen), n_ctx)
        if mp * pad <= MAX_ROWS:
            rows.append(mp * pad)        # batched admission
        else:
            rows.append(pad)             # per-slot direct prefill
    rows.append(max(1, n_slots * chunk))  # steady-state decode tick
    return rows


# --------------------------------------------------------------- checks


def check_engine(env: dict, name: str) -> list[str]:
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import q8x_plan
    from llama_cpp_q_4_0_tpu.ops.qmatmul import packed_block_plan

    slots = int(env.get("SLOTS", "16"))
    n_ctx = int(env.get("N_CTX", "512"))
    plen = int(env.get("PROMPT_LEN", "16"))
    chunk = int(env.get("CHUNK", "8"))
    cache = env.get("CACHE", "bf16")
    bad = []

    # 1. HBM plan (weights use the raw view: the engine's budget-aware
    # fold drop reverts to it within 20% of HBM, so the raw view is the
    # binding floor — if even that fails, the run will refuse/OOM)
    weights = llama7b_weight_bytes(folded=False,
                                   f16_scales=bool(env.get("QMM_F16_SCALES")))
    kv = engine_kv_bytes(slots, n_ctx, q8=(cache == "q8"))
    budget = int(V5E_HBM * HBM_PLAN_FRACTION)
    if weights + kv > budget:
        bad.append(
            f"{name}: HBM plan {(weights + kv) / 2**30:.2f} GiB "
            f"(weights {weights / 2**30:.2f} + KV {kv / 2**30:.2f}, "
            f"{slots}x{n_ctx} {cache}) > {budget / 2**30:.2f} GiB budget — "
            f"the engine will refuse or OOM")

    # 2+3. admission flatten rows + per-kernel scoped-VMEM plans
    for rows in admission_row_counts(slots, n_ctx, plen, chunk):
        if rows > MAX_ROWS:
            bad.append(f"{name}: admission emits b={rows} > "
                       f"MAX_PALLAS_ROWS={MAX_ROWS} (45-min-compile class)")
            continue
        for n, k, _ in LLAMA7B_SHAPES:
            k2p = _k2p(k)
            bk, bn, vmem = packed_block_plan(rows, k2p, n, 32)
            if vmem > 0.9 * SCOPED_VMEM:
                bad.append(
                    f"{name}: packed qmm b={rows} shape=({n},{k}) "
                    f"bk={bk} bn={bn} vmem {vmem / 2**20:.2f}M > "
                    f"{0.9 * SCOPED_VMEM / 2**20:.1f}M")
            if env.get("QMM_Q8X") and rows <= int(
                    env.get("QMM_Q8X_MAX_B", "128")):
                bk, bn, vmem, _res = q8x_plan(rows, k2p, n, 32, 256, 2048)
                if vmem > 0.9 * SCOPED_VMEM:
                    bad.append(
                        f"{name}: q8x qmm b={rows} shape=({n},{k}) "
                        f"bk={bk} bn={bn} vmem {vmem / 2**20:.2f}M > "
                        f"{0.9 * SCOPED_VMEM / 2**20:.1f}M")
    return bad


def check_bench(env: dict, name: str) -> list[str]:
    """bench.py / tune scripts: decode b=1..8 and prefill b=512 shapes."""
    from llama_cpp_q_4_0_tpu.ops.pallas.qmm import q8x_plan
    from llama_cpp_q_4_0_tpu.ops.qmatmul import packed_block_plan

    bad = []
    q8x_cap = int(env.get("QMM_Q8X_MAX_B", "128")) if env.get("QMM_Q8X") \
        else 0
    for rows in (1, 8, 512):
        for n, k, _ in LLAMA7B_SHAPES:
            k2p = _k2p(k)
            bn_env = int(env.get("QMM_BLOCK_N", "0"))
            bk_env = int(env.get("QMM_BLOCK_K", "0"))
            if bn_env or bk_env:
                from llama_cpp_q_4_0_tpu.ops.qmatmul import packed_vmem_bytes

                bk = bk_env or 2048
                bn = bn_env or (512 if n % 512 == 0 else 256)
                if k2p % bk or n % bn:
                    continue
                vmem = packed_vmem_bytes(rows, bk, bn, 32)
            else:
                bk, bn, vmem = packed_block_plan(rows, k2p, n, 32)
            if vmem > 0.9 * SCOPED_VMEM:
                bad.append(
                    f"{name}: packed qmm b={rows} shape=({n},{k}) bk={bk} "
                    f"bn={bn} vmem {vmem / 2**20:.2f}M (env overrides "
                    f"bypass the dispatch shrink)")
            if q8x_cap and rows <= q8x_cap:
                bk, bn, vmem, _res = q8x_plan(rows, k2p, n, 32, 256, 2048)
                if vmem > 0.9 * SCOPED_VMEM:
                    bad.append(
                        f"{name}: q8x qmm b={rows} shape=({n},{k}) "
                        f"vmem {vmem / 2**20:.2f}M")
    return bad


def check_engine_steady(env: dict, name: str) -> list[str]:
    occs = env.get("OCCUPANCIES", "4,8,16").split(",")
    env = dict(env, SLOTS=str(max(int(x) for x in occs)))
    n_ctx = int(env.get("N_CTX", "2048"))
    n_pred = int(env.get("N_PREDICT", "192"))
    env.setdefault("PROMPT_LEN", str(n_ctx - n_pred - 16))
    env.setdefault("CACHE", "q8")
    return check_engine(env, name)


CHECKERS = {
    "engine-bench.py": check_engine,
    "engine-steady.py": check_engine_steady,
    "bench.py": check_bench,
    "tune-q8x-prefill.py": check_bench,
    "tune-q8x.py": check_bench,
    "tune-prefill.py": check_bench,
    "ab-decode.py": check_bench,
}


# ---------------------------------------------------------------- parser

_RUN_RE = re.compile(r"^\s*run\s+(\S+)\s+(\d+)\s+(.*)$")


def parse_queue(path: str) -> list[tuple[str, dict, str]]:
    """-> [(name, env, script_basename)] for every `run` line."""
    entries = []
    text = open(path).read().replace("\\\n", " ")  # join continuations
    for line in text.splitlines():
        m = _RUN_RE.match(line.split("#")[0].strip())
        if not m:
            continue
        name, _, rest = m.groups()
        toks = shlex.split(rest)
        env = {}
        i = 0
        if toks and toks[0] == "env":
            i = 1
            while i < len(toks) and "=" in toks[i] and not toks[i].startswith("-"):
                k, v = toks[i].split("=", 1)
                env[k] = v
                i += 1
        script = ""
        for t in toks[i:]:
            if t.endswith(".py"):
                script = os.path.basename(t)
                break
        entries.append((name, env, script))
    return entries


def preflight(path: str) -> list[str]:
    bad = []
    entries = parse_queue(path)
    if not entries:
        return [f"{path}: no `run` entries parsed — refusing to vouch"]
    for name, env, script in entries:
        checker = CHECKERS.get(script)
        if checker is None:
            continue  # smoke / pytest / shell steps: no shape model needed
        merged = dict(os.environ, **env)
        bad.extend(checker(merged, name))
    return bad


def self_test() -> int:
    """The preflight must catch each round-4 failure class."""
    # (a) bf16 17.2 GiB KV OOM
    v = check_engine({"SLOTS": "16", "N_CTX": "2048", "PROMPT_LEN": "1900",
                      "CACHE": "bf16"}, "poison-bf16")
    assert any("HBM plan" in x for x in v), v
    # (b) the q8 flagship passes
    v = check_engine({"SLOTS": "16", "N_CTX": "2048", "PROMPT_LEN": "1900",
                      "CACHE": "q8"}, "flagship-q8")
    assert v == [], v
    # (c) q8x prefill b=512 now plans under budget (the r4c 19.62M class)
    v = check_bench({"QMM_Q8X": "1", "QMM_Q8X_MAX_B": "512"}, "q8x-512")
    assert v == [], v
    # (d) a hand-tuned env override that blows VMEM is caught
    v = check_bench({"QMM_BLOCK_N": "512", "QMM_BLOCK_K": "2048"},
                    "poison-blocks")
    assert any("vmem" in x for x in v), v
    print("preflight self-test: all four failure classes covered")
    return 0


def main() -> int:
    if "--self-test" in sys.argv:
        return self_test()
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    bad = []
    for path in sys.argv[1:]:
        bad.extend(preflight(path))
    if bad:
        print("PREFLIGHT FAILED:")
        for x in bad:
            print("  -", x)
        return 1
    print(f"preflight OK: {', '.join(sys.argv[1:])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
