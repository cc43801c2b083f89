"""Hardware-queue preflight: the round-4 chip-failure classes must be
caught on the host (VERDICT r4 #5).  The models are the same functions the
runtime dispatch uses (packed_vmem_bytes / packed_block_plan / q8x_plan /
the _admit routing rule), exercised here over the poisoned configs that
each cost hours of round-4 chip time."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import preflight  # noqa: E402


def test_self_test_covers_failure_classes():
    assert preflight.self_test() == 0


def test_bf16_flagship_kv_oom_is_caught():
    v = preflight.check_engine(
        {"SLOTS": "16", "N_CTX": "2048", "PROMPT_LEN": "1900",
         "CACHE": "bf16"}, "poison")
    assert any("HBM plan" in x for x in v)


def test_q8_flagship_passes():
    assert preflight.check_engine(
        {"SLOTS": "16", "N_CTX": "2048", "PROMPT_LEN": "1900",
         "CACHE": "q8"}, "flagship") == []


def test_long_prompts_route_through_chunked_lane():
    """PROMPT_LEN > prefill_chunk never emits a flattened burst matrix —
    the b=32768 45-min-compile class is structurally unreachable; lane
    cohorts flatten to at most LANE_WIDTH x chunk rows (the row cap)."""
    rows = preflight.admission_row_counts(16, 2048, 1900, chunk=8)
    assert all(r <= preflight.MAX_ROWS for r in rows)
    assert max(rows) <= 4 * 512  # lane cohorts, not whole prompts


def test_weight_model_matches_known_footprint():
    """The analytic 7B q4_0 sizer reproduces the measured footprints:
    ~4.2 GB (3.94 GiB) raw, ~+0.85 GB for the folded view's gbias
    planes (NOTES r4)."""
    raw = preflight.llama7b_weight_bytes(folded=False)
    folded = preflight.llama7b_weight_bytes(folded=True)
    assert 4.1e9 < raw < 4.4e9, raw / 1e9
    assert 0.7e9 < folded - raw < 1.0e9, (folded - raw) / 1e9


def test_parses_real_queue_scripts():
    entries = preflight.parse_queue(
        os.path.join(ROOT, "scripts", "hw-validate-r4d.sh"))
    names = [n for n, _, _ in entries]
    assert "engine-long-q8" in names and "bench-flash-bf16" in names
    env = dict(entries[names.index("engine-long-q8")][1])
    assert env["CACHE"] == "q8" and env["N_CTX"] == "2048"


def test_cli_flags_poisoned_queue(tmp_path):
    bad = tmp_path / "poison.sh"
    bad.write_text(
        "run engine-oops 600 env CACHE=bf16 N_CTX=2048 PROMPT_LEN=1900 \\\n"
        "       python scripts/engine-bench.py\n")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "preflight.py"),
         str(bad)], capture_output=True, text=True)
    assert r.returncode == 1 and "HBM plan" in r.stdout


@pytest.mark.parametrize("script", ["hw-validate-r4d.sh"])
def test_cli_passes_good_queue(script):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "preflight.py"),
         os.path.join(ROOT, "scripts", script)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
