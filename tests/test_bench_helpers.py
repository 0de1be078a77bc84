"""Pure-function tests for bench.py's scaling-protocol helpers (no Spark).

The CPU-pinning prefix is part of the recorded scaling evidence
(BENCH/BASELINE.md): each emulated executor must own a disjoint fixed-width
core set, and the helper must degrade to "no pinning" rather than produce an
invalid mask when the box is too small or the user opts out.
"""

import importlib.util
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("llmrs_bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pin_prefix_disjoint_sets(bench, monkeypatch):
    monkeypatch.delenv("LLMRS_EMU_PIN", raising=False)
    monkeypatch.setenv("LLMRS_EMU_CORES", "6")
    if not bench.shutil.which("taskset") or (os.cpu_count() or 0) < 24:
        pytest.skip("taskset or cores unavailable")
    seen = set()
    for i in range(4):
        prefix = bench._emu_pin_prefix(i)
        assert prefix[:2] == ["taskset", "-c"]
        lo, hi = map(int, prefix[2].split("-"))
        cores = set(range(lo, hi + 1))
        assert len(cores) == 6
        assert not (cores & seen), "worker core sets must be disjoint"
        seen |= cores


def test_pin_prefix_opt_out(bench, monkeypatch):
    monkeypatch.setenv("LLMRS_EMU_PIN", "0")
    assert bench._emu_pin_prefix(0) == []


def test_pin_prefix_overflow_degrades_to_unpinned(bench, monkeypatch):
    # worker whose window would exceed the box: no pin rather than a bad mask
    monkeypatch.delenv("LLMRS_EMU_PIN", raising=False)
    monkeypatch.setenv("LLMRS_EMU_CORES", str((os.cpu_count() or 8) + 1))
    assert bench._emu_pin_prefix(0) == []


def test_pin_prefix_mask_is_valid_for_current_box(bench, monkeypatch):
    monkeypatch.delenv("LLMRS_EMU_PIN", raising=False)
    monkeypatch.setenv("LLMRS_EMU_CORES", "6")
    prefix = bench._emu_pin_prefix(0)
    if not prefix:
        pytest.skip("pinning unavailable on this box")
    import subprocess

    out = subprocess.run(
        prefix + [sys.executable, "-c",
                  "import os; print(len(os.sched_getaffinity(0)))"],
        capture_output=True, text=True, check=True,
    )
    assert out.stdout.strip() == "6"


def test_cpu_ticks_shape_and_monotonicity(bench):
    a = bench._cpu_ticks()
    b = bench._cpu_ticks()
    # user nice sys idle iowait irq softirq steal (at least 8 fields)
    assert len(a) >= 8
    assert all(y >= x for x, y in zip(a, b)), "tick counters are cumulative"


def test_steal_pct_default_and_range(bench):
    # before any emulation runs the module-level reading is 0; after one it
    # must be a percentage (the recorded raw pairs embed it verbatim)
    assert 0.0 <= bench.LAST_EMU_STEAL_PCT <= 100.0
