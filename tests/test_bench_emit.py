"""Bench capture-protocol tests (no chip needed).

VERDICT r3/r4 weak #1: two consecutive rounds of driver captures failed to
parse the bench headline — r3 by timeout, r4 because the final enriched
JSON line was >10 KB and the driver keeps only a ~2000-char stdout tail.
These tests pin the emit contract: every printed line parses, is compact
(< 1500 chars), carries the headline numbers, and points at the full
detail file; and the LAPACK baseline guard substitutes the recorded clean
baseline when the host is loaded.
"""

import importlib.util
import json
import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, ".."))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # redirect all artifact IO into tmp_path
    monkeypatch.setattr(mod, "_HERE", str(tmp_path))
    os.makedirs(tmp_path / "benchmarks" / "results", exist_ok=True)
    return mod


def _fat_detail():
    """A detail tree the size that broke the r4 capture."""
    return {
        "tpu_compiled": {"driver": "compiled", "walls_s": [3.26, 3.27, 3.28],
                         "best_s": 3.26, "spread_pct": 0.3, "iters": 8,
                         "max_res_inside": 7.3e-12,
                         "compile_cache": "hit (no new cache entries)"},
        "lapack_cpu": {"wall_s": 88.9, "baseline_source": "live (clean host)",
                       "loadavg_at_start": 0.0},
        "huge_aux": {"blob": "x" * 20000,
                     "rows": [{"i": i, "v": i * 0.1} for i in range(400)]},
    }


def test_emit_line_is_compact_and_parseable(bench, capsys):
    bench._emit(3.26, 88.9, _fat_detail())
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = out[-1]
    assert len(line) < 1500
    rec = json.loads(line)
    assert rec["metric"] == "dense_feast_4096_wall_to_1e-10"
    assert rec["value"] == 3.26
    assert rec["unit"] == "s"
    assert abs(rec["vs_baseline"] - 88.9 / 3.26) < 1e-3
    d = rec["detail"]
    assert d["detail_file"] == os.path.join("benchmarks", "results",
                                            "bench_last.json")
    assert d["tpu_walls_s"] == [3.26, 3.27, 3.28]
    assert d["lapack_wall_s"] == 88.9


def test_emit_survives_tail_limited_capture(bench, capsys):
    """The r4 driver kept the last ~2000 chars of stdout.  Simulate that:
    the tail of everything printed must still contain one parseable line."""
    bench._emit(3.26, 88.9, _fat_detail())
    tail = capsys.readouterr().out[-2000:]
    parsed = None
    for line in tail.splitlines():
        try:
            parsed = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    assert parsed is not None and parsed["value"] == 3.26


def test_emit_writes_full_detail_file(bench, capsys, tmp_path):
    detail = _fat_detail()
    bench._emit(3.26, 88.9, detail)
    capsys.readouterr()
    with open(tmp_path / "benchmarks" / "results" / "bench_last.json") as f:
        full = json.load(f)
    assert full["detail"]["huge_aux"]["blob"] == "x" * 20000
    assert full["value"] == 3.26


def test_baseline_guard_substitutes_recorded_on_loaded_host(
        bench, tmp_path, monkeypatch):
    with open(tmp_path / "benchmarks" / "results" /
              "lapack_baseline.json", "w") as f:
        json.dump({"wall_s": 88.9, "loadavg_at_start": 0.0}, f)
    monkeypatch.setattr(os, "getloadavg", lambda: (0.9, 0.9, 0.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "numpy_feast",
                        lambda *a, **k: (155.3, 7e-12, 7, 126.8))
    base_s, info = bench._lapack_baseline(None, None, None, None)
    assert base_s == 88.9
    assert "recorded clean baseline" in info["baseline_source"]
    assert info["contaminated_live_wall_s"] == 155.3


def test_baseline_guard_refreshes_recorded_on_clean_host(
        bench, tmp_path, monkeypatch):
    monkeypatch.setattr(os, "getloadavg", lambda: (0.0, 0.0, 0.0))
    monkeypatch.setattr(bench, "numpy_feast",
                        lambda *a, **k: (90.1, 7e-12, 7, 75.0))
    base_s, info = bench._lapack_baseline(None, None, None, None)
    assert base_s == 90.1
    assert info["baseline_source"] == "live (clean host)"
    with open(tmp_path / "benchmarks" / "results" /
              "lapack_baseline.json") as f:
        assert json.load(f)["wall_s"] == 90.1
