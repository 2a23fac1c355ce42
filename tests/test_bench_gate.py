"""The bench regression gate must fail on regressions AND on metrics that
silently vanish from the current run (reference benchmarks/compare_results.jl
fails on regression; round-3 taught us vacuous passes are worse)."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _run_gate(tmp_path, current_lines, history_objs):
    cur = tmp_path / "current.json"
    cur.write_text("\n".join(json.dumps(d) for d in current_lines) + "\n")
    hists = []
    for i, h in enumerate(history_objs):
        p = tmp_path / f"hist{i}.json"
        p.write_text(json.dumps(h))
        hists.append(str(p))
    return subprocess.run(
        [sys.executable, str(ROOT / "compare_bench.py"), str(cur), "--history", *hists],
        capture_output=True,
        text=True,
    )


def _driver_wrap(metrics):
    tail = "\n".join(json.dumps(m) for m in metrics)
    return {"n": 1, "rc": 0, "tail": tail, "parsed": metrics[-1] if metrics else None}


M1 = {"metric": "flagship_samples_per_sec_n500", "value": 100.0, "unit": "s/s", "vs_baseline": 1.0}
M2 = {"metric": "spmv_gbps_n16349", "value": 50.0, "unit": "GB/s", "vs_baseline": 1.0}


def test_gate_passes_when_all_metrics_present(tmp_path):
    r = _run_gate(tmp_path, [M1, M2], [_driver_wrap([M1, M2])])
    assert r.returncode == 0, r.stdout + r.stderr


def test_gate_fails_on_missing_metric(tmp_path):
    r = _run_gate(tmp_path, [M1], [_driver_wrap([M1, M2])])
    assert r.returncode == 1, r.stdout + r.stderr
    assert "missing" in r.stdout


def test_gate_fails_on_regression(tmp_path):
    worse = dict(M1, value=10.0)
    r = _run_gate(tmp_path, [worse, M2], [_driver_wrap([M1, M2])])
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_gate_tolerates_resized_workload(tmp_path):
    # size suffix changes (…_n16349 → …_n4093) still count as present, but
    # are loudly flagged and excluded from the ratio gate (a resize must
    # not silently mask a regression — ADVICE r4)
    resized = dict(M2, metric="spmv_gbps_n4093", value=1.0)
    r = _run_gate(tmp_path, [M1, resized], [_driver_wrap([M1, M2])])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RESIZED" in r.stdout


def test_gate_compares_same_platform_only(tmp_path):
    # a CPU run (platform field set) must not be gated against TPU history:
    # history lines without a platform field are TPU by convention, so the
    # CPU run sees no same-platform history and passes — the nightly CI
    # cannot go permanently red from the platform mismatch (VERDICT r4 #5)
    cpu1 = dict(M1, value=1.0, platform="cpu")  # 100x below TPU best
    cpu_only = [cpu1]
    r = _run_gate(tmp_path, cpu_only, [_driver_wrap([M1, M2])])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "REGRESSION" not in r.stdout


def test_gate_regresses_within_platform(tmp_path):
    # CPU history exists → CPU run IS gated against it
    cpu1 = dict(M1, platform="cpu")
    worse = dict(M1, value=10.0, platform="cpu")
    r = _run_gate(tmp_path, [worse], [_driver_wrap([cpu1])])
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_gate_reads_driver_wrapped_history(tmp_path):
    # history in the driver's BENCH_r format, metrics only inside `tail`
    r = _run_gate(tmp_path, [M1, M2], [_driver_wrap([M1, M2])])
    assert "flagship_samples_per_sec_n500" in r.stdout
