"""Benchmark regression gate (reference benchmarks/compare_results.jl role).

Usage:
    python compare_bench.py current.json [--history BENCH_r*.json] [--threshold 0.5]

`current.json` holds one JSON object per line (bench.py output). For every
metric present in both the current run and the best historical run, fail
(exit 1) if current value < (1 - threshold) × best historical value —
i.e. a >50% throughput regression by default. Metrics are throughputs
(higher is better). A metric present in history but ABSENT from the
current run also fails: a bench that times out and emits nothing must not
pass the gate vacuously (round-3 failure mode). Prints a comparison table
either way.
"""

import argparse
import glob
import json
import sys


def _collect(d, out):
    if isinstance(d, dict) and "metric" in d and "value" in d:
        out[d["metric"]] = float(d["value"])


def load_metrics(path):
    """Metrics from either bench.py's line-JSON output or the driver's
    wrapped BENCH_r*.json format (single object with metric lines embedded
    in `tail` and the last one in `parsed`)."""
    out = {}
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return out
    try:
        whole = json.loads(text)
    except json.JSONDecodeError:
        whole = None
    if isinstance(whole, dict) and ("tail" in whole or "parsed" in whole):
        _collect(whole.get("parsed"), out)
        for line in (whole.get("tail") or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    _collect(json.loads(line), out)
                except json.JSONDecodeError:
                    pass
        return out
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            _collect(json.loads(line), out)
        except json.JSONDecodeError:
            continue
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current")
    ap.add_argument("--history", nargs="*", default=None)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    current = load_metrics(args.current)
    if not current:
        print(f"no metrics found in {args.current}", file=sys.stderr)
        sys.exit(2)

    hist_files = args.history
    if hist_files is None:
        hist_files = sorted(glob.glob("BENCH_r*.json"))
    best = {}
    for hf in hist_files:
        for k, v in load_metrics(hf).items():
            best[k] = max(best.get(k, 0.0), v)

    failed = []
    print(f"{'metric':<60} {'current':>12} {'best':>12} {'ratio':>7}")
    for k, v in current.items():
        b = best.get(k)
        if b is None or b <= 0:
            print(f"{k:<60} {v:>12.3f} {'--':>12} {'--':>7}")
            continue
        ratio = v / b
        flag = " REGRESSION" if ratio < 1.0 - args.threshold else ""
        print(f"{k:<60} {v:>12.3f} {b:>12.3f} {ratio:>7.2f}{flag}")
        if flag:
            failed.append(k)
    # workload names carry size suffixes (…_n16349); compare by stem so a
    # re-sized workload still counts as present
    stem = lambda name: name.split("_n")[0]
    cur_stems = {stem(k) for k in current}
    missing = sorted({stem(k) for k in best} - cur_stems)
    if missing:
        print(f"\nFAIL: metrics in history but missing from current run: {', '.join(missing)}")
        sys.exit(1)
    if failed:
        print(f"\nFAIL: >{args.threshold:.0%} regression on: {', '.join(failed)}")
        sys.exit(1)
    print("\nOK: no regression beyond threshold")


if __name__ == "__main__":
    main()
