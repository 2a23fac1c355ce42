"""Benchmark regression gate (reference benchmarks/compare_results.jl role).

Usage:
    python compare_bench.py current.json [--history BENCH_r*.json] [--threshold 0.5]

`current.json` holds one JSON object per line (bench.py output). For every
metric present in both the current run and the best *same-platform*
historical run, fail (exit 1) if current value < (1 - threshold) x best
historical value — i.e. a >50% throughput regression by default. Metrics
are throughputs (higher is better).

Platform discipline: every metric line carries a `platform` field
("tpu"/"cpu"; bench.py emits it, history lines without one are assumed
"tpu" — all BENCH_r* files were produced on the chip). A CPU CI run is
compared only against CPU history, so the nightly gate cannot go
permanently red from comparing a CPU run against TPU numbers.

A metric present in same-platform history but ABSENT from the current run
also fails: a bench that times out and emits nothing must not pass the
gate vacuously (round-3 failure mode). A metric whose size suffix changed
(…_n16349 -> …_n5741) counts as present but is flagged as RESIZED and
compared informationally against the best same-stem value — resizing a
workload does not silently drop it from the gate's view.
"""

import argparse
import glob
import json
import sys


def _collect(d, out, default_platform="tpu"):
    if isinstance(d, dict) and "metric" in d and "value" in d:
        plat = d.get("platform", default_platform)
        out[(plat, d["metric"])] = float(d["value"])


def load_metrics(path):
    """Metrics from either bench.py's line-JSON output or the driver's
    wrapped BENCH_r*.json format (single object with metric lines embedded
    in `tail` and the last one in `parsed`). Returns {(platform, name): value}."""
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


def _stem(name):
    return name.split("_n")[0]


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
    stem_best = {}
    for hf in hist_files:
        for (plat, name), v in load_metrics(hf).items():
            best[(plat, name)] = max(best.get((plat, name), 0.0), v)
            sk = (plat, _stem(name))
            stem_best[sk] = max(stem_best.get(sk, 0.0), v)

    failed = []
    resized = []
    print(f"{'metric':<64} {'current':>12} {'best':>12} {'ratio':>7}")
    for (plat, name), v in current.items():
        label = f"[{plat}] {name}"
        b = best.get((plat, name))
        if b is None or b <= 0:
            sb = stem_best.get((plat, _stem(name)), 0.0)
            if sb > 0:
                # size suffix changed: informational comparison only — the
                # value is not size-normalized, so don't gate on it, but
                # surface the change loudly
                resized.append(name)
                print(
                    f"{label:<64} {v:>12.3f} {sb:>12.3f} "
                    f"{v / sb:>7.2f} RESIZED (ungated)"
                )
            else:
                print(f"{label:<64} {v:>12.3f} {'--':>12} {'--':>7}")
            continue
        ratio = v / b
        flag = " REGRESSION" if ratio < 1.0 - args.threshold else ""
        print(f"{label:<64} {v:>12.3f} {b:>12.3f} {ratio:>7.2f}{flag}")
        if flag:
            failed.append(name)
    # presence check: same-platform, by stem (size suffixes may change)
    cur_platforms = {plat for plat, _ in current}
    cur_stems = {(plat, _stem(name)) for plat, name in current}
    missing = sorted(
        f"[{plat}] {s}"
        for (plat, s) in {(p, _stem(n)) for (p, n) in best if p in cur_platforms}
        - cur_stems
    )
    if resized:
        print(
            f"\nWARNING: resized workloads (compared informationally only): "
            f"{', '.join(resized)}"
        )
    if missing:
        print(
            f"\nFAIL: metrics in same-platform history but missing from "
            f"current run: {', '.join(missing)}"
        )
        sys.exit(1)
    if failed:
        print(f"\nFAIL: >{args.threshold:.0%} regression on: {', '.join(failed)}")
        sys.exit(1)
    print("\nOK: no regression beyond threshold")


if __name__ == "__main__":
    main()
