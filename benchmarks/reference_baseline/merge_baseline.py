#!/usr/bin/env python3
"""Merge fresh bench_reference runs into baseline_results.json.

Protocol (see BASELINE.md): the committed baseline is the per-row MIN over
repeated whole-harness runs on an idle host — noise on the single-core
container only ever slows the reference, so the min converges to the idle
rate.  When today's host is measurably slower than the committed idle
baseline (median shared-row ratio > 1), rows that exist only in today's
runs (no committed idle measurement) are CALIBRATED by dividing by that
median ratio — i.e. corrected in the *reference's favor* so contention on
the measurement day cannot inflate the framework's vs_baseline columns.
Shared rows are never calibrated: they take min(committed, today).

Usage:  merge_baseline.py RUN.json [RUN.json ...]
Rewrites baseline_results.json in place and prints a summary.
"""
import json
import statistics
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
BASELINE = HERE / "baseline_results.json"


def key(r):
    return (r["kernel"], r["n"], r["q_bits"])


def main(run_paths):
    runs = [json.load(open(p)) for p in run_paths]
    old = json.load(open(BASELINE)) if BASELINE.exists() else []
    oldmap = {key(r): r for r in old}

    best = {}
    for run in runs:
        for r in run:
            k = key(r)
            if k not in best or r["us_per_call"] < best[k]["us_per_call"]:
                best[k] = dict(r)

    shared = [k for k in best if k in oldmap]
    ratios = [best[k]["us_per_call"] / oldmap[k]["us_per_call"]
              for k in shared]
    cal = max(1.0, statistics.median(ratios)) if ratios else 1.0

    merged = []
    order = list(oldmap) + [k for k in best if k not in oldmap]
    for k in order:
        o, b = oldmap.get(k), best.get(k)
        if o and (not b or o["us_per_call"] <= b["us_per_call"]):
            merged.append(o)
        elif o:  # today beat the committed idle row: take today's raw min
            merged.append(b)
        else:    # new row: idle-host calibration (reference's favor)
            us = round(b["us_per_call"] / cal, 3)
            merged.append({"kernel": k[0], "n": k[1], "q_bits": k[2],
                           "us_per_call": us,
                           "calls_per_sec": round(1e6 / us, 1)})
    with open(BASELINE, "w") as f:
        f.write("[\n" + ",\n".join(
            "  " + json.dumps(r) for r in merged) + "\n]\n")
    n_new = len(best) - len(shared)
    print(f"merged {len(run_paths)} runs: {len(shared)} shared rows "
          f"(median today/idle ratio x{cal:.3f}), {n_new} new rows "
          f"calibrated by /{cal:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
