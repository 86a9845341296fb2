"""Generate the README/BASELINE measured-results tables from
benchmarks/tpu_results.json — the committed docs must be byte-derived
from the committed measurement artifact, never hand-written (round-2
verdict: hand-edited tables drifted from the JSON after a partial
refresh).

Usage:
  python benchmarks/gen_doc_tables.py            # print tables
  python benchmarks/gen_doc_tables.py --apply    # rewrite the marked
                                                 # blocks in README.md
                                                 # and BASELINE.md

The docs carry `<!-- gen:<name> -->` ... `<!-- endgen -->` markers; the
--apply mode replaces only the text between markers.
"""

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def load():
    data = json.loads((ROOT / "benchmarks" / "tpu_results.json").read_text())
    if isinstance(data, list):  # pre-round-3 format
        return {"meta": {}, "rows": data}
    return data


def fmt_vs(row):
    v = row.get("vs_baseline")
    return f"**{v:.2f}x**" if v is not None else "—"


def ntt_table(rows):
    out = ["| N | q bits | kernel | us/call (TPU) | us/call (Xeon ref) "
           "| TPU / Xeon |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        if r["kernel"].startswith(("fwd_ntt", "inv_ntt")) \
                and r["n"] in (1024, 4096, 16384) and "ref_us_per_call" in r:
            out.append(
                f"| 2^{r['n'].bit_length()-1} | {r['q_bits']} | "
                f"{r['kernel']} | {r['us_per_call']:.3f} | "
                f"{r['ref_us_per_call']:.3f} | {fmt_vs(r)} |")
    return "\n".join(out)


def eltwise_table(rows):
    out = ["| kernel | N | q bits | us/call (TPU) | us/call (Xeon ref) "
           "| TPU / Xeon |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        if r["kernel"].startswith("eltwise") and "ref_us_per_call" in r:
            out.append(
                f"| {r['kernel']} | {r['n']} | {r['q_bits']} | "
                f"{r['us_per_call']:.3f} | {r['ref_us_per_call']:.3f} | "
                f"{fmt_vs(r)} |")
    return "\n".join(out)


def composite_table(rows):
    out = ["| kernel | N | config | us/call (TPU) | us/call (Xeon ref) "
           "| TPU / Xeon |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        if r["kernel"] in ("fwd+inv_fft_like_pair", "fwd_fft_like",
                           "inv_fft_like", "key_switch",
                           "dyadic_multiply", "poly_mult_pipeline",
                           "rns_poly_mult_4x", "rns_fwd_ntt_stacked",
                           "fwd+inv_ntt32_pair"):
            ref = (f"{r['ref_us_per_call']:.3f}"
                   if "ref_us_per_call" in r else "—")
            out.append(
                f"| {r['kernel']} | {r['n']} | q={r['q_bits']}b "
                f"batch={r['batch']} | {r['us_per_call']:.3f} | {ref} | "
                f"{fmt_vs(r)} |")
    return "\n".join(out)


def summary_lines(rows, meta):
    with_base = [r for r in rows
                 if r.get("vs_baseline") and r["kernel"].startswith(
                     ("fwd_ntt", "inv_ntt"))]
    if not with_base:
        return "(no baselined NTT rows)"
    lo = min(with_base, key=lambda r: r["vs_baseline"])
    hi = max(with_base, key=lambda r: r["vs_baseline"])
    date = meta.get("date", "(meta missing — pre-round-3 artifact)")
    return (
        f"Measured {date}. Across every benchmarked NTT configuration the "
        f"TPU path runs between **{lo['vs_baseline']:.2f}x** "
        f"({lo['kernel']} N={lo['n']} {lo['q_bits']}-bit) and "
        f"**{hi['vs_baseline']:.2f}x** ({hi['kernel']} N={hi['n']} "
        f"{hi['q_bits']}-bit) the single-threaded AVX512-IFMA Xeon "
        f"reference. Protocol: chain={meta.get('chain', '?')}, "
        f"{meta.get('rep_stat', '?')}.")


# Scan-chained dependent lane-op issue rate measured by
# benchmarks/vpu_probe.py on this chip (docs/ROADMAP.md "Ceiling
# analysis") — the denominator for the MFU figure below.
VPU_LANE_OPS_PER_SEC = 3.8e12
# Cost-model figures for one lean16 butterfly (hexl_tpu/ntt/jnp_ntt.py
# _fwd_butterfly_lean16 + limb.mulhi64_approx6/mullo64): 24 native u32
# lane multiplies (10 quotient + 2x7 low-64 products), ~110 HLO lane
# ops total. Matches utils/profiling.ntt_cost's per-butterfly multiply
# count for the approx 2-limb regime.
MULS_PER_BFLY = 24
LANE_OPS_PER_BFLY = 110


def mfu_summary(rows):
    import math
    fwd = next((r for r in rows if r["kernel"] == "fwd_ntt"
                and r["n"] == 16384 and r["q_bits"] == 60), None)
    inv = next((r for r in rows if r["kernel"] == "inv_ntt"
                and r["n"] == 16384 and r["q_bits"] == 60), None)
    if not fwd or not inv:
        return "(headline rows missing)"
    n = 16384
    pair_us = fwd["us_per_call"] + inv["us_per_call"]
    pairs_per_sec = 1e6 / pair_us
    bfly_per_pair = 2 * (n // 2) * int(math.log2(n))
    bfly_rate = pairs_per_sec * bfly_per_pair
    mul_rate = bfly_rate * MULS_PER_BFLY
    lane_rate = bfly_rate * LANE_OPS_PER_BFLY
    mfu = lane_rate / VPU_LANE_OPS_PER_SEC
    return (
        f"Headline cost-model utilization (N=2^14, 60-bit, from the table "
        f"above): {pair_us:.2f} us/pair = {pairs_per_sec:,.0f} pairs/s x "
        f"{bfly_per_pair:,} butterflies/pair = **{bfly_rate/1e9:.1f} G "
        f"butterflies/s**. At {MULS_PER_BFLY} native u32 lane multiplies "
        f"and ~{LANE_OPS_PER_BFLY} HLO lane ops per lean16 butterfly "
        f"(utils/profiling.ntt_cost) that is {mul_rate/1e9:,.0f} G "
        f"u32-mul/s and {lane_rate/1e12:.2f} T lane-ops/s — "
        f"**~{100*mfu:.0f}% of the {VPU_LANE_OPS_PER_SEC/1e12:.1f} T "
        f"lane-ops/s dependent issue rate** measured by "
        f"benchmarks/vpu_probe.py on this chip. The transform is "
        f"compute-bound (docs/ROADMAP.md): the remaining headroom is "
        f"butterfly op count, and the quotient-side error budget is "
        f"exhausted at e<=6, so the residual mass is the three exact "
        f"32x32 high halves the low-64 products require.")


GENERATORS = {
    "ntt-table": lambda d: ntt_table(d["rows"]),
    "eltwise-table": lambda d: eltwise_table(d["rows"]),
    "composite-table": lambda d: composite_table(d["rows"]),
    "summary": lambda d: summary_lines(d["rows"], d["meta"]),
    "mfu": lambda d: mfu_summary(d["rows"]),
}


def apply_markers(path: pathlib.Path, data) -> bool:
    text = path.read_text()
    changed = False
    for name, gen in GENERATORS.items():
        start = f"<!-- gen:{name} -->"
        end = "<!-- endgen -->"
        i = text.find(start)
        while i != -1:
            j = text.find(end, i)
            if j == -1:
                break
            new = f"{start}\n{gen(data)}\n{end}"
            old = text[i:j + len(end)]
            if old != new:
                text = text[:i] + new + text[j + len(end):]
                changed = True
            i = text.find(start, i + len(new))
    if changed:
        path.write_text(text)
    return changed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()
    data = load()
    if not args.apply:
        for name, gen in GENERATORS.items():
            print(f"===== {name} =====")
            print(gen(data))
            print()
        return
    for doc in ("README.md", "BASELINE.md"):
        p = ROOT / doc
        if p.exists():
            print(f"{doc}: {'updated' if apply_markers(p, data) else 'no markers changed'}")


if __name__ == "__main__":
    main()
