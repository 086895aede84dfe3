#!/usr/bin/env python3
"""Regenerate the SCALE.md 100x-probe table from BENCH_sf10.json.

Usage: python3 tools/sf10_table.py [BENCH_sf10.json] [bench_full.json]

Reads the sf10 BENCH-format artifact (runs_sec gives cold build /
warm serve per query) and the committed sf0.1 epoch, and prints the
markdown table: per query, the sf0.1 epoch seconds, sf10 cold/warm
seconds, the x-ratio for 100x data, and the structured counters
(spill, tasks) that previously lived only in prose. A FAILED query
(absent from the artifact's queries map but listed in per_query with
an error) prints as a FAILED row rather than disappearing.
"""
import json
import sys


def main(sf10_path: str, epoch_path: str) -> int:
    sf10 = json.load(open(sf10_path))
    epoch = json.load(open(epoch_path))
    eq = epoch.get("queries", {})
    pq = sf10.get("host", {}).get("per_query", {})
    rows = []
    for name, best in sorted(sf10.get("queries", {}).items(),
                             key=lambda kv: -kv[1]):
        attrs = pq.get(name, {})
        runs = attrs.get("runs_sec", [best])
        cold, warm = runs[0], min(runs)
        e = eq.get(name)
        ratio = f"{best / e:.1f}x" if e and e > 0.0 else "-"
        spill = attrs.get("disk_spill", 0) + attrs.get("mem_spill", 0)
        err = attrs.get("error")
        body = (f" FAILED ({err}) — times are time-to-failure |"
                if err else
                f" {cold:.1f} s | {warm:.1f} s | {ratio} |")
        rows.append(
            (f"| {name} | {e:.2f} s |" if e else f"| {name} | - |")
            + body
            + f" {spill // (1 << 20)} MB | {attrs.get('tasks', 0)} |")
    print("| query | sf0.1 epoch | sf10 cold | sf10 warm | x(100x data,"
          " best) | spill | tasks |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    h = sf10.get("host", {})
    print()
    print(f"single-window probe: total {sf10.get('value', 0.0):.1f} s,"
          f" host_clean={h.get('host_clean')},"
          f" canary max {h.get('canary_max_ratio')},"
          f" outlier gate: {h.get('outlier_gate', 'n/a')}")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf10_p = args[0] if args else "BENCH_sf10.json"
    epoch_p = args[1] if len(args) > 1 else "bench_full.json"
    sys.exit(main(sf10_p, epoch_p))
