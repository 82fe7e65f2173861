#!/usr/bin/env python3
"""Merge several partial-bench /tmp/graft_bench.json copies into one
probes artifact (BENCH_probes_r{N}.json). Later files win on key
conflicts; the envelope-ish scalar keys (metric/value/unit/heavy_total/
queries/sf/duckdb_seconds) are taken from the FIRST file so a
probe-only merge never fabricates an envelope. Dev tooling only."""
import json, sys

def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    merged = {}
    first = json.load(open(ins[0]))
    for k in ("metric", "value", "unit", "heavy_total", "queries", "sf",
              "duckdb_seconds"):
        if k in first:
            merged[k] = first[k]
    for p in ins:
        d = json.load(open(p))
        for k, v in d.items():
            if k in merged and k in ("metric", "value", "unit",
                                     "heavy_total", "queries", "sf",
                                     "duckdb_seconds"):
                continue
            merged[k] = v
    json.dump(merged, open(out_path, "w"), indent=None)
    print(f"wrote {out_path}: {sorted(merged.keys())}")

if __name__ == "__main__":
    main()
