#!/usr/bin/env python3
"""Merge several partial-bench /tmp/graft_bench.json copies into one
probes artifact (BENCH_probes_r{N}.json). Later files win on key
conflicts; the envelope-ish scalar keys (metric/value/unit/heavy_total/
queries/sf/duckdb_seconds) are taken from the FIRST file so a
probe-only merge never fabricates an envelope. Dev tooling only."""
import json, sys

ENVELOPE_KEYS = ("metric", "value", "unit", "heavy_total", "queries",
                 "sf", "duckdb_seconds")


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    first = json.load(open(ins[0]))
    # envelope keys come from the FIRST file unconditionally — absent
    # there means absent in the merge, so a probe-only first input can
    # never adopt a later full run's envelope and masquerade as one
    merged = {k: first[k] for k in ENVELOPE_KEYS if k in first}
    for p in ins:
        d = json.load(open(p))
        for k, v in d.items():
            if k in ENVELOPE_KEYS:
                continue
            merged[k] = v
    json.dump(merged, open(out_path, "w"), indent=None)
    print(f"wrote {out_path}: {sorted(merged.keys())}")

if __name__ == "__main__":
    main()
