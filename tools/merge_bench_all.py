#!/usr/bin/env python
"""Merge partial bench --all artifacts into one BENCH_ALL_r*.json.

Used when a wall-clock-bounded session measures configs across several
orchestrator runs (each writes incrementally): rows from later files
override earlier rows with the same config name; provenance per row is
kept in 'source'.

Usage: python tools/merge_bench_all.py OUT IN1 IN2 [...]
"""

import json
import sys


def main():
    out, *ins = sys.argv[1:]
    rows = {}
    meta = None
    for path in ins:
        with open(path) as f:
            d = json.load(f)
        if meta is None:
            meta = {k: v for k, v in d.items() if k != "configs"}
        if d.get("device"):
            meta["device"] = d["device"]
        for row in d["configs"]:
            row = dict(row)
            row["source"] = path
            rows[row["config"]] = row
    meta["configs"] = list(rows.values())
    with open(out, "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")
    print(f"wrote {out} ({len(rows)} configs from {len(ins)} files)")


if __name__ == "__main__":
    main()
