#!/usr/bin/env python3
"""Merge solo re-run entries into a bench bank file.

Usage: merge_bank.py <bank.json> <patch.json> [<patch2.json> ...]

Each patch is a Bench detail file (SPARK_GRAFT_BENCH_OUT) whose
`queries` / `queries_median` maps carry the solo min-of-N readings.
Every query in the patch replaces (or adds to) the bank's entry in BOTH
maps; entries that are -1.0 in the bank (failed runs, e.g. a launch
missing --add-opens) MUST be patched before the bank is usable —
the script exits non-zero if any -1.0 survives the merge.
`value` is recomputed as the sum of mins and `nqueries` refreshed.
"""
import json, sys

bank_path = sys.argv[1]
with open(bank_path) as f:
    bank = json.load(f)

for p in sys.argv[2:]:
    with open(p) as f:
        patch = json.load(f)
    for k, v in patch.get("queries", {}).items():
        old = bank["queries"].get(k)
        bank["queries"][k] = v
        print(f"  {k}: {old} -> {v}")
    for k, v in patch.get("queries_median", {}).items():
        bank.setdefault("queries_median", {})[k] = v

bad = [k for k, v in bank["queries"].items() if v < 0]
bank["value"] = round(sum(v for v in bank["queries"].values() if v >= 0), 3)
bank["nqueries"] = len(bank["queries"])

with open(bank_path, "w") as f:
    json.dump(bank, f, separators=(",", ":"))
print(f"bank: {bank['nqueries']} queries, total {bank['value']}s")
if bad:
    print(f"ERROR: still-failed entries: {bad}", file=sys.stderr)
    sys.exit(1)
