#!/usr/bin/env python3
"""Parse `sbt "runMain graft.Explain"` output into the per-entry
distinct-scan-node inventory (the PLANS.md round-12 PINNED method):
for each entry section, collect the detail-section `(N) Scan parquet`
node ids and attribute each id to the parquet file named on the
following `Location:` line; emit {entry: {file: n_distinct_ids}}.

Usage: scan_inventory.py <explain_output.txt> <out.json>
"""
import json
import re
import sys


def main(src: str, dst: str) -> None:
    entry = None
    inv: dict = {}
    pending_ids: dict = {}  # node id -> True, awaiting Location
    current_id = None
    seen: dict = {}  # (entry, file) -> set of ids
    for raw in open(src, encoding="utf-8", errors="replace"):
        line = re.sub(r"^\[info\]\s?", "", raw.rstrip("\n"))
        m = re.match(r"^=+ (\S+) =+$", line)
        if m:
            entry = m.group(1)
            current_id = None
            continue
        if entry is None:
            continue
        m = re.match(r"^\((\d+)\) Scan parquet", line)
        if m:
            current_id = m.group(1)
            continue
        m = re.match(r"^Location: \S+ \[file:([^\]]+)\]", line)
        if m and current_id is not None:
            fname = m.group(1).rstrip("/").split("/")[-1]
            fname = re.sub(r"\.parquet$", "", fname)
            seen.setdefault((entry, fname), set()).add(current_id)
            current_id = None
    for (entry, fname), ids in seen.items():
        inv.setdefault(entry, {})[fname] = len(ids)
    out = {e: dict(sorted(v.items())) for e, v in sorted(inv.items())}
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    worst = sorted(
        ((e, f, n) for e, v in out.items() for f, n in v.items() if n >= 3),
        key=lambda t: -t[2])
    for e, f, n in worst:
        print(f"{e}: {f} x {n}")
    print(f"{len(out)} entries; {len(worst)} file-scans at >=3")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
