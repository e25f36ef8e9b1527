#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py [sfDir] [outDir]

Runs DuckDB on oracle_sql.json (written by graft.Verify) against the
same parquet tables, and compares each query's Spark parquet dump:
columns sorted by name, rows sorted by all columns, exact value match.
This is a dev tool only — NOT part of the Scala library.
"""
import glob
import hashlib
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
            files = glob.glob(f"{OUT}/{name}/*.parquet")
            got = norm(duckdb.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            problems = []
            if list(want.columns) != list(got.columns):
                problems.append(f"cols want={list(want.columns)} got={list(got.columns)}")
            elif len(want) != len(got):
                problems.append(f"rows want={len(want)} got={len(got)}")
            elif frame_hash(want) != frame_hash(got):
                neq = (want.astype(str) != got.astype(str))
                bad_cols = [c for c in want.columns if neq[c].any()]
                problems.append(f"hash mismatch in cols {bad_cols}")
                for c in bad_cols[:3]:
                    i = neq[c].idxmax()
                    problems.append(
                        f"  {c}[{i}]: want={want[c][i]!r} got={got[c][i]!r}")
            if problems:
                n_bad += 1
                print(f"FAIL {name}")
                for p in problems:
                    print(f"     {p}")
            else:
                n_ok += 1
                print(f"ok   {name} ({len(want)} rows)")
        except Exception as e:
            n_bad += 1
            print(f"ERR  {name}: {e}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
