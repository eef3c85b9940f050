#!/usr/bin/env python3
"""Row-level diff of two graft Verify dumps (the fast sf0.1 re-check).

After a Spark-side-only change that must not alter results, run Verify
into a fresh dir and EXCEPT-diff it against a previously oracle-verified
dump — identical rows for every key proves the change is
result-preserving without re-running the full DuckDB oracle (which at
sf0.1 takes ~1.5h for the all-pairs minhash truth restatement).

Verify writes each key as a parquet DIRECTORY named exactly the key
(plus a top-level oracle_sql.json).

Usage: python3 tools/diffdump.py <verified_dump_dir> <fresh_dump_dir> [key ...]
Exits non-zero if any compared key differs or is missing.
"""
import os
import sys

import duckdb


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    ref, new = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    keys = sorted(d for d in os.listdir(new)
                  if os.path.isdir(os.path.join(new, d)))
    bad = []
    if only:
        for k in sorted(only - set(keys)):
            print(f"MISS {k} (not in fresh dump)")
            bad.append(k)
        keys = [k for k in keys if k in only]
    for k in keys:
        a, b = os.path.join(ref, k), os.path.join(new, k)
        if not os.path.isdir(a):
            print(f"MISS {k} (not in reference dump)")
            bad.append(k)
            continue
        ra = f"SELECT * FROM read_parquet('{a}/*.parquet')"
        rb = f"SELECT * FROM read_parquet('{b}/*.parquet')"
        extra = con.execute(
            f"SELECT count(*) FROM (({rb}) EXCEPT ALL ({ra}))").fetchone()[0]
        missing = con.execute(
            f"SELECT count(*) FROM (({ra}) EXCEPT ALL ({rb}))").fetchone()[0]
        if extra or missing:
            print(f"DIFF {k} (+{extra} rows / -{missing} rows vs reference)")
            bad.append(k)
        else:
            print(f"SAME {k}")
    print(f"{len(keys)} compared: {len(keys) - len([b for b in bad if b in keys])} same, "
          f"{len(bad)} problems")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
