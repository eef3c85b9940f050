#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]

For each query parquet dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet, sorts columns by name, sorts rows, and compares values.
Optional trailing key names restrict the compare to those keys (for
spot-checking new keys at sf0.1 without re-running the ~1.5h all-pairs
oracles). Tooling only — NOT part of the Spark library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(f"{v:.10g}")
            else:
                r.append(repr(v))
        out.append(tuple(r))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    only = set(sys.argv[3:])
    if only:
        missing = only - set(oracles)
        if missing:
            print(f"WARN: no oracle for {sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.sql(sql)
            ocols = sorted(oracle.columns)
            orows = canon(con.sql(
                f"SELECT {', '.join(ocols)} FROM oracle").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = sorted(spark_rel.columns)
            srows = canon(con.sql(
                f"SELECT {', '.join(scols)} FROM spark_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark output error: {e}")
            n_fail += 1
            continue
        # dtype parity (int32-vs-int64 etc. would break a typed hash)
        stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        otypes = dict(zip(oracle.columns, [str(t) for t in oracle.types]))
        for c in ocols:
            if c in stypes and stypes[c] != otypes.get(c):
                print(f"  WARN {name}.{c}: spark={stypes[c]} oracle={otypes.get(c)}")
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            diff = [(i, a, b) for i, (a, b) in
                    enumerate(zip(srows, orows)) if a != b]
            msg = (f"rowcount spark={len(srows)} oracle={len(orows)}"
                   if len(srows) != len(orows)
                   else f"first diff @{diff[0][0]}:\n  spark ={diff[0][1]}"
                        f"\n  oracle={diff[0][2]}")
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
