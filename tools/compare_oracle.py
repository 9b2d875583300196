#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query with an entry in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet from <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB over views of <sfDir>/*.parquet
  - sort columns by name, sort rows, compare counts / schema / values.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append("\x1f".join(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
            orq = con.execute(oracle[name])
            or_rows, or_cols = orq.fetchall(), [d[0] for d in orq.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        sc, sv = canon(sp_rows, sp_cols)
        oc, ov = canon(or_rows, or_cols)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} vs {oc}")
            n_fail += 1
        elif len(sv) != len(ov):
            print(f"FAIL {name}: rows {len(sv)} vs {len(ov)}")
            n_fail += 1
        elif sv != ov:
            bad = next(i for i in range(len(sv)) if sv[i] != ov[i])
            print(f"FAIL {name}: values differ, first at sorted row {bad}:")
            print(f"  spark:  {sv[bad][:300]}")
            print(f"  oracle: {ov[bad][:300]}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(sv)} rows)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
