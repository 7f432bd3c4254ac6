#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev-only helper; the
shipped library is pure Scala/Spark — this mirrors the driver harness).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir in verifyOutDir: run oracle_sql.json[name]
in DuckDB with every table of sfDir registered as a view, then compare
to the Spark result with columns sorted by name and rows sorted by all
columns. Prints per-query MATCH/MISMATCH plus diagnostics.
"""
import json
import math
import os
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
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_match = n_mismatch = n_rowsonly = 0
    for name in names:
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = list(spark_rel.columns)
        s_rows = spark_rel.fetchall()
        if name not in oracles:
            status = "ROWS-ONLY"
            n_rowsonly += 1
            print(f"{status:9s} {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols = list(o_rel.columns)
            o_rows = o_rel.fetchall()
        except Exception as e:
            n_mismatch += 1
            print(f"ORACLE-ERR {name}: {e}")
            continue
        s_canon, s_names = canon(s_rows, s_cols)
        o_canon, o_names = canon(o_rows, o_cols)
        if s_names != o_names:
            n_mismatch += 1
            print(f"SCHEMA-MIS {name}: spark={s_names} oracle={o_names}")
            continue
        if s_canon == o_canon:
            n_match += 1
            print(f"MATCH     {name}: {len(s_rows)} rows")
        else:
            n_mismatch += 1
            print(f"MISMATCH  {name}: spark {len(s_rows)} rows vs oracle "
                  f"{len(o_rows)} rows")
            diff = [(a, b) for a, b in zip(s_canon, o_canon) if a != b]
            for a, b in diff[:3]:
                print(f"   spark : {a[:200]}")
                print(f"   oracle: {b[:200]}")
            if len(s_canon) != len(o_canon):
                only_s = set(s_canon) - set(o_canon)
                only_o = set(o_canon) - set(s_canon)
                for x in list(only_s)[:2]:
                    print(f"   only-spark : {x[:200]}")
                for x in list(only_o)[:2]:
                    print(f"   only-oracle: {x[:200]}")
    # a query that FAILED in Verify writes no parquet dir at all — that
    # absence must fail the check loudly, not shrink the denominator
    # (12 events-family failures hid this way when the testdata's ts
    # type changed under us)
    absent = sorted(set(oracles) - set(names))
    for name in absent:
        print(f"ABSENT    {name}: oracle present but no Verify output")
    print(f"\n== {n_match} match, {n_mismatch} mismatch, "
          f"{n_rowsonly} rows-only, {len(absent)} absent, "
          f"{len(names)} present of {len(oracles)} oracled")
    sys.exit(1 if (n_mismatch or absent) else 0)


if __name__ == "__main__":
    main()
