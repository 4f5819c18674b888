#!/usr/bin/env python3
"""Local pre-validation of the driver's t2 gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
parquet tables of <sfDir> registered as views, and compares against the
Spark parquet dump at <verifyOutDir>/<name>/ — schema (column names),
row count, and value hash over rows sorted by all columns, with columns
sorted by name (mirrors the driver contract described in the prompt).
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_key(con, rel_sql):
    """(colnames, nrows, sorted-row canonical list)"""
    res = con.sql(rel_sql)
    cols = sorted(res.columns)
    quoted = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(f"SELECT {quoted} FROM ({rel_sql})").fetchall()
    crows = sorted(tuple(canon(v) for v in r) for r in rows)
    return cols, len(rows), crows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            n_fail += 1
            continue
        try:
            scols, snr, srows = table_key(con, f"SELECT * FROM read_parquet('{spark_glob}')")
        except Exception as e:
            print(f"FAIL {name}: reading spark output: {e}")
            n_fail += 1
            continue
        try:
            ocols, onr, orows = table_key(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif snr != onr:
            print(f"FAIL {name}: rows spark={snr} oracle={onr}")
            n_fail += 1
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {diff}:")
            print(f"  spark : {srows[diff][:6]}")
            print(f"  oracle: {orows[diff][:6]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({snr} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
