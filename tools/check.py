#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Mirrors the DRIVER's compare as closely as we can observe it (round-1
lesson: the old checker read the Spark parquet back through DuckDB, which
canonicalized HUGEINT/DECIMAL/arrays identically on both sides and
green-lit five queries the driver hash-failed):

 - Spark side: pandas.read_parquet (pyarrow) — parquet DECIMAL becomes
   object(decimal.Decimal), INT64 stays int64, arrays become object(ndarray).
 - Oracle side: duckdb .df() — DECIMAL/HUGEINT become float64, BIGINT
   stays int64, lists become object(ndarray).
 - Any object(ndarray/list) column → FAIL: the driver's sort_values crashes
   on unhashable numpy arrays.
 - Column dtype KIND mismatch (int vs float vs object) → FAIL: the driver's
   canonical row strings will differ ("100" vs "100.0", "1.40" vs "1.4").
 - Values: compared as canonical strings per cell, rows sorted, columns
   sorted by name.
"""
import sys, json, glob, math, os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "NULL"
    return str(v)


def dtype_kind(df, c):
    k = df[c].dtype.kind
    if k == "O":
        # distinguish the object flavors the driver canonicalizes differently
        for v in df[c]:
            if v is None:
                continue
            if isinstance(v, (np.ndarray, list, tuple)):
                return "ARRAY"  # driver sort_values crash
            if isinstance(v, Decimal):
                return "decimal"
            return "str"
        return "str"
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "ts", "m": "td"}.get(k, k)


def frame_key(df, name, side):
    """(col->kind dict, nrows, sorted canonical rows) or (error_str, None, None)"""
    cols = sorted(df.columns)
    kinds = {}
    for c in cols:
        kinds[c] = dtype_kind(df, c)
        if kinds[c] == "ARRAY":
            return (f"{side} column '{c}' is an array column — driver "
                    f"sort_values would crash (unhashable ndarray)", None, None)
    rows = sorted(tuple(canon(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))
    return kinds, len(rows), rows


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
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {out_dir}/{name}/*.parquet")
            n_fail += 1
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: reading spark output via pandas: {e}")
            n_fail += 1
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        skinds, snr, srows = frame_key(sdf, name, "spark")
        if snr is None:
            print(f"FAIL {name}: {skinds}")
            n_fail += 1
            continue
        okinds, onr, orows = frame_key(odf, name, "oracle")
        if onr is None:
            print(f"FAIL {name}: {okinds}")
            n_fail += 1
            continue
        if sorted(skinds) != sorted(okinds):
            print(f"FAIL {name}: columns spark={sorted(skinds)} oracle={sorted(okinds)}")
            n_fail += 1
        elif skinds != okinds:
            bad = {c: (skinds[c], okinds[c]) for c in skinds if skinds[c] != okinds[c]}
            print(f"FAIL {name}: dtype-kind mismatch (driver canon will differ): {bad}")
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
    # rows-only queries (no oracle) still get read + sorted by the driver:
    # flag any array-typed output column (sort_values crash) there too
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle or (only and name not in only):
            continue
        files = glob.glob(f"{d}*.parquet")
        if not files:
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name} (rows-only): pandas read: {e}")
            n_fail += 1
            continue
        kinds, nr, _ = frame_key(sdf, name, "spark")
        if nr is None:
            print(f"FAIL {name} (rows-only): {kinds}")
            n_fail += 1
        else:
            print(f"PASS {name} (rows-only, {nr} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
