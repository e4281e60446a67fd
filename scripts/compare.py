#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run each oracle SQL in DuckDB against the testdata tables, load the
Spark-written parquet result, sort columns by name + rows, and compare.

Usage: compare.py <sfDir> <verifyOutDir> [--strict-types]

--strict-types additionally fails any query whose Spark-parquet pandas
dtypes differ from the DuckDB oracle's — the driver's hasher is
type-strict, and pandas value coercion hides exactly this class
(DuckDB HUGEINT materializes as float64/object while the Spark side is
int64; see round-7 x46/x49).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def values_equal(a, b):
    try:
        import pandas as pd
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def dtype_mismatches(s, o):
    """Column-level dtype disagreements that would break a type-strict
    hasher. int32-vs-int64 style width differences are benign only when
    both sides are integer; everything else (float-vs-int, object-vs-int,
    decimal-vs-float) is flagged."""
    bad = []
    for c in s.columns:
        ds, do = str(s[c].dtype), str(o[c].dtype)
        if ds == do:
            continue
        ints = {"int8", "int16", "int32", "int64"}
        if ds in ints and do in ints:
            continue
        bad.append((c, ds, do))
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    strict_types = "--strict-types" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        spark_df = con.execute(f"SELECT * FROM '{path}/*.parquet'").df()
        if name not in oracles:
            print(f"SKIP  {name:34s} rows={len(spark_df)} (no oracle)")
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name:34s} oracle error: {str(e)[:160]}")
            n_fail += 1
            continue
        s, o = normalize(spark_df), normalize(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL  {name:34s} columns {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL  {name:34s} rows {len(s)} vs {len(o)}")
            n_fail += 1
            continue
        if strict_types:
            mism = dtype_mismatches(s, o)
            if mism:
                det = ", ".join(f"{c}: spark={ds} oracle={do}" for c, ds, do in mism)
                print(f"FAIL  {name:34s} dtype mismatch ({det})")
                n_fail += 1
                continue
        bad = None
        sv, ov = s.values.tolist(), o.values.tolist()
        for i in range(len(sv)):
            for j in range(len(s.columns)):
                if not values_equal(sv[i][j], ov[i][j]):
                    bad = (i, s.columns[j], sv[i][j], ov[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL  {name:34s} row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            # exactness check: report if floats differ at all (driver may hash exact)
            exact = all(
                (sv[i][j] == ov[i][j])
                or (isinstance(sv[i][j], float) and isinstance(ov[i][j], float)
                    and math.isnan(sv[i][j]) and math.isnan(ov[i][j]))
                for i in range(len(sv)) for j in range(len(s.columns)))
            tag = "PASS " if exact else "PASS~"
            print(f"{tag} {name:34s} rows={len(s)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
