#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Loads each SparkEntry query result (parquet written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same sf
tables, sorts columns by name in both, and compares values exactly.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        bad_cols = []
        type_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            # The driver hashes values as fetched, with no numeric
            # coercion: Spark BIGINT 79 vs DuckDB HUGEINT->float 79.0
            # is a mismatch there, so it must be one here too.
            ak = getattr(av.dtype, "kind", "O")
            bk = getattr(bv.dtype, "kind", "O")
            int_kinds = {"i", "u"}
            if (ak in int_kinds) != (bk in int_kinds) and {ak, bk} <= {
                    "i", "u", "f"}:
                type_cols.append(f"{c}({av.dtype} vs {bv.dtype})")
                continue
            try:
                if av.dtype == object or str(av.dtype).startswith("datetime"):
                    eq = av.astype(str).equals(bv.astype(str))
                elif ak == "f" and bk == "f":
                    # The driver hashes raw bytes, where -0.0 != +0.0 (IEEE
                    # == says they're equal, so a plain compare hides the
                    # difference — the round-5 window_zscore_rolling lesson).
                    # Bit-compare via an int64 view, with NaN (incl. null)
                    # canonicalized to one payload on both sides.
                    x = av.astype("float64").to_numpy(copy=True)
                    y = bv.astype("float64").to_numpy(copy=True)
                    x[np.isnan(x)] = np.nan
                    y[np.isnan(y)] = np.nan
                    eq = bool((x.view(np.int64) == y.view(np.int64)).all())
                else:
                    eq = (av.fillna(-(2**60)) == bv.fillna(-(2**60))).all()
            except Exception:
                eq = av.astype(str).equals(bv.astype(str))
            if not eq:
                bad_cols.append(c)
        if type_cols:
            print(f"FAIL {name}: dtype mismatch (driver hash would "
                  f"differ) in {type_cols}")
            n_bad += 1
            continue
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                merged = pd.DataFrame({"spark": a[c], "duck": b[c]})
                diff = merged[merged.spark.astype(str) != merged.duck.astype(str)]
                print(diff.head(5).to_string())
            n_bad += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
