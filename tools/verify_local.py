#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: reads Verify.scala's
output dir (per-query parquet + oracle_sql.json), runs each oracle SQL in
DuckDB over the same fixture parquet, and compares row count, schema
(column names sorted), and a value hash computed on columns sorted by name.

Usage: verify_local.py <sfDir> <outDir>
"""
import json, sys, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()


def to_comparable(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in df.columns:
        s = df[c]
        # normalize ints (int32/int64 -> int64), floats -> float64
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        out[c] = s
    return pd.DataFrame(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); n_fail += 1; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        a, b = to_comparable(norm_df(spark_df)), to_comparable(norm_df(duck_df))
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        if df_hash(a) != df_hash(b):
            diff_cols = []
            for c in a.columns:
                if not a[c].equals(b[c]):
                    neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                    idx = neq[neq].index[:3].tolist()
                    diff_cols.append((c, [(i, a[c][i], b[c][i]) for i in idx]))
            print(f"FAIL {name}: hash mismatch; diffs: {diff_cols[:3]}")
            n_fail += 1; continue
        n_pass += 1
        print(f"PASS {name} ({len(a)} rows)")
    # queries without oracle: rows-only check
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(pq.read_table(p))
                print(f"ROWS {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
            except Exception as e:
                print(f"FAIL {name}: unreadable ({e})"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
