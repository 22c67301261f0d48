"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive values."""
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from polardbx_tools_spark.session import get_spark
import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        try:
            import numpy as np
            if np.issubdtype(df[c].dtype, np.floating):
                df[c] = df[c].round(9)
        except Exception:
            pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(master="local[8]", app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if ONLY:
        unknown = [n for n in ONLY if n not in qs]
        if unknown:
            print(f"unknown query name(s): {unknown}; valid: {sorted(qs)}")
            sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(want.columns)}")
        if not problems:
            g, w = canon(got), canon(want)
            if not g.equals(w):
                diff_cols = [c for c in g.columns if not g[c].equals(w[c])]
                problems.append(f"values differ in {diff_cols}")
                for c in diff_cols[:2]:
                    neq = g[c] != w[c]
                    print(f"   sample {c}: got={g[c][neq].head(3).tolist()} want={w[c][neq].head(3).tolist()}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(got)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
