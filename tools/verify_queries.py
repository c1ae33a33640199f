"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at a given sf, compare
row count + sorted-column value frames. Usage:
    python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from cspirit_ontology_information_extraction_opus4plan_spark.session import get_spark

    spark = get_spark()

    # fresh bounded connection per query: one long-lived connection
    # accumulated allocator state across 300+ oracle executions until
    # DuckDB hit a bad allocation mid-run (observed at query ~282)
    def fresh_con():
        c = duckdb.connect()
        c.execute("SET memory_limit = '24GB'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name}: SPARK ERROR {ex}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle, rows-only) "
                  f"spark={t1-t0:.1f}s")
            if len(sdf) == 0:
                failures.append(name)
            continue
        con = fresh_con()
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name}: DUCKDB ERROR {str(ex)[:300]}")
            failures.append(name)
            continue
        finally:
            con.close()
        t2 = time.time()
        a, b = normalize(sdf), normalize(ddf)
        status = "OK"
        if list(a.columns) != list(b.columns):
            status = f"SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            status = f"ROWCOUNT MISMATCH {len(a)} vs {len(b)}"
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            status = (f"VALUE MISMATCH ({int(neq.sum())} rows)\n"
                      f"spark:\n{a[neq].head(3)}\nduck:\n{b[neq].head(3)}")
        print(f"{name}: {status} rows={len(a)} spark={t1-t0:.1f}s "
              f"duck={t2-t1:.1f}s")
        if status != "OK":
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
