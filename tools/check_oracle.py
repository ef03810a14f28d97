"""Local driver-mimic: run each entry query on Spark AND its DuckDB
oracle, compare row count + sorted-column values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None

    from pyspark.sql import SparkSession

    from bayesian_bm25_spark.entry_queries import ORACLE_SQL, SPARK_QUERIES

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    import __spark_entry__

    ORACLE_SQL = __spark_entry__.oracle_sql()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    exercised: set[str] = set()
    for name, fn in SPARK_QUERIES.items():
        if names and name not in names:
            continue
        exercised.add(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=1e-9)
            print(f"OK   {name}: {len(a)} rows")
        except AssertionError as e:
            failures.append((name, "value mismatch"))
            msg = str(e).splitlines()
            print(f"FAIL {name}: value mismatch\n  " + "\n  ".join(msg[:6]))
            merged = a.compare(b) if a.shape == b.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))

    # full-registry coverage guard: when no name filter is given, every
    # registered entry MUST have been exercised — a registry entry that
    # silently escapes the sweep (CORRECTNESS_r04: multihead_fusion) is
    # an error here, not an omission
    if names is None:
        skipped = sorted(set(SPARK_QUERIES) - exercised)
        if skipped:
            failures.append(("__coverage__", f"entries not exercised: {skipped}"))
            print(f"FAIL coverage: entries not exercised: {skipped}")
        else:
            print(f"coverage: all {len(SPARK_QUERIES)} registry entries exercised")

    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
