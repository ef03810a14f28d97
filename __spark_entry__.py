"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 top-10 over the documents
table at sf0.001).  ``queries()`` exposes one callable per implemented
operator from SURVEY.md §2 (plus the training-data-pipeline operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible entry.  Implementations live in
``bayesian_bm25_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from bayesian_bm25_spark.entry_queries import (  # noqa: E402
    ORACLE_SQL,
    ORACLE_SQL_BUILDERS,
    SPARK_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: inverted-index BM25 top-10 (rank-pinned) on sf0.001."""
    return SPARK_QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; see SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible entry.

    Data-dependent oracles (isotonic_calibrate: the SQL inlines
    breakpoints fit on the oracle data at sf0.01, override the directory
    with $SPARK_GRAFT_ORACLE_SF) are built lazily; if a builder fails
    (e.g. the parquet is absent) the entry degrades to the rows-only
    check instead of breaking the suite.

    Entries absent here (ivf_topk, vector_calibrated_topk) are
    non-SQL-expressible (iterative k-means / per-query EM) and get the
    driver's rows-only check; their exactness is covered by pytest
    goldens against the numpy kernel.  Everything else — including the
    binary posting-list codec, whose exact compressed byte sizes the
    SQL predicts from the varbyte layout — is oracle-checked (42/44).
    """
    out = dict(ORACLE_SQL)
    for name, build in ORACLE_SQL_BUILDERS.items():
        try:
            out[name] = build()
        except Exception:  # noqa: BLE001 — degrade to rows-only
            out.pop(name, None)
    return out
