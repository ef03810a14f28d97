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

    Every registered entry is oracle-checked: the iterative fits
    (isotonic PAVA, IVF k-means centroids, per-query KDE/GMM vector
    calibration) use data-dependent builders that fit driver-side and
    inline ONLY the fitted parameters into the SQL, which then evaluates
    the model, the posterior, and the top-k itself.  The binary
    posting-list codec is checked too — the SQL predicts the exact
    varbyte byte sizes from the layout.
    """
    out = dict(ORACLE_SQL)
    for name, build in ORACLE_SQL_BUILDERS.items():
        try:
            out[name] = build()
        except Exception:  # noqa: BLE001 — degrade to rows-only
            out.pop(name, None)
    return out
