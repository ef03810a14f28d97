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

from bayesian_bm25_spark.entry_queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: inverted-index BM25 top-10 (rank-pinned) on sf0.001."""
    return SPARK_QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; see SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible entry.

    Entries absent here (compressed_postings, isotonic_calibrate,
    multimodal_features, attention_fusion) are non-SQL-expressible
    (binary codec, PAVA, stub decode, seeded-matrix forward) and get the
    driver's rows-only check; their exactness is covered by pytest
    goldens against the numpy kernel.
    """
    return dict(ORACLE_SQL)
