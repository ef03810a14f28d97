"""IR ranking metrics as distributed aggregations.

DCG/NDCG@k, precision@k, MAP over (query_id, rank, doc_id) rankings
joined to qrels (query_id, doc_id, relevance).  Formulas match
reference benchmarks/metrics.py:36-73 (gain rel_i / log2(i+1) with
1-based ranks ⇒ log2(rank+1)); Spark MLlib's RankingEvaluator uses a
different formula, so these are implemented directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_rel(ranking: DataFrame, qrels: DataFrame) -> DataFrame:
    return ranking.join(qrels, ["query_id", "doc_id"], "left").withColumn(
        "rel", F.coalesce(F.col("relevance"), F.lit(0)).cast("double")
    )


def ndcg_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, ndcg): DCG of the ranking's top-k over the ideal DCG of
    that query's qrels (top-k of relevances sorted descending).

    This is the STANDARD qrels-based NDCG.  The reference
    (benchmarks/metrics.py:45-51) normalizes by the retrieved list's own
    sorted relevances instead — a deliberate deviation; use
    ``kernel.score_metrics.ndcg_at_k(..., ideal_relevances=qrels_rels)``
    for the qrels-based value kernel-side, or its default for reference
    parity.  The two coincide when the top-k retrieves every relevant
    doc of the query."""
    dcg = (
        _with_rel(ranking.where(F.col("rank") <= k), qrels)
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("relevance"), F.asc("doc_id"))
    ideal = (
        qrels.where(F.col("relevance") > 0)
        .withColumn("irank", F.row_number().over(w))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("relevance").cast("double") / F.log2(F.col("irank") + 1)).alias("idcg"))
    )
    return (
        dcg.join(ideal, "query_id", "left")
        .withColumn(
            "ndcg",
            F.when(F.coalesce("idcg", F.lit(0.0)) > 0.0, F.col("dcg") / F.col("idcg")).otherwise(
                F.lit(0.0)
            ),
        )
        .select("query_id", "ndcg")
    )


def precision_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    return (
        _with_rel(ranking.where(F.col("rank") <= k), qrels)
        .groupBy("query_id")
        .agg((F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)) / k).alias("precision"))
    )


def average_precision(ranking: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query_id, ap): mean over relevant retrieved docs of
    precision-at-their-rank; 0 for queries with no relevant retrieved."""
    rel = _with_rel(ranking, qrels)
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = rel.withColumn(
        "cum_hits", F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(w)
    )
    return (
        hits.groupBy("query_id")
        .agg(
            (
                F.coalesce(
                    F.sum(
                        F.when(F.col("rel") > 0, F.col("cum_hits") / F.col("rank"))
                    )
                    / F.sum(F.when(F.col("rel") > 0, 1)),
                    F.lit(0.0),
                )
            ).alias("ap")
        )
    )


def mean_metric(per_query: DataFrame, col: str) -> float:
    """Mean over queries — the corpus-level headline number."""
    return float(per_query.agg(F.avg(col)).collect()[0][0])
