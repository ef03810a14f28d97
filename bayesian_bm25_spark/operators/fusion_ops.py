"""Hybrid retrieval fusion over (query_id, doc_id, signal...) frames.

The reference's retrieve-then-fuse protocol (hybrid_beir.py): top-R
candidates per signal, candidate union (full-outer join), fusion column,
top-k.  All per-query normalizations are window aggregates over the
candidate set — the only fusion math that is not row-local.

- convex fusion  ............ reference hybrid_beir.py:559-567
- RRF (k=60, rank 0 = absent)  reference hybrid_beir.py:570-582
- balanced log-odds fusion ... reference fusion.py:283-343 (per-query
  min-max of sparse/dense logits; zero-variance → zeros)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C


def union_candidates(
    sparse: DataFrame,
    dense: DataFrame,
    sparse_col: str = "probability",
    dense_col: str = "sim",
) -> DataFrame:
    """Full-outer candidate union with neutral fills: missing sparse
    probability → 0.0, missing dense cosine → 0.0 (reference
    union-candidates protocol, hybrid_beir.py:1487-1489)."""
    s = sparse.select("query_id", "doc_id", F.col(sparse_col).alias("p_sparse"))
    d = dense.select("query_id", "doc_id", F.col(dense_col).alias("cos_dense"))
    return (
        s.join(d, ["query_id", "doc_id"], "full_outer")
        .withColumn("p_sparse", F.coalesce("p_sparse", F.lit(0.0)))
        .withColumn("cos_dense", F.coalesce("cos_dense", F.lit(0.0)))
    )


def _minmax_over_query(col: F.Column) -> F.Column:
    """Per-query min-max to [0,1]; all-zeros when the span < 1e-12
    (mirrors kernel.combine.min_max_normalize per candidate set)."""
    w = Window.partitionBy("query_id")
    lo, hi = F.min(col).over(w), F.max(col).over(w)
    return F.when(hi - lo < 1e-12, F.lit(0.0)).otherwise((col - lo) / (hi - lo))


def convex_fusion(cands: DataFrame, weight: float = 0.5) -> DataFrame:
    """w·minmax(dense cosine) + (1−w)·minmax(sparse prob)."""
    return cands.withColumn(
        "fused",
        weight * _minmax_over_query(F.col("cos_dense"))
        + (1.0 - weight) * _minmax_over_query(F.col("p_sparse")),
    )


def rrf_fusion(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 60,
    sparse_col: str = "probability",
    dense_col: str = "sim",
) -> DataFrame:
    """Reciprocal-rank fusion: Σ 1/(k + rank); a doc absent from a signal
    contributes 0 for it."""
    ws = Window.partitionBy("query_id").orderBy(F.desc(sparse_col), F.asc("doc_id"))
    wd = Window.partitionBy("query_id").orderBy(F.desc(dense_col), F.asc("doc_id"))
    s = sparse.select(
        "query_id", "doc_id", (1.0 / (k + F.row_number().over(ws))).alias("rrf_s")
    )
    d = dense.select(
        "query_id", "doc_id", (1.0 / (k + F.row_number().over(wd))).alias("rrf_d")
    )
    return (
        s.join(d, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "fused", F.coalesce("rrf_s", F.lit(0.0)) + F.coalesce("rrf_d", F.lit(0.0))
        )
        .select("query_id", "doc_id", "fused")
    )


def balanced_fusion(cands: DataFrame, weight: float = 0.5) -> DataFrame:
    """Per-query min-max-normalized logits, convex mix — returns a score
    column ``fused`` (not a probability), reference fusion.py:283-333."""
    logit_sparse = C.logit(F.col("p_sparse"))
    logit_dense = C.logit(C.cosine_to_probability(F.col("cos_dense")))
    return cands.withColumn(
        "fused",
        weight * _minmax_over_query(logit_dense)
        + (1.0 - weight) * _minmax_over_query(logit_sparse),
    )


def conjunction_fusion(
    cands: DataFrame,
    alpha: float | str | None = None,
    weights: list[float] | None = None,
    gating: str = "none",
) -> DataFrame:
    """Log-odds conjunction of sparse probability and cosine→probability
    (the Bayesian-OR/AND family reduces to the same array expression)."""
    arr = F.array(F.col("p_sparse"), C.cosine_to_probability(F.col("cos_dense")))
    return cands.withColumn(
        "fused", C.log_odds_conjunction(arr, alpha=alpha, weights=weights, gating=gating)
    )


def topk_fused(fused: DataFrame, k: int = 10, col: str = "fused") -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc(col), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", col)
    )
