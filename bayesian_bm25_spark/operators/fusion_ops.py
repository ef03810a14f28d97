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


def per_query_signal_calibration(
    cands: DataFrame, col: str, prefix: str
) -> DataFrame:
    """(query_id, {prefix}_median, {prefix}_alpha): exact median and
    1/std_pop of the POSITIVE values of ``col`` per query (reference
    _compute_dense_calibration, hybrid_beir.py:803-812).  No positives →
    (0, 1); zero std → alpha 1.

    Per-query exact ``percentile`` is safe here: each group is one
    query's bounded candidate set, computed on its own reducer — not
    the single-reducer global-percentile trap."""
    pos = cands.where(F.col(col) > 0)
    return pos.groupBy("query_id").agg(
        F.expr(f"percentile({col}, 0.5)").alias(f"{prefix}_median"),
        F.when(F.stddev_pop(col) > 0, 1.0 / F.stddev_pop(col))
        .otherwise(F.lit(1.0))
        .alias(f"{prefix}_alpha"),
    )


def _clip_logit(x: F.Column, bound: float = 500.0) -> F.Column:
    return F.least(F.greatest(x, F.lit(-bound)), F.lit(bound))


def _join_calibrations(cands: DataFrame, *cals: tuple[DataFrame, str]) -> DataFrame:
    """Left-join per-query calibration frames with (0, 1) fallbacks for
    queries that had no positive rows.  The calibration frames are one
    row per query — broadcast them."""
    out = cands
    for cal, prefix in cals:
        out = (
            out.join(F.broadcast(cal), "query_id", "left")
            .withColumn(
                f"{prefix}_median", F.coalesce(f"{prefix}_median", F.lit(0.0))
            )
            .withColumn(
                f"{prefix}_alpha", F.coalesce(f"{prefix}_alpha", F.lit(1.0))
            )
        )
    return out


def logodds_local_fusion(
    cands: DataFrame,
    w_sparse: float = 0.5,
    w_dense: float = 0.5,
    signal_alpha: float = 0.5,
) -> DataFrame:
    """Symmetric per-query calibrated log-odds fusion (reference
    fusion_logodds_local, hybrid_beir.py:646-677): BOTH signals enter
    logit space as α·(s − median) — no prob→logit round trip — and the
    weighted logit mean is rescaled by n_signals^signal_alpha when the
    doc has sparse evidence (σ of the dense half alone otherwise).

    ``cands``: (query_id, doc_id, score, cos_dense) zero-filled union.
    """
    scale = float(2**signal_alpha)
    s_cal = per_query_signal_calibration(cands, "score", "s")
    d_cal = per_query_signal_calibration(cands, "cos_dense", "d")
    j = _join_calibrations(cands, (s_cal, "s"), (d_cal, "d"))
    l_d = _clip_logit(F.col("d_alpha") * (F.col("cos_dense") - F.col("d_median")))
    l_s = _clip_logit(F.col("s_alpha") * (F.col("score") - F.col("s_median")))
    raw = F.when(
        F.col("score") > 0, (w_dense * l_d + w_sparse * l_s) * scale
    ).otherwise(w_dense * l_d)
    return j.withColumn("fused", C.sigmoid(raw))


def logodds_posterior_fusion(
    cands: DataFrame,
    alpha: float,
    beta: float,
    avgdl: float,
    base_rate: float | None = None,
    w_sparse: float = 0.5,
    w_dense: float = 0.5,
    signal_alpha: float = 0.5,
) -> DataFrame:
    """Log-odds fusion with the FULL BM25 posterior assembled directly
    in logit space (reference fusion_bayesian_bm25_logodds[_br],
    hybrid_beir.py:595-733, Theorem 7.1.1):

        logit_sparse = clip(α·(score−β) + logit(prior) [+ logit(base_rate)])

    — likelihood, composite prior, and base rate added as logits,
    sigmoid applied ONCE at the end, avoiding the prob→logit saturation
    round trip.  Dense is calibrated per query as in
    ``logodds_local_fusion``.

    ``cands``: (query_id, doc_id, score, tf_match, doc_len, cos_dense)
    zero-filled union."""
    import math

    scale = float(2**signal_alpha)
    d_cal = per_query_signal_calibration(cands, "cos_dense", "d")
    j = _join_calibrations(cands, (d_cal, "d"))
    prior = C.composite_prior(
        F.col("tf_match").cast("double"),
        F.col("doc_len").cast("double") / F.lit(float(avgdl)),
    )
    logit_s = alpha * (F.col("score") - F.lit(beta)) + C.logit(prior)
    if base_rate is not None:
        logit_s = logit_s + F.lit(math.log(base_rate / (1.0 - base_rate)))
    l_s = _clip_logit(logit_s)
    l_d = _clip_logit(F.col("d_alpha") * (F.col("cos_dense") - F.col("d_median")))
    raw = F.when(
        F.col("score") > 0, (w_dense * l_d + w_sparse * l_s) * scale
    ).otherwise(w_dense * l_d)
    return j.withColumn("fused", C.sigmoid(raw))


def kappa_calibrate(cands: DataFrame, dist_col: str = "distance",
                    out_col: str = "p_dense") -> DataFrame:
    """Global sigmoid calibration of cosine DISTANCES (reference
    _global_kappa_calibrate, hybrid_beir.py:739-768, Paper 3 §8.4
    Stage 1): P = σ(κ·(β − d)) with β = corpus median(d), κ = 1/std_pop(d)
    (1.0 when std ≤ 1e-12).  β and κ are two driver-held floats
    (fit_background style); the exact median uses the DISTRIBUTED
    bracketed two-pass (operators.stats.exact_percentile) — never
    Spark's single-reducer global ``percentile``."""
    from bayesian_bm25_spark.operators.stats import exact_percentile

    beta = exact_percentile(cands.select(dist_col), dist_col, 0.5)
    sd_row = cands.agg(F.stddev_pop(dist_col)).collect()[0][0]
    sd = float(sd_row) if sd_row is not None else 0.0
    kappa = 1.0 / sd if sd > 1e-12 else 1.0
    return cands.withColumn(
        out_col, C.sigmoid(F.lit(kappa) * (F.lit(beta) - F.col(dist_col)))
    )


def arctan_normalize(score: F.Column, alpha: float = 5.0) -> F.Column:
    """p = (2/π)·arctan(α·s) — the reference's arctan dense-calibration
    baseline (hybrid_beir.py:744-752, Paper 3 §8.2)."""
    import math

    return (2.0 / math.pi) * F.atan(alpha * score)


def vpt_balanced_fusion(
    cands: DataFrame,
    sparse_col: str = "p_sparse",
    dense_col: str = "p_dense",
    sparse_weight: float = 1.0,
    dense_weight: float = 1.0,
    max_logit: float = 12.0,
) -> DataFrame:
    """Std-ratio-balanced additive log-odds fusion (reference
    fusion_vpt_balanced, hybrid_beir.py:814-848): clamp both logits to
    ±max_logit, scale the dense side by min(1, std(l_sparse)/std(l_dense))
    per query, add, sigmoid.  The per-query stds are window aggregates
    over the candidate set (floored at 1e-6)."""
    ls = F.greatest(
        F.least(C.logit(F.col(sparse_col)), F.lit(max_logit)), F.lit(-max_logit)
    )
    ld = F.greatest(
        F.least(C.logit(F.col(dense_col)), F.lit(max_logit)), F.lit(-max_logit)
    )
    w = Window.partitionBy("query_id")
    ss = F.greatest(F.stddev_pop(ls).over(w), F.lit(1e-6))
    sd = F.greatest(F.stddev_pop(ld).over(w), F.lit(1e-6))
    scale = dense_weight * F.least(F.lit(1.0), ss / sd)
    fused_logit = sparse_weight * ls + scale * ld
    clipped = F.greatest(F.least(fused_logit, F.lit(max_logit)), F.lit(-max_logit))
    return cands.withColumn("fused", C.sigmoid(clipped))
