"""Vector-probability calibration as Spark operators.

Background fit is a corpus aggregation; per-query calibration (KDE/GMM
over the candidate set) runs inside one Arrow batch per query via
``applyInPandas`` — candidate sets are ≤ ~1000 rows, so the iterative
math never crosses a partition (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.kernel.vector_calibrate import VectorProbabilityTransform


def fit_background(distances: DataFrame, col: str = "distance",
                   base_rate: float | None = None) -> VectorProbabilityTransform:
    """μ_G/σ_G from a corpus distance sample: one agg, driver-held params."""
    row = distances.agg(
        F.avg(col).alias("mu"), F.stddev_pop(col).alias("sigma")
    ).collect()[0]
    return VectorProbabilityTransform(
        mu_G=float(row["mu"]),
        sigma_G=max(float(row["sigma"]), 1e-10),
        base_rate=base_rate,
    )


def calibrate_per_query(
    cands: DataFrame,
    vpt: VectorProbabilityTransform,
    dist_col: str = "distance",
    weight_col: str | None = None,
    method: str = "auto",
    bandwidth_factor: float = 2.0,
) -> DataFrame:
    """(query_id, vec_id, distance, vector_prob): density-ratio
    calibration per query group (auto-routing KDE/GMM per reference
    Strategy 4.6.1 / Algorithm 5.3.1)."""
    import pandas as pd

    params = vpt.to_dict()
    wcol = weight_col

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        t = VectorProbabilityTransform.from_dict(params)
        w = pdf[wcol].to_numpy() if wcol else None
        pdf = pdf.copy()
        pdf["vector_prob"] = t.calibrate(
            pdf[dist_col].to_numpy(), weights=w, method=method,
            bandwidth_factor=bandwidth_factor,
        )
        return pdf

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(cands.schema.fields) + [StructField("vector_prob", DoubleType())])
    return cands.groupBy("query_id").applyInPandas(run, schema=schema)


def distances_from_embeddings(
    embeddings: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_emb_col: str = "q_emb",
) -> DataFrame:
    """(query_id, vec_id, distance): cosine distance 1 − cos against the
    broadcast query set."""
    return embeddings.crossJoin(F.broadcast(queries)).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        (1.0 - C.cosine_similarity(F.col(emb_col), F.col(query_emb_col))).alias("distance"),
    )


def with_ivf_density_prior(df: DataFrame, avg_population: float,
                           gamma: float = 1.0,
                           pop_col: str = "population") -> DataFrame:
    """+density_prior = σ(γ·(avg_pop/pop − 1)) (pure Column math)."""
    ratio = F.lit(float(avg_population)) / F.greatest(F.col(pop_col).cast("double"), F.lit(1e-10))
    return df.withColumn("density_prior", C.sigmoid(F.lit(float(gamma)) * (ratio - 1.0)))


def with_knn_density_prior(df: DataFrame, global_median_kth: float,
                           gamma: float = 1.0,
                           kth_col: str = "kth_distance") -> DataFrame:
    """+density_prior = σ(γ·(kth_d/median_kth − 1))."""
    ratio = F.col(kth_col) / F.lit(max(float(global_median_kth), 1e-10))
    return df.withColumn("density_prior", C.sigmoid(F.lit(float(gamma)) * (ratio - 1.0)))
