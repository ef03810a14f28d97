"""Per-query search diagnostics / separability gate as aggregations.

Distributed form of kernel.diagnostics: cohesion/separation are
conditional means over rank bands of the per-query candidate list, the
gate a row-local expression over them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def separability_gates(
    ranked_sims: DataFrame,
    local_k: int = 10,
    shell_k: int = 10,
    min_gate: float = 0.02,
    max_gate: float = 0.98,
    sim_col: str = "sim",
) -> DataFrame:
    """(query_id, cohesion, separation, gate) from a ranked similarity
    frame (query_id, rank, sim): accepted band = ranks ≤ local_k,
    contrast shell = the next shell_k ranks (purity/coverage = 1 for the
    exact backend, reference search_diagnostics.py:66-96)."""
    d = ranked_sims.withColumn("dist", 1.0 - F.col(sim_col))
    agg = d.groupBy("query_id").agg(
        F.avg(F.when(F.col("rank") <= local_k, F.col("dist"))).alias("cohesion"),
        F.avg(
            F.when(
                (F.col("rank") > local_k) & (F.col("rank") <= local_k + shell_k),
                F.col("dist"),
            )
        ).alias("separation"),
    )
    a = F.greatest(F.col("cohesion"), F.lit(0.0))
    b = F.greatest(F.coalesce(F.col("separation"), F.col("cohesion")), F.lit(0.0))
    score = F.greatest((b - a) / F.greatest(a, b, F.lit(1e-12)), F.lit(0.0))
    gate = F.least(F.greatest(score, F.lit(min_gate)), F.lit(max_gate))
    return agg.select(
        "query_id",
        "cohesion",
        F.coalesce("separation", "cohesion").alias("separation"),
        gate.alias("gate"),
    )


def ranked_cosines(sims: DataFrame, max_rank: int, sim_col: str = "sim") -> DataFrame:
    """Attach per-query ranks (sim desc, vec_id asc) and keep ≤ max_rank."""
    w = Window.partitionBy("query_id").orderBy(F.desc(sim_col), F.asc("vec_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= max_rank)
