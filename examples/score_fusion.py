"""Probabilistic score fusion: AND/OR/conjunction/gating over signal
columns (Spark analog of reference examples/score_fusion.py and
examples/gating_functions.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C


def main() -> None:
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = [(0, 0.85, 0.70), (1, 0.90, 0.90), (2, 0.70, 0.30), (3, 0.30, 0.30)]
    df = spark.createDataFrame(rows, "doc_id long, p_bm25 double, p_vector double")
    arr = F.array("p_bm25", "p_vector")
    out = df.select(
        "doc_id",
        "p_bm25",
        "p_vector",
        F.round(C.prob_and(arr), 4).alias("AND"),
        F.round(C.prob_or(arr), 4).alias("OR"),
        F.round(C.log_odds_conjunction(arr), 4).alias("conj"),
        F.round(C.log_odds_conjunction(arr, weights=[0.7, 0.3]), 4).alias("wconj"),
        F.round(C.log_odds_conjunction(arr, gating="swish"), 4).alias("swish"),
    )
    out.show()
    spark.stop()


if __name__ == "__main__":
    main()
