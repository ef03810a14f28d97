"""Sparse-signal gating for noisy multi-signal fusion
(Spark analog of reference examples/gating_functions.py):
each gating mode (none / relu / swish / gelu / softplus) is a Column
transform applied inside ``log_odds_conjunction``, so the comparison
table is a single select over an array column — no per-row Python.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C

MODES = ["none", "relu", "swish", "gelu", "softplus"]


def fuse_table(spark, name, signals):
    df = spark.createDataFrame([(signals,)], "probs array<double>")
    cols = [F.col("probs")] + [
        C.log_odds_conjunction(F.col("probs"), gating=m).alias(m) for m in MODES
    ]
    print(f"{name}: signals={signals}")
    df.select(*cols).show(truncate=False)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. Gating comparison on mixed vs uniformly strong signals ----
    fuse_table(spark, "Mixed (strong/weak/moderate)", [0.9, 0.3, 0.7])
    fuse_table(spark, "All strong (gating barely matters)", [0.9, 0.8, 0.7])

    # --- 2. Generalized swish: beta controls gate sharpness -----------
    print("Generalized swish: beta->0 soft (x/2), beta=1 standard, beta->inf ReLU")
    df = spark.createDataFrame([([0.9, 0.3, 0.7],)], "probs array<double>")
    df.select(
        *[
            C.log_odds_conjunction(F.col("probs"), gating="swish", gating_beta=b)
            .alias(f"swish_b{b}")
            for b in (0.1, 0.5, 1.0, 2.0, 10.0)
        ]
    ).show(truncate=False)

    # --- 3. Practical: suppress an unreliable metadata signal ---------
    # Rows = candidate docs; metadata probability is noise for half.
    rows = [
        ("doc-good", [0.85, 0.80, 0.75]),
        ("doc-meta-noise", [0.85, 0.80, 0.15]),
        ("doc-weak", [0.55, 0.50, 0.10]),
    ]
    docs = spark.createDataFrame(rows, "doc string, probs array<double>")
    print("Hybrid candidates: relu gating drops sub-0.5 evidence instead of")
    print("letting it veto strong signals (softplus keeps all evidence):")
    docs.select(
        "doc",
        C.log_odds_conjunction(F.col("probs"), gating="none").alias("none"),
        C.log_odds_conjunction(F.col("probs"), gating="relu").alias("relu"),
        C.log_odds_conjunction(F.col("probs"), gating="softplus").alias("softplus"),
    ).orderBy(F.desc("relu")).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
