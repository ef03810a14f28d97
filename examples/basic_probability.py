"""Converting raw BM25 scores to calibrated probabilities
(Spark analog of reference examples/basic_probability.py):
the whole likelihood -> prior -> posterior pipeline as ONE codegen'd
Column expression over a DataFrame — no UDFs, no collect-side math.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C

ALPHA, BETA = 1.5, 1.0


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- Example 1: single document (a 1-row frame) -------------------
    one = spark.createDataFrame([(2.3, 4, 0.8)], "score double, tf int, dlr double")
    one = one.withColumn(
        "probability",
        C.score_to_probability(
            F.col("score"), F.col("tf"), F.col("dlr"), alpha=ALPHA, beta=BETA
        ),
    )
    print("Single document:")
    one.show()

    # --- Example 2: batch conversion ----------------------------------
    rows = [(0.5, 1, 0.3), (1.0, 2, 0.5), (1.5, 3, 0.8), (2.0, 5, 1.0), (3.0, 8, 1.5)]
    batch = spark.createDataFrame(rows, "score double, tf int, dlr double")
    batch = batch.withColumn(
        "probability",
        C.score_to_probability(
            F.col("score"), F.col("tf"), F.col("dlr"), alpha=ALPHA, beta=BETA
        ),
    )
    print("Batch conversion (one vectorized expression, scales to any row count):")
    batch.orderBy("score").show()

    # --- Example 3: the pipeline's components, each its own Column ----
    parts = (
        spark.createDataFrame([(2.0, 5, 1.0)], "score double, tf int, dlr double")
        .withColumn("likelihood", C.likelihood(F.col("score"), ALPHA, BETA))
        .withColumn("tf_prior", C.tf_prior(F.col("tf")))
        .withColumn("norm_prior", C.norm_prior(F.col("dlr")))
        .withColumn("composite_prior", C.composite_prior(F.col("tf"), F.col("dlr")))
        .withColumn(
            "posterior", C.posterior(F.col("likelihood"), F.col("composite_prior"))
        )
    )
    print("Pipeline breakdown for score=2.0, tf=5, ratio=1.0:")
    parts.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
