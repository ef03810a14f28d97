"""Understanding why a document received a particular fused score
(Spark analog of reference examples/fusion_debugger.py):
the trace structs (`bm25_trace`, `vector_trace`, `not_trace`,
`fusion_trace`) record every intermediate of the pipeline as nested
Columns — so "debug one doc" and "trace a million docs" are the same
plan, and `compare_documents` explains a rank difference.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.kernel.transform import TransformParams
from bayesian_bm25_spark.operators.explain_traces import (
    bm25_trace,
    compare_documents,
    format_comparison,
    fusion_trace,
    not_trace,
    vector_trace,
)

PARAMS = TransformParams(alpha=0.45, beta=6.10, base_rate=0.02)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. Trace a single BM25 signal --------------------------------
    one = spark.createDataFrame([(8.42, 5, 0.60)], "score double, tf int, dlr double")
    traced = one.withColumn(
        "trace", bm25_trace(F.col("score"), F.col("tf"), F.col("dlr"), PARAMS)
    )
    print("BM25 signal trace (every pipeline intermediate):")
    traced.select("trace.*").show(truncate=False, vertical=True)

    # --- 2. Full document trace: BM25 + vector + fusion ---------------
    docs = spark.createDataFrame(
        [("doc-42", 8.42, 5, 0.60, 0.74), ("doc-17", 9.80, 1, 2.10, 0.31)],
        "doc_id string, score double, tf int, dlr double, cosine double",
    )
    full = (
        docs.withColumn("bm25", bm25_trace(F.col("score"), F.col("tf"), F.col("dlr"), PARAMS))
        .withColumn("vector", vector_trace(F.col("cosine")))
        .withColumn(
            "fusion",
            fusion_trace(
                F.array(F.col("bm25.posterior"), F.col("vector.probability")),
                ["bm25", "vector"],
            ),
        )
    )
    print("Per-signal posterior + fused probability per document:")
    full.select(
        "doc_id",
        F.col("bm25.posterior").alias("p_bm25"),
        F.col("vector.probability").alias("p_vector"),
        F.col("fusion.scaled_logit").alias("scaled_logit"),
        F.col("fusion.fused_probability").alias("p_fused"),
    ).show(truncate=False)

    # --- 3. NOT trace (exclusion evidence) ----------------------------
    print("NOT trace of the vector signal:")
    full.select("doc_id", not_trace(F.col("vector.probability"), "vector").alias("n")) \
        .select("doc_id", "n.*").show(truncate=False)

    # --- 4. Compare two documents: which signal drove the rank? -------
    cmp_frame = full.select(
        F.lit(0).alias("query_id"),
        F.when(F.col("doc_id") == "doc-42", 0).otherwise(1).alias("doc_id"),
        F.col("doc_id").alias("label"),
        F.col("bm25").alias("trace"),
        F.col("fusion.fused_probability").alias("probability"),
    )
    comparison = compare_documents(cmp_frame, query_id=0, doc_a=0, doc_b=1)
    print(format_comparison(comparison))
    spark.stop()


if __name__ == "__main__":
    main()
