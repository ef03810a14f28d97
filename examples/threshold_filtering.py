"""Probability-based relevance filtering and confidence bucketing
(Spark analog of reference examples/threshold_filtering.py):
because calibrated probabilities mean the same thing across queries,
one threshold works for every query — expressed as a plain DataFrame
filter / CASE WHEN instead of per-query score tuning.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.api import BayesianBM25Scorer
from bayesian_bm25_spark.sources.webcorpus import queries_to_df

CORPUS_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a fox in the wild hunts for food",
    "the dog sleeps peacefully by the fireplace",
    "quick sort is a fast sorting algorithm",
    "brown sugar is used in many baking recipes",
    "the lazy programmer automated everything",
    "a wild fox was spotted near the river",
    "dogs are loyal companions to humans",
    "the algorithm runs in linear time",
    "baking bread requires patience and practice",
]

HIGH, LOW = 0.27, 0.20


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scorer = BayesianBM25Scorer(spark=spark, k1=1.2, b=0.75, method="lucene")
    scorer.index([t.lower().split() for t in CORPUS_TEXTS])

    queries = [["fox"], ["dog"], ["algorithm"]]
    dense = scorer.get_probabilities_df(queries_to_df(spark, queries))

    # --- Confidence bucketing: one CASE WHEN, any number of queries ---
    bucketed = (
        dense.where(F.col("probability") > 0)
        .withColumn(
            "confidence",
            F.when(F.col("probability") >= HIGH, "high")
            .when(F.col("probability") >= LOW, "medium")
            .otherwise("low"),
        )
        .orderBy("query_id", F.desc("probability"))
    )
    print(f"Confidence buckets (HIGH>={HIGH}, LOW>={LOW}) across all queries:")
    bucketed.show(30, truncate=False)

    # --- Cross-query thresholding: same threshold, every query --------
    print("Relevant documents per query at the shared P >= %.2f threshold:" % LOW)
    (
        dense.where(F.col("probability") >= LOW)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_relevant"))
        .orderBy("query_id")
        .show()
    )

    texts = {i: t for i, t in enumerate(CORPUS_TEXTS)}
    for q_id, q in enumerate(queries):
        hits = (
            bucketed.where((F.col("query_id") == q_id) & (F.col("probability") >= LOW))
            .select("doc_id", "probability")
            .collect()
        )
        print(f"  {q!r} -> {len(hits)} relevant")
        for r in hits:
            print(f"    P={r['probability']:.4f}  {texts[r['doc_id']][:50]}")
    spark.stop()


if __name__ == "__main__":
    main()
