"""Weighted multi-field search (Spark analog of reference
examples/multi_field_search.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from bayesian_bm25_spark.api import MultiFieldScorer

DOCS = [
    {"title": "cat sat mat".split(), "body": "the cat sat on the mat".split()},
    {"title": "dog chased cat".split(), "body": "the dog chased the cat around".split()},
    {"title": "hello world".split(), "body": "hello world program".split()},
    {"title": "machine learning".split(),
     "body": "machine learning is a subset of artificial intelligence".split()},
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mf = MultiFieldScorer(
        fields=["title", "body"],
        field_weights={"title": 0.4, "body": 0.6},
        spark=spark,
    )
    mf.index(DOCS)
    ids, probs = mf.retrieve([["cat"], ["machine", "learning"]], k=2)
    for qi, q in enumerate((["cat"], ["machine", "learning"])):
        print(f"query {q}: " + ", ".join(
            f"doc {d} (P={p:.4f})" for d, p in zip(ids[qi], probs[qi]) if d >= 0
        ))
    spark.stop()


if __name__ == "__main__":
    main()
