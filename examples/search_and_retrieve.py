"""Index a corpus and retrieve with calibrated probabilities
(Spark analog of reference examples/search_and_retrieve.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from bayesian_bm25_spark.api import BayesianBM25Scorer

CORPUS = [
    "the cat sat on the mat".split(),
    "the dog chased the cat".split(),
    "a quick brown fox jumps over the lazy dog".split(),
    "hello world".split(),
    "machine learning is a subset of artificial intelligence".split(),
    "the cat and the dog are friends".split(),
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    scorer = BayesianBM25Scorer(spark=spark, base_rate="auto")
    scorer.index(CORPUS)
    print(f"indexed {scorer.num_docs} docs, avgdl={scorer.avgdl:.2f}, "
          f"base_rate={scorer.base_rate:.4g}")

    queries = [["cat"], ["machine", "learning"]]
    doc_ids, probs = scorer.retrieve(queries, k=3)
    for qi, q in enumerate(queries):
        print(f"query {q}:")
        for d, p in zip(doc_ids[qi], probs[qi]):
            if d >= 0:
                print(f"  doc {d}: P(relevant) = {p:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
