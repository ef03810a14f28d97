"""Boolean NOT / exclusion queries via probabilistic fusion
(Spark analog of reference examples/boolean_not.py):
P(cat AND NOT dog) per document, as pure Column math."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.api import BayesianBM25Scorer
from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.sources.webcorpus import queries_to_df

CORPUS = [
    "the cat sat on the mat".split(),
    "the dog chased the cat".split(),
    "hello world".split(),
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
    scorer = BayesianBM25Scorer(spark=spark)
    scorer.index(CORPUS)

    qdf = queries_to_df(spark, [["cat"], ["dog"]])
    dense = scorer.get_probabilities_df(qdf)
    cat = dense.where("query_id = 0").select("doc_id", F.col("probability").alias("p_cat"))
    dog = dense.where("query_id = 1").select("doc_id", F.col("probability").alias("p_dog"))
    joined = (
        cat.join(dog, "doc_id", "full_outer")
        .fillna(0.0)
        .withColumn(
            "p_cat_and_not_dog",
            C.prob_and(F.array(F.col("p_cat"), C.prob_not(F.col("p_dog")))),
        )
        .orderBy(F.desc("p_cat_and_not_dog"))
    )
    joined.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
