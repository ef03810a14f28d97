"""Training-data dedup ladder on a document table: exact → MinHash-LSH →
exact-Jaccard verify → SimHash fingerprints."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from bayesian_bm25_spark.operators import dedup as DD

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "The quick  brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text about spark engines"),
    (4, "completely different text about spark engines"),
    (5, "unrelated short doc"),
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")

    print("exact duplicate groups:")
    DD.exact_duplicates(docs).show(truncate=False)

    print("MinHash-LSH candidates + exact Jaccard verify (≥ 0.5):")
    sh = DD.shingles(docs)
    pairs = DD.minhash_lsh_pairs(docs)
    DD.jaccard_verify(sh, pairs, threshold=0.5).orderBy("a", "b").show()

    print("SimHash fingerprints:")
    DD.simhash64(docs).orderBy("doc_id").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
