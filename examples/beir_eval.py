"""End-to-end IR evaluation on a local BEIR-format dataset.

Usage:
    spark-submit examples/beir_eval.py /path/to/beir-dataset [split]

The dataset directory holds the standard BEIR layout (corpus.jsonl,
queries.jsonl, qrels/<split>.tsv).  The flow is the reference's
benchmark loop (benchmarks/utils.py + metrics.py) re-expressed on
DataFrames: load → build index → retrieve top-k → qrels-joined NDCG /
P@k / MAP, all distributed.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from bayesian_bm25_spark.operators import query as Q
from bayesian_bm25_spark.operators.index_build import IndexConfig, build_index
from bayesian_bm25_spark.operators.ir_metrics import (
    average_precision,
    mean_metric,
    ndcg_at_k,
    precision_at_k,
)
from bayesian_bm25_spark.sources.beir_local import load_ir_dataset


def main() -> None:
    data_dir = sys.argv[1]
    split = sys.argv[2] if len(sys.argv) > 2 else "test"
    spark = (
        SparkSession.builder.appName("bb25-beir-eval")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ds = load_ir_dataset(spark, data_dir, split=split)
    idx = build_index(
        spark,
        ds.pages,
        tempfile.mkdtemp(prefix="bb25_beir_idx_"),
        # stemmer="porter2", stopwords="english" reproduces the
        # reference's published BEIR tokenizer protocol
        # (bm25s.tokenize(stemmer=Snowball-en, stopwords="english"),
        # hybrid_beir.py:288-296); left off here so the default run
        # matches the plain whitespace contract
        IndexConfig(base_rate="auto"),
    )
    ranking = Q.retrieve(
        idx.postings, ds.queries, idx.params, idx.avgdl,
        k=10, n_buckets=idx.config.n_buckets,
    )
    print(f"{ds.name} ({split}): {idx.n_docs} docs, {ds.queries.count()} queries")
    print(f"  NDCG@10 = {mean_metric(ndcg_at_k(ranking, ds.qrels, 10), 'ndcg'):.4f}")
    print(f"  P@10    = {mean_metric(precision_at_k(ranking, ds.qrels, 10), 'precision'):.4f}")
    print(f"  MAP     = {mean_metric(average_precision(ranking, ds.qrels), 'ap'):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
