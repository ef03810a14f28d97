"""Produce BENCH/QUALITY.md: the fusion-matrix quality table on the
synthetic BEIR fixture (NDCG@10 / MAP / P@10 per method).

Usage: python tools/quality_beir.py  (from the repo root)
"""

from __future__ import annotations

import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("quality-beir")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bayesian_bm25_spark.operators.quality import (
        evaluate_fusion_matrix,
        format_quality_table,
    )
    from bayesian_bm25_spark.sources.synthetic_beir import write_fixture

    work = tempfile.mkdtemp(prefix="quality_beir_")
    fixture = write_fixture(work)
    results = evaluate_fusion_matrix(spark, fixture, work, k=10)
    table = format_quality_table(results, k=10)

    out = os.path.join(ROOT, "BENCH", "QUALITY.md")
    with open(out, "w") as f:
        f.write(
            """# Retrieval quality — fusion matrix on the synthetic BEIR fixture

End-to-end quality story, mirroring the reference's README quality
tables (README.md:410-433, produced by benchmarks/hybrid_beir.py):
BM25 and dense retrieval fused by each method, scored with NDCG@10 /
MAP / P@10 against qrels via `operators/ir_metrics.py`.

Fixture: `sources/synthetic_beir.write_fixture` (seeded, 20 topics,
200 relevant + 200 distractor/noise docs, 32-dim embeddings).  The two
signals are complementary BY CONSTRUCTION — lexical relevants sit
loosely in the embedding cluster, semantic relevants share zero query
vocabulary, and per-topic distractors are dense-only false positives —
so a fusion lift over BOTH single signals is the expected (and
asserted: tests/test_quality.py) outcome, exactly the regime the
reference's hybrid pipeline targets.

MAP is the reference's own AP definition (benchmarks/metrics.py:62-74:
mean precision over relevant docs found in the list, not normalized by
total relevants — a precise-but-shallow ranker can reach 1.0).  NDCG@10
is the headline column.

"""
            + table
            + "\n\nHarness: `bayesian_bm25_spark/operators/quality.py` — the same\n"
            "DataFrame plans run unchanged on a real BEIR dump (pass its\n"
            "directory + an `embeddings.npz` sidecar).\n"
        )
    print(table)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
