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

    from bayesian_bm25_spark.operators.quality import (
        evaluate_calibration_by_base_rate,
        format_calibration_table,
    )

    work = tempfile.mkdtemp(prefix="quality_beir_")
    fixture = write_fixture(work)
    results = evaluate_fusion_matrix(spark, fixture, work, k=10)
    table = format_quality_table(results, k=10)

    # calibration story runs on its own fixture instance: lexical-noise
    # docs give BM25 non-relevant matches at ~0.002 prevalence — the
    # BEIR-like regime the reference's ECE table describes
    calib_work = tempfile.mkdtemp(prefix="quality_calib_")
    calib_fixture = write_fixture(
        calib_work, n_topics=4, lexical_per_topic=2, semantic_per_topic=2,
        noise_docs=20, distractors_per_topic=2, lexical_noise_per_topic=2000,
    )
    calib = evaluate_calibration_by_base_rate(spark, calib_fixture, calib_work)
    calib_table = format_calibration_table(calib)

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

**Caveat — learned rows are train-on-test:** the `learnable`,
`attention`, `multihead`, `attn_norm`, `multihead_norm`, and
`vector_attn` rows fit their fusion weights on the SAME fixture qrels
they are then scored against (the reference's own BEIR protocol also
trains attention on the dataset it evaluates, hybrid_beir.py:1300-1356).
Each has a held-out twin: `attn_norm_cv`, `learnable_cv`, and
`multihead_cv` run 5-fold cross-validation — every query is scored by
a model fit AND rank-selected on the other folds only, so no query's
qrels ever touch its own fused scores.  `dense_platt` likewise fits on in-dataset labels (the
reference's own protocol).  The `tuned`/`balanced_tuned`/
`hybrid_and_tuned` grids select on a seeded HALF of the queries (the
reference's tune=True 50/50 split), so their other half is held out.
None of these reproduce the reference's published BEIR numbers —
different corpus, same machinery.  MultiField rows are skipped exactly
as the reference skips them on title-less datasets (hybrid_beir.py:1641).

MAP is the reference's own AP definition (benchmarks/metrics.py:62-74:
mean precision over relevant docs found in the list, not normalized by
total relevants — a precise-but-shallow ranker can reach 1.0).  NDCG@10
is the headline column.

"""
            + table
            + """

## Calibration by base-rate strategy

The reference's second headline table (README.md:659-663: ECE
0.65 → 0.15 (−78%) → 0.008 (−99%) on BEIR as base-rate handling
improves).  Same scored candidates, three posterior variants, labels
from qrels (unjudged = 0); fixture prevalence ≈ 0.002, so the explicit
0.001 rate is near-true — the regime the published table describes.
Asserted monotone in tests/test_quality.py::TestCalibrationByBaseRate.

"""
            + calib_table
            + "\n\nHarness: `bayesian_bm25_spark/operators/quality.py` — the same\n"
            "DataFrame plans run unchanged on a real BEIR dump (pass its\n"
            "directory + an `embeddings.npz` sidecar).\n"
        )
    print(table)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
