"""Calibrating neural reranker scores for probabilistic fusion
(Spark analog of reference examples/neural_calibration.py):
Platt / isotonic calibrators fit on the driver from labeled data;
Platt applies as a closed-form Column (``C.platt``), isotonic inlines
its fitted breakpoints into a vectorized interpolation, and the
calibrated probabilities fuse with BM25 via ``log_odds_conjunction``
— all Spark-side, no per-row Python.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.kernel.calibrate import IsotonicCalibrator, PlattCalibrator
from bayesian_bm25_spark.kernel.score_metrics import expected_calibration_error


def true_relevance_prob(scores):
    logits = 1.5 * (scores**2) / 3.0 + 0.5 * scores - 1.0
    return 1.0 / (1.0 + np.exp(-logits))


def main() -> None:
    rng = np.random.default_rng(42)
    train_scores = rng.uniform(-3.0, 3.0, size=500)
    train_labels = (rng.random(500) < true_relevance_prob(train_scores)).astype(float)
    test_scores = rng.uniform(-3.0, 3.0, size=100)
    test_labels = (rng.random(100) < true_relevance_prob(test_scores)).astype(float)

    # --- 1+2. Fit both calibrators on the driver ----------------------
    platt = PlattCalibrator()
    platt.fit(train_scores, train_labels, learning_rate=0.1, max_iterations=2000)
    iso = IsotonicCalibrator()
    iso.fit(train_scores, train_labels)
    raw = 1.0 / (1.0 + np.exp(-test_scores))  # uncalibrated sigmoid
    print("Expected calibration error on held-out test scores:")
    print(f"  raw sigmoid: {expected_calibration_error(raw, test_labels):.4f}")
    print(f"  Platt:       {expected_calibration_error(platt.calibrate(test_scores), test_labels):.4f}")
    print(f"  isotonic:    {expected_calibration_error(iso.calibrate(test_scores), test_labels):.4f}")

    # --- 3. Spark-side application + hybrid fusion --------------------
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bm25_probs = np.clip(true_relevance_prob(test_scores) + rng.normal(0, 0.1, 100), 0.01, 0.99)
    df = spark.createDataFrame(
        [(int(i), float(s), float(b)) for i, (s, b) in enumerate(zip(test_scores, bm25_probs))],
        "doc_id int, neural_score double, bm25_prob double",
    )

    # Platt: a closed-form Column literal pair (a, b)
    calibrated = df.withColumn(
        "neural_prob", C.platt(F.col("neural_score"), platt.a, platt.b)
    )

    # Isotonic: inline the fitted (bx, by) breakpoints as array literals
    # and interpolate with zip-free Column math (step + linear segment).
    bx, by = [float(x) for x in iso.bx], [float(y) for y in iso.by]
    sx = F.col("neural_score")
    iso_col = F.lit(by[0])
    for i in range(1, len(bx)):
        x0, x1, y0, y1 = bx[i - 1], bx[i], by[i - 1], by[i]
        seg = F.lit(y0) + (sx - F.lit(x0)) * F.lit((y1 - y0) / (x1 - x0) if x1 > x0 else 0.0)
        iso_col = F.when(sx >= F.lit(x1), F.lit(y1)).otherwise(
            F.when(sx >= F.lit(x0), seg).otherwise(iso_col)
        )
    calibrated = calibrated.withColumn("neural_prob_iso", iso_col)

    fused = calibrated.withColumn(
        "fused",
        C.log_odds_conjunction(F.array(F.col("bm25_prob"), F.col("neural_prob"))),
    ).orderBy(F.desc("fused"))
    print("Hybrid fusion of BM25 probability + Platt-calibrated neural score:")
    fused.select("doc_id", "bm25_prob", "neural_prob", "neural_prob_iso", "fused").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
