"""Learning which retrieval signals to trust
(Spark analog of reference examples/learnable_fusion.py):
``LearnableLogOddsWeights`` fits on the driver (state = n_signals
floats), then the fitted weights are inlined as literals into a
weighted ``log_odds_conjunction`` Column and applied to a DataFrame —
the learning is cheap, the inference is distributed.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.kernel.combine import LearnableLogOddsWeights
from bayesian_bm25_spark.kernel.transform import sigmoid


def main() -> None:
    rng = np.random.default_rng(42)
    n_docs = 200
    labels = rng.integers(0, 2, size=n_docs).astype(np.float64)

    def signal(noise):
        return np.asarray(
            sigmoid(np.where(labels == 1, 1.5, -1.5) + rng.normal(0, noise, n_docs)),
            dtype=np.float64,
        )

    # Signal 0 reliable, 1 moderate, 2 noisy
    all_probs = np.column_stack([signal(0.5), signal(1.0), signal(2.0)])

    # --- 1. Batch fit on the driver -----------------------------------
    fusion = LearnableLogOddsWeights(n_signals=3)
    fusion.fit(all_probs[:150], labels[:150], learning_rate=0.05, max_iterations=500)
    print("Learned weights (reliable signal should dominate):")
    for i, w in enumerate(fusion.weights):
        print(f"  signal {i}: {w:.4f}")

    # --- 2. Online update from streaming feedback ---------------------
    for i in range(150, 200):
        fusion.update(all_probs[i], labels[i])
    print("After 50 online updates:", np.round(fusion.weights, 4))

    # --- 3. Averaged (Polyak) weights for stable inference ------------
    fused_last = fusion(all_probs, use_averaged=False)
    fused_avg = fusion(all_probs, use_averaged=True)
    print(f"Mean |last - averaged| fused prob: {np.abs(fused_last - fused_avg).mean():.5f}")

    # --- 4. Distributed inference: weights become Column literals -----
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    w = np.asarray(fusion.weights, dtype=np.float64)
    w = (w / w.sum()).tolist()
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(all_probs)],
        "doc_id int, probs array<double>",
    )
    scored = df.withColumn(
        "fused", C.log_odds_conjunction(F.col("probs"), weights=w)
    ).orderBy(F.desc("fused"))
    print("Top docs under the learned weighted Log-OP fusion (Spark-side):")
    scored.show(5)
    spark.stop()


if __name__ == "__main__":
    main()
