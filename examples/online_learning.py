"""Online parameter learning from a feedback stream
(Spark analog of reference examples/online_learning.py):
Structured Streaming foreachBatch updating driver-held (α, β)."""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import SparkSession

from bayesian_bm25_spark.kernel.transform import TransformParams
from bayesian_bm25_spark.streaming import online as OL


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="bb25_stream_")
    in_dir = os.path.join(workdir, "in")
    os.makedirs(in_dir)
    rng = np.random.default_rng(42)
    for batch in range(5):
        with open(os.path.join(in_dir, f"b{batch}.json"), "w") as f:
            for _ in range(32):
                score = float(rng.uniform(0, 8))
                f.write(json.dumps({
                    "score": score,
                    "label": float(score > 4),
                    "tf": 1.0,
                    "doc_len_ratio": 1.0,
                    "ts": "2024-01-01T00:00:00",
                }) + "\n")

    stream = (
        spark.readStream.schema(OL.FEEDBACK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    params = TransformParams(alpha=1.0, beta=0.0)

    def report(batch_id, n, p):
        print(f"batch {batch_id}: {n} rows  α={p.alpha:.4f} β={p.beta:.4f} "
              f"(Polyak ᾱ={p.alpha_avg:.4f})")

    q = OL.start_online_learning(stream, params, os.path.join(workdir, "ckpt"),
                                 on_batch=report)
    q.processAllAvailable()
    q.stop()
    print(f"final: α={params.alpha:.4f} β={params.beta:.4f} after {params.n_updates} updates")
    spark.stop()


if __name__ == "__main__":
    main()
