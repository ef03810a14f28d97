"""Per-operator strong-scaling microbenchmark (evidence for
BENCH/BASELINE.md): times the engine's core primitives at two
parallelism levels with a warm-up pass, isolating operator scaling from
whole-pipeline Amdahl/contention effects.

CAVEAT (round 2): run this under ``taskset -c 0-{N-1}`` per level, and
discard the first measurement at each level — this VM's first-touch
page backing is ~5× slow, which deflated round 1's "operator ceiling"
numbers (0.58-0.77).  With pinning and warm pages, pure CPU work scales
at ~0.91 on this box (see BENCH/BASELINE.md "Where the remaining gap
comes from").

Usage: taskset -c 0-{N-1} python tools/op_scaling.py <pages_parquet_dir> [N] [4N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(cores: int, sp: int, pages_dir: str) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bayesian_bm25_spark.functions import columns as C

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_dir)
    docs = pages.select(
        "doc_id", C.tokenize(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))

    def timed(fn, warmup=True):
        if warmup:
            fn()
        t0 = time.time()
        fn()
        return time.time() - t0

    out = {}
    out["tokenize_agg"] = timed(lambda: docs.agg(F.sum("doc_len")).collect())
    tf = (
        docs.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    out["explode_groupby"] = timed(lambda: tf.agg(F.count(F.lit(1))).collect())
    out["parquet_write"] = timed(
        lambda: docs.write.mode("overwrite").parquet(f"/tmp/op_scale_w_{cores}"),
        warmup=False,
    )
    spark.stop()
    return out


def main() -> None:
    pages_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n
    lo = run_level(n, 2 * n, pages_dir)
    hi = run_level(n4, 2 * n4, pages_dir)
    print(f"| operator | local[{n}] s | local[{n4}] s | speedup | efficiency |")
    print("|---|---|---|---|---|")
    for k in lo:
        sp = lo[k] / hi[k]
        print(f"| {k} | {lo[k]:.2f} | {hi[k]:.2f} | {sp:.2f}x | {sp / (n4 / n):.2f} |")


if __name__ == "__main__":
    main()
