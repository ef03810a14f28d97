"""Warm-scoring-layout partition sweep on the 4-executor topology —
VERDICT r4 #3's lever: at 16-wide, fewer/larger scoring partitions cut
per-task fixed-cost exposure; does partition count move the (median)
query throughput?

Builds the 1M-doc index ONCE on `local-cluster[4,4,24576]` (pinned to
18 CPUs), then times the SAME 1000-query batch: cold (per-batch
co-partition, the official protocol) ×3, and warm
(`prepartition_for_scoring(p)`, `src_partitioned=True`) ×3 for each
p ∈ {8, 16, 32, 64}.  Prints one JSON line; markdown summary to stdout.

Usage: python tools/warm_sweep.py [N_DOCS] [N_QUERIES]
(re-execs itself under spark-submit --py-files; WARM_SWEEP_CHILD guards)
"""

from __future__ import annotations

import json
import os
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, TOOLS)


def child() -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    n_docs = int(os.environ.get("WS_N_DOCS", "1000000"))
    n_queries = int(os.environ.get("WS_N_QUERIES", "1000"))
    spark = (
        SparkSession.builder.appName("warm-sweep")
        # local-cluster workers launch executors with the APP's requested
        # memory from the spark conf — the spark-submit --executor-memory
        # flag does NOT reach them (measured: 434 MiB block managers);
        # set it on the session builder like bench.py does
        .config("spark.executor.memory", os.environ.get("WS_EXEC_MEM", "20g"))
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bayesian_bm25_spark.operators import query as Q
    from bayesian_bm25_spark.operators.index_build import IndexConfig, build_index
    from bayesian_bm25_spark.sources.webcorpus import (
        generate_pages,
        generate_queries,
        queries_to_df,
    )

    idx_dir = tempfile.mkdtemp(prefix="ws_idx_")
    pages_dir = tempfile.mkdtemp(prefix="ws_pages_")
    try:
        generate_pages(spark, n_docs, seed=42, num_partitions=32).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        t0 = time.time()
        idx = build_index(
            spark, pages, idx_dir,
            IndexConfig(base_rate="auto", build_compressed=True), force=True,
        )
        build_sec = time.time() - t0
        qdf = queries_to_df(
            spark, generate_queries(n_docs, seed=42, n_queries=n_queries)
        )

        def batch(src, partitioned: bool) -> float:
            t = time.time()
            Q.retrieve_auto(
                src, qdf, idx.term_stats, idx.params, idx.avgdl,
                n_docs=idx.n_docs, k=10, n_buckets=idx.config.n_buckets,
                impacts_nonnegative=True, src_partitioned=partitioned,
            ).count()
            return time.time() - t

        out: dict = {"build_sec": round(build_sec, 1), "n_docs": n_docs,
                     "n_queries": n_queries, "cold": [], "warm": {}}
        # WS_PARTS: comma list of partition counts; WS_COLD_REPEATS /
        # WS_WARM_REPEATS tune the repeat budget (the 1-exec leg runs a
        # single winning p to bound wall time)
        parts = [int(x) for x in os.environ.get("WS_PARTS", "8,16,32,64").split(",")]
        for _ in range(int(os.environ.get("WS_COLD_REPEATS", "3"))):
            out["cold"].append(round(batch(idx.postings, False), 2))
        for p in parts:
            src = Q.prepartition_for_scoring(idx.postings, p)
            walls = [round(batch(src, True), 2)
                     for _ in range(int(os.environ.get("WS_WARM_REPEATS", "3")))]
            src.unpersist()
            out["warm"][str(p)] = walls
        print("WSJSON " + json.dumps(out))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(pages_dir, ignore_errors=True)
    spark.stop()


def _submit(env: dict, master: str, cpus: str, zip_path: str) -> dict:
    import subprocess

    out = subprocess.run(
        [
            "taskset", "-c", cpus,
            "spark-submit",
            "--master", master,
            "--executor-memory", "20g",
            "--py-files", zip_path,
            "--driver-memory", "16g",
            os.path.abspath(__file__),
        ],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("WSJSON "):
            return json.loads(line[len("WSJSON "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no WSJSON line from {master}")


def main() -> None:
    if os.environ.get("WARM_SWEEP_CHILD"):
        child()
        return
    from scaling_bench import REPO, make_pyfiles_zip

    zip_path = os.path.join(REPO, "BENCH", "bb25spark.zip")
    make_pyfiles_zip(zip_path)
    env = dict(os.environ)
    env["WARM_SWEEP_CHILD"] = "1"
    if len(sys.argv) > 1:
        env["WS_N_DOCS"] = sys.argv[1]
    if len(sys.argv) > 2:
        env["WS_N_QUERIES"] = sys.argv[2]

    nq = int(env.get("WS_N_QUERIES", "1000"))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731

    print("== 4-exec leg: full sweep ==", file=sys.stderr)
    d4 = _submit(env, "local-cluster[4,4,24576]", "0-17", zip_path)

    # 1-exec leg runs only the WINNING p (wall-time bound: each 1000-
    # query batch costs ~6 min at 1-exec) — enough for the warm-protocol
    # efficiency number
    best_p = min(d4["warm"], key=lambda p: med(d4["warm"][p]))
    env1 = dict(env)
    env1.update({"WS_PARTS": best_p, "WS_COLD_REPEATS": "1",
                 "WS_WARM_REPEATS": "3"})
    print(f"== 1-exec leg: warm p={best_p} ==", file=sys.stderr)
    d1 = _submit(env1, "local-cluster[1,4,24576]", "0-5", zip_path)

    rows = ["| leg / layout | walls (s) | median QPS | best QPS |", "|---|---|---|---|"]
    rows.append(
        f"| 4-exec cold (official protocol) | {'/'.join(map(str, d4['cold']))} "
        f"| {nq / med(d4['cold']):.2f} | {nq / min(d4['cold']):.2f} |"
    )
    for p, walls in d4["warm"].items():
        rows.append(
            f"| 4-exec warm p={p} | {'/'.join(map(str, walls))} "
            f"| {nq / med(walls):.2f} | {nq / min(walls):.2f} |"
        )
    rows.append(
        f"| 1-exec cold | {'/'.join(map(str, d1['cold']))} "
        f"| {nq / med(d1['cold']):.2f} | {nq / min(d1['cold']):.2f} |"
    )
    for p, walls in d1["warm"].items():
        rows.append(
            f"| 1-exec warm p={p} | {'/'.join(map(str, walls))} "
            f"| {nq / med(walls):.2f} | {nq / min(walls):.2f} |"
        )
    q1 = nq / med(d1["warm"][best_p])
    q4 = nq / med(d4["warm"][best_p])
    print("\n".join(rows))
    print(f"warm-protocol MEDIAN efficiency at p={best_p}: "
          f"{q4 / (4 * q1):.3f}  (4-exec {q4:.2f} / 4×1-exec {q1:.2f})")
    print(f"(4-exec build {d4['build_sec']}s; 1-exec build {d1['build_sec']}s)")
    with open(os.path.join(REPO, "BENCH", "warm_sweep.json"), "w") as f:
        json.dump({"exec4": d4, "exec1": d1, "best_p": best_p}, f, indent=1)


if __name__ == "__main__":
    main()
