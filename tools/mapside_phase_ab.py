"""Phase-isolated, same-window A/B of the map-side varbyte partial
encode vs the salted row-shuffle posting-list build.

The whole-build A/B (tools/mapside_ab.py) is confounded by the shared
VM: a codec-era replay on the same afternoon ran 205 s vs its own
114 s triple — window drift is bigger than any plausible variant delta.
This tool removes the confound:

- ONE Spark app on the gate topology (local-cluster[4,4,24576], 18
  pinned CPUs) builds the 1M-doc index once, then alternately
  force-rebuilds ONLY the posting_lists stage with
  ``cfg.mapside_partials`` True/False, back-to-back, order flipped
  every repeat (ABBA) so slow drift cancels pairwise.
- Event logs + per-rebuild windows let the parent attribute task-sec /
  cpu-sec / shuffle MB per variant — cpu_sec and shuffle bytes are the
  window-noise-robust metrics; walls are reported per pair.

Note the isolated phase runs ALONE, not concurrently with
term_stats/block_max/params as in the real build, so absolute walls
undercut in-build phase walls; the comparison is variant-relative.

Usage: python tools/mapside_phase_ab.py [N_DOCS] [PAIRS]
(re-execs under spark-submit --py-files; MAPSIDE_PHASE_CHILD guards)
"""

from __future__ import annotations

import json
import os
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, TOOLS)

EV_DIR = os.path.join(os.path.dirname(TOOLS), "BENCH", "eventlogs")


def child() -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    n_docs = int(os.environ.get("MP_N_DOCS", "1000000"))
    pairs = int(os.environ.get("MP_PAIRS", "4"))
    os.makedirs(EV_DIR, exist_ok=True)
    spark = (
        SparkSession.builder.appName("mapside-phase-ab")
        .config("spark.executor.memory", os.environ.get("MP_EXEC_MEM", "20g"))
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EV_DIR)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bayesian_bm25_spark.bench_canary import run_canary
    from bayesian_bm25_spark.operators import index_build as IB
    from bayesian_bm25_spark.sources.webcorpus import generate_pages

    idx_dir = tempfile.mkdtemp(prefix="mp_idx_")
    pages_dir = tempfile.mkdtemp(prefix="mp_pages_")
    try:
        generate_pages(spark, n_docs, seed=42, num_partitions=32).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        t0 = time.time()
        IB.build_index(
            spark, pages, idx_dir,
            IB.IndexConfig(base_rate="auto", build_compressed=True),
            force=True,
        )
        build_sec = time.time() - t0
        postings = spark.read.parquet(os.path.join(idx_dir, "postings"))

        def rebuild(mapside: bool) -> dict:
            cfg = IB.IndexConfig(
                base_rate="auto", build_compressed=True,
                mapside_partials=mapside,
            )
            t0 = time.time()
            IB._build_compressed_lists(spark, postings, idx_dir, cfg, True)
            t1 = time.time()
            return {
                "variant": "mapside" if mapside else "salted",
                "wall": round(t1 - t0, 2),
                "window": [t0, t1],
            }

        runs = []
        for i in range(pairs):
            order = (True, False) if i % 2 == 0 else (False, True)
            for mapside in order:
                r = rebuild(mapside)
                runs.append(r)
                print(f"# pair {i} {r['variant']}: {r['wall']}s",
                      file=sys.stderr)
        out = {
            "build_sec": round(build_sec, 1),
            "n_docs": n_docs,
            "app_id": spark.sparkContext.applicationId,
            "canary": run_canary(),
            "runs": runs,
        }
        print("MPJSON " + json.dumps(out))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(pages_dir, ignore_errors=True)
    spark.stop()


def main() -> None:
    if os.environ.get("MAPSIDE_PHASE_CHILD"):
        child()
        return
    import subprocess

    import joblog as JL
    from scaling_bench import REPO, make_pyfiles_zip

    zip_path = os.path.join(REPO, "BENCH", "bb25spark.zip")
    make_pyfiles_zip(zip_path)
    env = dict(os.environ)
    env["MAPSIDE_PHASE_CHILD"] = "1"
    if len(sys.argv) > 1:
        env["MP_N_DOCS"] = sys.argv[1]
    if len(sys.argv) > 2:
        env["MP_PAIRS"] = sys.argv[2]

    out = subprocess.run(
        [
            "taskset", "-c", "0-17",
            "spark-submit",
            "--master", "local-cluster[4,4,24576]",
            "--executor-memory", "20g",
            "--py-files", zip_path,
            "--driver-memory", "16g",
            os.path.abspath(__file__),
        ],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    data = None
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("MPJSON "):
            data = json.loads(line[len("MPJSON "):])
            break
    if data is None:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError("no MPJSON line")

    log = JL.find_log(EV_DIR, data["app_id"])
    for r in data["runs"]:
        t0, t1 = r["window"]
        try:
            r["task_stats"] = JL.task_stats(log, t0, t1, n_cores=16)
        except Exception as e:  # pragma: no cover
            r["task_stats"] = {"error": str(e)}

    rows = [
        "| pair | mapside wall (s) | salted wall (s) | Δ | mapside cpu/shW (s/MB) | salted cpu/shW (s/MB) |",
        "|---|---|---|---|---|---|",
    ]
    by_pair: dict[int, dict] = {}
    for i, r in enumerate(data["runs"]):
        by_pair.setdefault(i // 2, {})[r["variant"]] = r
    for i, pr in sorted(by_pair.items()):
        m, s = pr.get("mapside"), pr.get("salted")
        if not (m and s):
            continue
        mt, st = m.get("task_stats", {}), s.get("task_stats", {})
        rows.append(
            f"| {i} | {m['wall']} | {s['wall']} "
            f"| {m['wall'] - s['wall']:+.1f} "
            f"| {mt.get('cpu_sec', '?')}/{mt.get('shuffle_write_mb', '?')} "
            f"| {st.get('cpu_sec', '?')}/{st.get('shuffle_write_mb', '?')} |"
        )
    print("\n".join(rows))
    with open(os.path.join(REPO, "BENCH", "mapside_phase_ab.json"), "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
