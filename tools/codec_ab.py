"""Shuffle-codec / spill-compression A/B on the 4-executor multi-JVM
build leg — the engine-side lever VERDICT r4 #1 names: at 4-exec the
build's aggregate shuffle-write time inflates 12→145 s (serialization/
compression CPU, not disk — tmpfs A/B'd in round 3).

Runs the SAME `spark-submit --py-files` build bench (skip-headline) on
`local-cluster[4,4,24576]` pinned to 18 CPUs, once per config, and
prints a markdown table.  Configs touch ONLY shuffle-path compression:

  lz4        spark.io.compression.codec=lz4 (Spark default — baseline)
  snappy     ...=snappy
  zstd1      ...=zstd + spark.io.compression.zstd.level=1
  lz4-nospill  lz4 + spark.shuffle.spill.compress=false
  nocompress spark.shuffle.compress=false (+spill false) — loopback
             shuffle pays bytes, saves CPU; honest candidate for this
             single-host multi-JVM topology, NOT a general cluster pick

Usage: python tools/codec_ab.py [N_DOCS] [repeats]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import REPO, make_pyfiles_zip, run_bench

CONFIGS = {
    "lz4": "",
    "snappy": "spark.io.compression.codec=snappy",
    "zstd1": "spark.io.compression.codec=zstd;spark.io.compression.zstd.level=1",
    "lz4-nospill": "spark.shuffle.spill.compress=false",
    "nocompress": "spark.shuffle.compress=false;spark.shuffle.spill.compress=false",
}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    zip_path = os.path.join(REPO, "BENCH", "bb25spark.zip")
    make_pyfiles_zip(zip_path)

    results: dict[str, list[dict]] = {}
    for name, conf in CONFIGS.items():
        if conf:
            os.environ["BENCH_EXTRA_CONF"] = conf
        else:
            os.environ.pop("BENCH_EXTRA_CONF", None)
        runs = []
        for i in range(repeats):
            print(f"== {name} run {i} ==", file=sys.stderr)
            r = run_bench(
                16, zip_path, n_docs, 200,
                master="local-cluster[4,4,24576]", pin_cores=18,
                executor_mem="20g", skip_headline=True,
            )
            runs.append(r)
            print(f"   build {r['queries']['index_build']}s "
                  f"({r['build_docs_per_sec']} docs/s)", file=sys.stderr)
        results[name] = runs

    rows = ["| config | build wall (s) | docs/s | phase:postings | "
            "phase:compressed_lists | phase:term_stats |", "|---|---|---|---|---|---|"]
    for name, runs in results.items():
        best = min(runs, key=lambda r: r["queries"]["index_build"])
        st = best.get("build_stages", {})
        walls = "/".join(f"{r['queries']['index_build']:.1f}" for r in runs)
        rows.append(
            f"| {name} | {walls} | {best['build_docs_per_sec']} "
            f"| {st.get('phase:postings', '')} "
            f"| {st.get('phase:compressed_lists', '')} "
            f"| {st.get('phase:term_stats', '')} |"
        )
    table = "\n".join(rows)
    print(table)
    with open(os.path.join(REPO, "BENCH", "codec_ab.json"), "w") as f:
        json.dump({n: r for n, r in results.items()}, f, indent=1)


if __name__ == "__main__":
    main()
