"""Map-side varbyte partials A/B on the 4-executor multi-JVM gate
topology (VERDICT r5 #3).

Hypothesis: the residual build-scaling gap is memory-bus pressure from
shuffle VOLUME (codec CPU was eliminated by the codec A/B).  The
map-side partial encode replaces the salted row shuffle of
(term, doc_id, tf, impact) structs (~35-40 B/posting) with one
compressed-bytes exchange (~10.5 B/posting).  This A/B measures, per
config: build wall, per-phase walls, and the ACTUAL shuffle read/write
MB inside the build window (tools/joblog.task_stats on the event log).

  mapside   BB25_MAPSIDE_PARTIALS=1 (new default)
  salted    BB25_MAPSIDE_PARTIALS=0 (round-5 path)

Usage: python tools/mapside_ab.py [N_DOCS] [repeats]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import joblog as JL
from scaling_bench import REPO, make_pyfiles_zip, run_bench

CONFIGS = {"mapside": "1", "salted": "0"}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    zip_path = os.path.join(REPO, "BENCH", "bb25spark.zip")
    make_pyfiles_zip(zip_path)
    ev_dir = os.path.join(REPO, "BENCH", "eventlogs")
    os.makedirs(ev_dir, exist_ok=True)

    results: dict[str, list[dict]] = {}
    for name, flag in CONFIGS.items():
        os.environ["BB25_MAPSIDE_PARTIALS"] = flag
        runs = []
        for i in range(repeats):
            print(f"== {name} run {i} ==", file=sys.stderr)
            r = run_bench(
                16, zip_path, n_docs, 200,
                master="local-cluster[4,4,24576]", pin_cores=18,
                executor_mem="20g", skip_headline=True,
                event_log_dir=ev_dir,
            )
            # shuffle bytes inside the BEST build window
            try:
                log = JL.find_log(ev_dir, r.get("app_id"))
                t0, t1 = r["windows"]["build"]
                r["build_task_stats"] = JL.task_stats(log, t0, t1, n_cores=16)
            except Exception as e:
                r["build_task_stats"] = {"error": str(e)}
            runs.append(r)
            ts = r["build_task_stats"]
            print(
                f"   build {r['queries']['index_build']}s "
                f"({r['build_docs_per_sec']} docs/s) "
                f"shuffle_write={ts.get('shuffle_write_mb', '?')}MB "
                f"shuffle_read={ts.get('shuffle_read_mb', '?')}MB",
                file=sys.stderr,
            )
        results[name] = runs

    rows = [
        "| config | build wall (s) | docs/s | shuffle W/R (MB) | "
        "phase:postings | phase:compressed_lists | phase:term_stats |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, runs in results.items():
        best = min(runs, key=lambda r: r["queries"]["index_build"])
        st = best.get("build_stages", {})
        ts = best.get("build_task_stats", {})
        walls = "/".join(f"{r['queries']['index_build']:.1f}" for r in runs)
        rows.append(
            f"| {name} | {walls} | {best['build_docs_per_sec']} "
            f"| {ts.get('shuffle_write_mb', '?')}/{ts.get('shuffle_read_mb', '?')} "
            f"| {st.get('phase:postings', '')} "
            f"| {st.get('phase:compressed_lists', '')} "
            f"| {st.get('phase:term_stats', '')} |"
        )
    print("\n".join(rows))
    with open(os.path.join(REPO, "BENCH", "mapside_ab.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
