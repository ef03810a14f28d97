"""Per-JOB timeline attribution from a Spark event log.

Phase walls overlap and hide scheduling gaps; this tool answers "where
do the non-scaling seconds actually go" at job granularity: within a
bench window (build / query, epoch seconds from bench.py's ``windows``
output) it computes

  - busy_sec:   union of [submission, completion] of all jobs
  - gap_sec:    window wall − busy  (NO job running: driver planning,
                collect processing, parquet commits, python time)
  - n_jobs, top jobs by duration, top gaps with surrounding jobs

Usage:
  python tools/joblog.py <event_log_file_or_dir> <bench_json_file>
  (bench_json: the one-line JSON bench.py printed, containing
   "app_id" and "windows"; or pass '-' and provide --window t0 t1)

The analysis is also importable: ``analyze(log_path, windows)``.
"""

from __future__ import annotations

import json
import os
import sys


def _open(path: str):
    """Open an event-log part, transparently decompressing ``.zstd``
    (Spark's default eventLog.compress codec) via the zstd binary."""
    if path.endswith(".zstd"):
        import io
        import subprocess

        try:
            proc = subprocess.Popen(
                ["zstd", "-d", "-c", path], stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
            )
        except FileNotFoundError:
            raise RuntimeError(
                "zstd binary not found — install zstd, or re-run the "
                "bench with spark.eventLog.compress=false "
                "(BENCH_EVENT_LOG_DIR path does that already)"
            ) from None

        class _ZstdStream(io.TextIOWrapper):
            # reap the decompressor on close: a bare TextIOWrapper
            # close only closes the pipe, leaving a zombie per rolled
            # part when task_stats walks many logs (ADVICE r6)
            def close(self):  # noqa: D102
                try:
                    super().close()
                finally:
                    proc.wait()

        return _ZstdStream(proc.stdout, encoding="utf-8", errors="replace")
    return open(path, encoding="utf-8", errors="replace")


def _iter_job_events(path: str):
    with _open(path) as f:
        for line in f:
            # cheap prefilter: task events dominate the log; only job
            # boundaries matter here
            if '"SparkListenerJobStart"' not in line and '"SparkListenerJobEnd"' not in line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def load_jobs(path: str | list[str]) -> list[dict]:
    """[{job_id, t0, t1, name}] (epoch seconds), sorted by t0."""
    paths = [path] if isinstance(path, str) else list(path)
    starts: dict[int, dict] = {}
    jobs: list[dict] = []
    for ev in (e for p in paths for e in _iter_job_events(p)):
        if ev["Event"] == "SparkListenerJobStart":
            jid = ev["Job ID"]
            name = ""
            props = ev.get("Properties") or {}
            name = props.get("spark.job.description") or props.get(
                "callSite.short", ""
            )
            if not name and ev.get("Stage Infos"):
                name = ev["Stage Infos"][0].get("Stage Name", "")
            starts[jid] = {
                "job_id": jid,
                "t0": ev["Submission Time"] / 1000.0,
                "name": name[:120],
            }
        elif ev["Event"] == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in starts:
                j = starts.pop(jid)
                j["t1"] = ev["Completion Time"] / 1000.0
                jobs.append(j)
    jobs.sort(key=lambda j: j["t0"])
    return jobs


def _union_busy(intervals: list[tuple[float, float]]) -> float:
    if not intervals:
        return 0.0
    intervals = sorted(intervals)
    busy = 0.0
    cur0, cur1 = intervals[0]
    for a, b in intervals[1:]:
        if a > cur1:
            busy += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    return busy + (cur1 - cur0)


def analyze_window(jobs: list[dict], t0: float, t1: float, top: int = 8) -> dict:
    win = [j for j in jobs if j["t1"] > t0 and j["t0"] < t1]
    iv = [(max(j["t0"], t0), min(j["t1"], t1)) for j in win]
    busy = _union_busy(iv)
    wall = t1 - t0
    # gaps: periods inside the window with no job running
    gaps = []
    cursor = t0
    for j in sorted(win, key=lambda j: j["t0"]):
        a = max(j["t0"], t0)
        if a > cursor:
            gaps.append({"sec": round(a - cursor, 2), "before_job": j["name"]})
        cursor = max(cursor, min(j["t1"], t1))
    if cursor < t1:
        gaps.append({"sec": round(t1 - cursor, 2), "before_job": "(window end)"})
    gaps.sort(key=lambda g: -g["sec"])
    longest = sorted(win, key=lambda j: -(j["t1"] - j["t0"]))[:top]
    return {
        "wall_sec": round(wall, 2),
        "busy_sec": round(busy, 2),
        "gap_sec": round(wall - busy, 2),
        "gap_pct": round(100.0 * (wall - busy) / wall, 1) if wall > 0 else 0.0,
        "n_jobs": len(win),
        "top_gaps": gaps[:top],
        "top_jobs": [
            {"sec": round(j["t1"] - j["t0"], 2), "name": j["name"]}
            for j in longest
        ],
    }


def task_stats(path: str | list[str], t0: float, t1: float, n_cores: int | None = None) -> dict:
    """Aggregate TASK-level seconds inside a window — the inside-job
    attribution the job timeline can't see.  task_sec is the sum of
    task wall durations; util = task_sec / (window · cores) says whether
    executors idled; cpu/gc/deser/shuffle-write decompose where the
    task seconds went.  Comparing legs answers the key scaling question:
    did per-task WORK inflate (contention), or did slots idle?"""
    paths = [path] if isinstance(path, str) else list(path)
    out = dict(n_tasks=0, task_sec=0.0, cpu_sec=0.0, gc_sec=0.0,
               deser_sec=0.0, shuffle_write_sec=0.0, fetch_wait_sec=0.0,
               shuffle_write_mb=0.0, shuffle_read_mb=0.0)
    for p in paths:
        with _open(p) as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ti = ev.get("Task Info") or {}
                lt, ft = ti.get("Launch Time"), ti.get("Finish Time")
                if not lt or not ft or ft / 1000.0 < t0 or lt / 1000.0 > t1:
                    continue
                tm = ev.get("Task Metrics") or {}
                out["n_tasks"] += 1
                out["task_sec"] += (ft - lt) / 1000.0
                out["cpu_sec"] += tm.get("Executor CPU Time", 0) / 1e9
                out["gc_sec"] += tm.get("JVM GC Time", 0) / 1000.0
                out["deser_sec"] += tm.get("Executor Deserialize Time", 0) / 1000.0
                out["shuffle_write_sec"] += (
                    (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Write Time", 0) / 1e9
                )
                out["fetch_wait_sec"] += (
                    (tm.get("Shuffle Read Metrics") or {}).get("Fetch Wait Time", 0) / 1000.0
                )
                sw = tm.get("Shuffle Write Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                out["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                out["shuffle_read_mb"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                ) / 1e6
    out = {k: (round(v, 1) if isinstance(v, float) else v) for k, v in out.items()}
    if n_cores:
        out["util_pct"] = round(100.0 * out["task_sec"] / ((t1 - t0) * n_cores), 1)
    return out


def analyze(log_path: str, windows: dict[str, list[float]], n_cores: int | None = None) -> dict[str, dict]:
    jobs = load_jobs(log_path)
    out = {k: analyze_window(jobs, v[0], v[1]) for k, v in windows.items()}
    for k, v in windows.items():
        out[k]["tasks"] = task_stats(log_path, v[0], v[1], n_cores)
    return out


def find_log(dir_or_file: str, app_id: str | None = None) -> str:
    """Resolve an event-log FILE: accepts a file, an eventLog.dir, or a
    Spark-4 ``eventlog_v2_<appId>/`` rolling directory (events_N_…)."""
    if os.path.isfile(dir_or_file):
        return dir_or_file
    cands = [
        os.path.join(dir_or_file, f)
        for f in os.listdir(dir_or_file)
        if not f.startswith(".") and (app_id is None or app_id in f)
    ]
    if not cands:
        raise FileNotFoundError(f"no event log in {dir_or_file} for {app_id}")
    best = max(cands, key=os.path.getmtime)
    if os.path.isdir(best):  # eventlog_v2 layout
        parts = sorted(
            os.path.join(best, f)
            for f in os.listdir(best)
            if f.startswith("events_")
        )
        if not parts:
            raise FileNotFoundError(f"no events_ file in {best}")
        # .zstd parts are handled transparently by _open(); rolling can
        # split into events_1..N parts; load_jobs accepts the list and
        # reads them in order
        return parts if len(parts) > 1 else parts[0]
    return best


def main() -> None:
    log_arg, bench_json = sys.argv[1], sys.argv[2]
    with open(bench_json) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"windows"' in line:
                bench = json.loads(line)
                break
        else:
            raise SystemExit("bench json has no 'windows' field")
    log = find_log(log_arg, bench.get("app_id"))
    out = analyze(log, bench["windows"])
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
