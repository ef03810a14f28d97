"""Append one VM-health sample (single-thread + 16-wide canary) to
BENCH/vm_window_log.jsonl.

The 2026-08-17 afternoon showed the box can run the 16-wide gate build
at ~2x its own committed walls while the single-thread canary sits
mid-band; the wide probe (bench_canary._wide_probe) is the detector.
Sampling this log across a session tells you when a KNOWN-healthy
window opens (for band calibration and for scheduling same-session
scaling pairs) without paying a full bench run.

Usage: python tools/vm_window_log.py [note]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bayesian_bm25_spark.bench_canary import run_canary  # noqa: E402


def main() -> None:
    sample = {"t": round(time.time(), 1),
              "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    sample.update(run_canary())
    if len(sys.argv) > 1:
        sample["note"] = " ".join(sys.argv[1:])
    path = os.path.join(REPO, "BENCH", "vm_window_log.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(sample) + "\n")
    print(json.dumps(sample))


if __name__ == "__main__":
    main()
