"""Aggregate memory-bandwidth probe at two worker counts.

The single-box N→4N thread proxy shares one memory subsystem, so the
achievable scaling of ANY bandwidth-bound operator is capped below 4×.
This probe measures that hardware ceiling directly: K independent
processes each stream a >>LLC numpy array (sum + copy per pass), and we
report aggregate GB/s at K=N and K=4N plus the bandwidth scaling
efficiency.  BENCH/BASELINE.md uses it to normalize the pipeline's
measured efficiency (pipeline_eff / membw_eff = efficiency net of the
shared-memory ceiling a real multi-executor cluster does not have).

Usage: python tools/membw_probe.py [N] [MB_PER_WORKER] [PASSES]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(mb: int, passes: int, out):
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.random.default_rng(0).random(n)  # ~mb MB, far beyond LLC
    b = np.empty_like(a)
    # warm
    a.sum()
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(passes):
        s += a.sum()          # 1 read pass
        np.copyto(b, a)       # 1 read + 1 write pass
    dt = time.perf_counter() - t0
    bytes_moved = passes * (3 * a.nbytes)
    out.put((bytes_moved / dt / 1e9, s))


def run(workers: int, mb: int, passes: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(mb, passes, q)) for _ in range(workers)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    per = [q.get()[0] for p in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    total_bytes = workers * passes * 3 * mb * 1024 * 1024
    return total_bytes / wall / 1e9


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    lo = run(n, mb, passes)
    hi = run(4 * n, mb, passes)
    eff = hi / (4 * lo)
    print(
        json.dumps(
            {
                "workers_lo": n,
                "workers_hi": 4 * n,
                "gbps_lo": round(lo, 2),
                "gbps_hi": round(hi, 2),
                "membw_scaling_efficiency": round(eff, 4),
                "mb_per_worker": mb,
                "passes": passes,
            }
        )
    )


if __name__ == "__main__":
    main()
