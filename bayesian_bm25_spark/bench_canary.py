"""VM-health canary: fixed, engine-independent single-thread microbench.

The bench box is a shared VM whose effective CPU/memory throughput
swings between sessions (BENCH/BASELINE.md §4 documents mornings where
every query row inflates 30-60% uniformly while nothing in the engine
changed).  The headline bench JSON must carry the exculpatory —  or
incriminating — evidence itself, so ``bench.py`` runs this probe before
and after the suite and embeds the result next to the timings:

- ``sha_ms``   — single-thread CPU: sha256 chain over a 1 MiB buffer,
  96 rounds (~100 MB hashed).  Pure stdlib, immune to BLAS/NumPy thread
  pools; min-of-3 so scheduler preemption can't inflate it.
- ``membw_gbps`` — single-thread memory bandwidth: sum+copy passes over
  a 256 MB numpy array (>> LLC), best-of-3.  The documented depressions
  track shared-VM memory-bus contention, which this detects and the CPU
  probe does not.

``HEALTHY_BAND`` is the committed historical band for THIS box
(calibrated 2026-08-17, idle, local[32] container; see
BENCH/BASELINE.md §6).  ``canary_ok`` is False when the CPU probe is
>15% slower than the band ceiling or bandwidth is >15% below the band
floor — the suite rows of such a run are not comparable round-over-round.
"""

from __future__ import annotations

import hashlib
import time

# (metric, healthy_lo, healthy_hi) measured on the idle bench box;
# update alongside any hardware/container change.
HEALTHY_BAND = {
    "sha_ms": (75.0, 95.0),        # lower is faster (measured 79-81)
    "membw_gbps": (8.0, 10.5),     # higher is faster (measured 9.2-9.6)
}
_SHA_TOL = 1.15   # out-of-band when sha_ms > hi * tol
_MEMBW_TOL = 0.85  # out-of-band when gbps < lo * tol


def _sha_ms_once(rounds: int = 96) -> float:
    buf = b"\x5a" * (1 << 20)
    h = b""
    t0 = time.perf_counter()
    for _ in range(rounds):
        h = hashlib.sha256(buf + h).digest()
    return (time.perf_counter() - t0) * 1000.0


def _membw_gbps_once(mb: int = 256, passes: int = 3) -> float:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.random.default_rng(0).random(n)
    b = np.empty_like(a)
    a.sum()  # fault pages in
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(passes):
        s += a.sum()      # 1 read pass
        np.copyto(b, a)   # 1 read + 1 write pass
    dt = time.perf_counter() - t0
    assert s == s  # keep the sum live
    return passes * 3 * a.nbytes / dt / 1e9


def run_canary(repeats: int = 3) -> dict:
    """Best-of-N probe pair + in-band verdict against HEALTHY_BAND."""
    sha = min(_sha_ms_once() for _ in range(repeats))
    bw = max(_membw_gbps_once() for _ in range(repeats))
    sha_lo, sha_hi = HEALTHY_BAND["sha_ms"]
    bw_lo, bw_hi = HEALTHY_BAND["membw_gbps"]
    return {
        "sha_ms": round(sha, 1),
        "membw_gbps": round(bw, 2),
        "sha_band": [sha_lo, sha_hi],
        "membw_band": [bw_lo, bw_hi],
        "ok": bool(sha <= sha_hi * _SHA_TOL and bw >= bw_lo * _MEMBW_TOL),
    }
