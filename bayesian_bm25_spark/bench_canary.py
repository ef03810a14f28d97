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


def _wide_probe(n_threads: int = 16) -> dict:
    """N-thread aggregate probe: the 2026-08-17 afternoon proved the
    single-thread canary BLIND to wide contention — a codec-era replay
    ran the 16-wide gate build at ~2x its own committed triple while
    ``sha_ms``/``membw_gbps`` sat mid-band all day.  hashlib and large
    numpy ops release the GIL, so plain threads exercise real cores.

    Report-only for now (no ok-gate): the bands must be calibrated in a
    KNOWN-healthy window (one where the 4-exec gate build lands in its
    6.1-10.6k docs/s historical pool), and 2026-08-17 is not one."""
    import threading

    import numpy as np

    done = threading.Barrier(n_threads + 1)

    def hash_worker() -> None:
        # hasher.update releases the GIL for large buffers and
        # allocates nothing per round (a `buf + h` chain would memcpy
        # 1 MiB UNDER the GIL each round — a 16-thread convoy)
        buf = b"\x5a" * (1 << 20)
        h = hashlib.sha256()
        done.wait()
        for _ in range(24):
            h.update(buf)
        done.wait()

    def bw_worker() -> None:
        # allocate + fault pages BEFORE the start gate (plain fill, no
        # RNG) so the timed window contains only the read/copy passes,
        # which all release the GIL
        n = 64 * 1024 * 1024 // 8
        a = np.empty(n)
        a.fill(1.0 / 3)
        b = np.empty_like(a)
        np.copyto(b, a)
        done.wait()
        s = 0.0
        for _ in range(3):
            s += a.sum()
            np.copyto(b, a)
        assert s == s
        done.wait()

    out = {}
    for name, worker, work in (
        # aggregate MB hashed / wall  and  aggregate bytes moved / wall
        ("sha16_mbps", hash_worker, n_threads * 24 * 1.0),
        ("membw16_gbps", bw_worker, n_threads * 3 * 3 * 64 / 1024.0),
    ):
        threads = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in threads:
            t.start()
        done.wait()
        t0 = time.perf_counter()
        done.wait()
        dt = time.perf_counter() - t0
        for t in threads:
            t.join()
        out[name] = round(work / dt, 1 if name.endswith("mbps") else 2)
    return out


def run_canary(repeats: int = 3, wide: bool = True) -> dict:
    """Best-of-N probe pair + in-band verdict against HEALTHY_BAND."""
    sha = min(_sha_ms_once() for _ in range(repeats))
    bw = max(_membw_gbps_once() for _ in range(repeats))
    sha_lo, sha_hi = HEALTHY_BAND["sha_ms"]
    bw_lo, bw_hi = HEALTHY_BAND["membw_gbps"]
    out = {
        "sha_ms": round(sha, 1),
        "membw_gbps": round(bw, 2),
        "sha_band": [sha_lo, sha_hi],
        "membw_band": [bw_lo, bw_hi],
        "ok": bool(sha <= sha_hi * _SHA_TOL and bw >= bw_lo * _MEMBW_TOL),
    }
    if wide:
        out.update(_wide_probe())
    return out
