"""Numpy kernel: Platt (sigmoid) and isotonic (PAVA) calibration.

Semantics match the reference (bayesian-bm25 calibration.py):

- Platt fit: BCE gradient descent on σ(a·s + b), grads mean(err·s),
  mean(err) ........................ reference calibration.py:41-90
- Isotonic fit: pool-adjacent-violators over labels sorted by score,
  breakpoints = per-block mean (x̄, ȳ) .. reference calibration.py:125-180
- Isotonic calibrate: searchsorted + linear interpolation, edge clamp to
  y[0]/y[-1], midpoint on x-ties ... reference calibration.py:182-227

Fit is driver-side (PAVA is inherently sequential; Platt state is two
floats).  ``calibrate`` is columnar: Platt as a Column expression,
isotonic as a pandas UDF with broadcast breakpoints.  Spark MLlib's
IsotonicRegression interpolates breakpoints differently, so the reference
PAVA is kept for parity.
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_spark.kernel.transform import clamp01, sigmoid


class PlattCalibrator:
    """P = σ(a·score + b), with (a, b) learned by BCE gradient descent."""

    def __init__(self, a: float = 1.0, b: float = 0.0) -> None:
        self.a = a
        self.b = b

    def fit(self, scores, labels, *, learning_rate=0.01, max_iterations=1000, tolerance=1e-6):
        s = np.asarray(scores, dtype=np.float64)
        y = np.asarray(labels, dtype=np.float64)
        a, b = self.a, self.b
        for _ in range(max_iterations):
            err = clamp01(sigmoid(a * s + b)) - y
            na = a - learning_rate * float(np.mean(err * s))
            nb = b - learning_rate * float(np.mean(err))
            done = abs(na - a) < tolerance and abs(nb - b) < tolerance
            a, b = na, nb
            if done:
                break
        self.a, self.b = a, b

    def calibrate(self, scores):
        out = sigmoid(self.a * np.asarray(scores, dtype=np.float64) + self.b)
        return float(out) if np.ndim(out) == 0 else out

    __call__ = calibrate


def pava_fit(scores, labels, weights=None):
    """Pool-adjacent-violators: returns (x, y) breakpoint arrays.

    Sorts by score, then repeatedly merges adjacent blocks whose running
    label means violate monotonicity; each surviving block contributes one
    breakpoint at its (mean score, mean label).

    ``weights`` makes each (score, label) stand for ``w`` identical
    observations — PAVA on pre-aggregated (distinct score, mean label,
    count) data matches PAVA on the raw rows up to tie-pooling (raw PAVA
    may keep two non-violating blocks at the same x; aggregation pools
    them, changing the fitted value only at exact tie points).  The Spark
    path aggregates by rounded score first, which keeps the driver
    collect bounded (≤ one row per distinct rounded score — ≤ 10^6 rows
    for 6-decimal probabilities) at any corpus size.
    """
    s = np.asarray(scores, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    w = (
        np.ones_like(s)
        if weights is None
        else np.asarray(weights, dtype=np.float64)
    )
    order = np.argsort(s)
    xs, ys, ws = s[order], y[order], w[order]
    n = len(xs)
    sums = ys * ws
    counts = ws.copy()
    xsums = xs * ws
    active = list(range(n))
    changed = True
    while changed:
        changed = False
        kept = [active[0]]
        for j in range(1, len(active)):
            prev, curr = kept[-1], active[j]
            if sums[prev] / counts[prev] > sums[curr] / counts[curr]:
                sums[prev] += sums[curr]
                counts[prev] += counts[curr]
                xsums[prev] += xsums[curr]
                changed = True
            else:
                kept.append(curr)
        active = kept
    bx = np.array([xsums[i] / counts[i] for i in active], dtype=np.float64)
    by = np.array([sums[i] / counts[i] for i in active], dtype=np.float64)
    return bx, by


def isotonic_calibrate(scores, bx, by):
    """Vectorized searchsorted + linear interpolation over breakpoints.

    Edge behavior: below bx[0] → by[0]; at/above bx[-1] → by[-1]; x-ties
    (span < 1e-12) → midpoint of the two ys.  Result clamped to
    (eps, 1-eps).  This runs inside a pandas UDF with (bx, by) broadcast.
    """
    s = np.atleast_1d(np.asarray(scores, dtype=np.float64))
    idx = np.searchsorted(bx, s)
    out = np.empty_like(s)
    left = idx == 0
    right = idx >= len(bx)
    mid = ~(left | right)
    out[left] = by[0]
    out[right] = by[-1]
    if np.any(mid):
        i = idx[mid]
        x0, x1 = bx[i - 1], bx[i]
        y0, y1 = by[i - 1], by[i]
        span = x1 - x0
        tied = span < 1e-12
        interp = np.where(tied, (y0 + y1) / 2.0, y0 + (s[mid] - x0) / np.where(tied, 1.0, span) * (y1 - y0))
        out[mid] = interp
    return clamp01(out)


class IsotonicCalibrator:
    """Non-parametric monotone calibration (driver fit, columnar apply)."""

    def __init__(self) -> None:
        self.bx: np.ndarray | None = None
        self.by: np.ndarray | None = None

    def fit(self, scores, labels) -> None:
        self.bx, self.by = pava_fit(scores, labels)

    def calibrate(self, scores):
        if self.bx is None or self.by is None:
            raise RuntimeError("Call fit() before calibrate().")
        arr = np.asarray(scores, dtype=np.float64)
        out = isotonic_calibrate(arr, self.bx, self.by)
        return float(out[0]) if arr.ndim == 0 else out

    __call__ = calibrate
