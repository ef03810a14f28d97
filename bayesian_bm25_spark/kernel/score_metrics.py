"""Numpy kernel: calibration metrics (ECE, Brier, log loss, reliability)
and IR ranking metrics (DCG/NDCG, precision@k, average precision).

Semantics match the reference:
- bin rule: first bin [0, hi] closed, others (lo, hi]
  .......................... reference metrics.py:21-29
- ECE Σ (n_b/N)·|p̄_b − ȳ_b|, 10 bins .. reference metrics.py:32-58
- Brier mean((p−y)²) ........ reference metrics.py:61-72
- log loss, eps 1e-15 ....... reference metrics.py:75-93
- reliability diagram ....... reference metrics.py:96-117
- DCG/NDCG Σ rel_i/log2(i+2) . reference benchmarks/metrics.py:36-51
- precision@k / AP .......... reference benchmarks/metrics.py:54-73

All of these distribute as binned groupBy aggregations / windowed rank
aggregations in Spark (see operators.calibration_ops / operators.ir_metrics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def bin_index(probabilities, n_bins=10):
    """Bin id per probability, replicating the reference edge rule:
    first bin [0, e1] closed; others (lo, hi]."""
    p = np.asarray(probabilities, dtype=np.float64)
    e1 = 1.0 / n_bins
    # (lo, hi] ⇒ ceil(p·n)−1, except p ≤ e1 → 0
    idx = np.ceil(p * n_bins).astype(int) - 1
    idx = np.where(p <= e1, 0, idx)
    return np.clip(idx, 0, n_bins - 1)


def expected_calibration_error(probabilities, labels, n_bins=10):
    p = np.asarray(probabilities, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    total = len(p)
    idx = bin_index(p, n_bins)
    ece = 0.0
    for b in range(n_bins):
        mask = idx == b
        cnt = int(np.sum(mask))
        if cnt == 0:
            continue
        ece += (cnt / total) * abs(float(np.mean(p[mask])) - float(np.mean(y[mask])))
    return float(ece)


def brier_score(probabilities, labels):
    p = np.asarray(probabilities, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    return float(np.mean((p - y) ** 2))


def log_loss(probabilities, labels, *, eps=1e-15):
    p = np.clip(np.asarray(probabilities, dtype=np.float64), eps, 1.0 - eps)
    y = np.asarray(labels, dtype=np.float64)
    return float(-np.mean(y * np.log(p) + (1.0 - y) * np.log(1.0 - p)))


def reliability_diagram(probabilities, labels, n_bins=10):
    """[(avg_predicted, avg_actual, count)] per non-empty bin, in bin order."""
    p = np.asarray(probabilities, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    idx = bin_index(p, n_bins)
    out = []
    for b in range(n_bins):
        mask = idx == b
        cnt = int(np.sum(mask))
        if cnt == 0:
            continue
        out.append((float(np.mean(p[mask])), float(np.mean(y[mask])), cnt))
    return out


@dataclass
class CalibrationReport:
    ece: float
    brier: float
    logloss: float
    reliability: list
    n_samples: int
    n_bins: int

    def summary(self) -> str:
        lines = [
            "Calibration Report",
            "==================",
            f"  Samples : {self.n_samples}",
            f"  Bins    : {self.n_bins}",
            f"  ECE     : {self.ece:.6f}",
            f"  Brier   : {self.brier:.6f}",
            f"  LogLoss : {self.logloss:.6f}",
            "",
            "  Reliability Diagram",
            "  -------------------",
            f"  {'Predicted':>10}  {'Actual':>10}  {'Count':>6}",
        ]
        for pred, actual, cnt in self.reliability:
            lines.append(f"  {pred:>10.4f}  {actual:>10.4f}  {cnt:>6}")
        return "\n".join(lines)


def calibration_report(probabilities, labels, n_bins=10) -> CalibrationReport:
    return CalibrationReport(
        ece=expected_calibration_error(probabilities, labels, n_bins),
        brier=brier_score(probabilities, labels),
        logloss=log_loss(probabilities, labels),
        reliability=reliability_diagram(probabilities, labels, n_bins),
        n_samples=len(np.asarray(probabilities)),
        n_bins=n_bins,
    )


# -- IR ranking metrics -------------------------------------------------


def dcg_at_k(relevances, k):
    """Σ_{i<k} rel_i / log2(i + 2)."""
    rel = np.asarray(relevances, dtype=np.float64)[:k]
    if len(rel) == 0:
        return 0.0
    return float(np.sum(rel / np.log2(np.arange(2, len(rel) + 2))))


def ndcg_at_k(relevances, k, ideal_relevances=None):
    """DCG@k / ideal-DCG@k.

    Default (``ideal_relevances=None``): ideal = the RETRIEVED list's own
    relevances sorted descending — the reference's definition
    (benchmarks/metrics.py:45-51), kept for parity.  Passing the query's
    full qrels relevances as ``ideal_relevances`` gives the standard
    qrels-based NDCG — the definition ``operators.ir_metrics.ndcg_at_k``
    uses (the two coincide whenever the top-k retrieves every relevant
    doc).
    """
    pool = relevances if ideal_relevances is None else ideal_relevances
    ideal = dcg_at_k(sorted(pool, reverse=True), k)
    if ideal == 0.0:
        return 0.0
    return dcg_at_k(relevances, k) / ideal


def precision_at_k(relevances, k):
    """sum(rel > 0) / k — divisor is k even when fewer results exist
    (reference benchmarks/metrics.py:54-60)."""
    rel = np.asarray(relevances, dtype=np.float64)[:k]
    if len(rel) == 0:
        return 0.0
    return float(np.sum(rel > 0) / k)


def average_precision(relevances):
    rel = np.asarray(relevances, dtype=np.float64) > 0
    if not np.any(rel):
        return 0.0
    precisions = np.cumsum(rel) / np.arange(1, len(rel) + 1)
    return float(np.sum(precisions * rel) / np.sum(rel))
