"""Numpy kernel: query-local search diagnostics + separability gate.

Backend-agnostic dense-gating diagnostics (reference
benchmarks/search_diagnostics.py:20-179): cohesion = mean accepted
(neighborhood) distance, separation = mean contrast (background shell)
distance, reliability = purity·coverage; the gate is a silhouette-like
score clipped into [min_gate, max_gate].  In Spark these reduce to
per-query window means over ranked candidate shells (see
operators.fusion_ops / entry queries).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_EPS = 1e-12


@dataclass
class SearchDiagnostics:
    accepted_distances: np.ndarray
    contrast_distances: np.ndarray
    purity: float = 1.0
    coverage: float = 1.0

    def __post_init__(self) -> None:
        self.accepted_distances = np.asarray(self.accepted_distances, dtype=np.float64)
        self.contrast_distances = np.asarray(self.contrast_distances, dtype=np.float64)
        self.purity = float(np.clip(self.purity, 0.0, 1.0))
        self.coverage = float(np.clip(self.coverage, 0.0, 1.0))

    @property
    def cohesion(self) -> float:
        if len(self.accepted_distances) == 0:
            return 1.0
        return float(np.mean(self.accepted_distances))

    @property
    def separation(self) -> float:
        if len(self.contrast_distances) == 0:
            return self.cohesion
        return float(np.mean(self.contrast_distances))

    @property
    def reliability(self) -> float:
        return float(np.clip(self.purity * self.coverage, 0.0, 1.0))


def exact_search_diagnostics(
    dense_top_scores, *, local_k: int = 10, shell_k: int = 10
) -> SearchDiagnostics:
    """Diagnostics from an exact top-rank score list: the first local_k
    cosines become the accepted neighborhood, the next shell_k the
    contrast shell (distances = 1 − score)."""
    s = np.asarray(dense_top_scores, dtype=np.float64)
    if len(s) == 0:
        return SearchDiagnostics([], [], purity=0.0, coverage=0.0)
    local_k = max(1, min(local_k, len(s)))
    accepted = 1.0 - s[:local_k]
    shell_end = min(local_k + shell_k, len(s))
    contrast = 1.0 - s[local_k:shell_end] if shell_end > local_k else np.empty(0)
    return SearchDiagnostics(accepted, contrast, purity=1.0, coverage=1.0)


def separability_gate(
    diagnostics: SearchDiagnostics, *, min_gate: float = 0.02, max_gate: float = 0.98
) -> float:
    """Silhouette-like gate: clip(relu((b−a)/max(a,b))·reliability)."""
    if len(diagnostics.accepted_distances) == 0:
        return min_gate
    a = max(diagnostics.cohesion, 0.0)
    b = max(diagnostics.separation, 0.0)
    score = max(0.0, (b - a) / max(a, b, _EPS)) * diagnostics.reliability
    return float(np.clip(score, min_gate, max_gate))
