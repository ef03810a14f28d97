"""Numpy kernel: vector-similarity score calibration via density ratio.

Likelihood-ratio calibration of vector distances (reference
vector_probability.py, "Index-Aware Bayesian Calibration of Vector
Similarity Scores"):

    P(R|d) = σ(ln(f_R(d)/f_G(d)) + logit(P_base))

with f_G a fixed background Gaussian fit on corpus distances and f_R an
adaptively estimated relevant density:

- gaussian pdf / Silverman bandwidth / weighted KDE
  ............ reference vector_probability.py:36-115 (Defs 4.3.1, 4.4.1)
- gap detection (span-ratio ≥ 0.15, z-score > 2 fallback)
  ............ reference vector_probability.py:191-235 (Strategy 4.6.1)
- weight sharpening / distance-density fallback
  ............ reference vector_probability.py:253-294
- fixed-background 2-component GMM-EM (only R updated)
  ............ reference vector_probability.py:332-431 (Alg 5.3.1)
- auto-routing ............ reference vector_probability.py:442-535
- IVF/kNN density priors .. reference vector_probability.py:666-736

In Spark, calibration runs per query over its candidate set (≤ ~1000
distances) inside one Arrow batch — the iterative EM/KDE never crosses a
partition boundary (see operators.vector_ops).
"""

from __future__ import annotations

import math

import numpy as np

from bayesian_bm25_spark.kernel.transform import EPS, clamp01, logit, sigmoid


def gaussian_pdf(x, mu: float, sigma: float):
    x = np.asarray(x, dtype=np.float64)
    # reciprocal-then-multiply, matching the reference bit-for-bit
    coeff = 1.0 / (sigma * math.sqrt(2.0 * math.pi))
    z = (x - mu) / sigma
    out = coeff * np.exp(-0.5 * z * z)
    return float(out) if out.ndim == 0 else out


def silverman_bandwidth(distances, weights=None) -> float:
    """h = 1.06·σ_w·K_eff^(−1/5), K_eff = (Σw)²/Σw²."""
    d = np.asarray(distances, dtype=np.float64)
    w = np.ones_like(d) if weights is None else np.asarray(weights, dtype=np.float64)
    ws, wss = float(np.sum(w)), float(np.sum(w * w))
    if ws < EPS or wss < EPS:
        return EPS
    k_eff = ws * ws / wss
    mean = float(np.sum(w * d) / ws)
    var = float(np.sum(w * (d - mean) ** 2) / ws)
    sigma = math.sqrt(max(var, 0.0))
    if sigma < EPS:
        return EPS
    return max(1.06 * sigma * k_eff ** (-0.2), EPS)


def kernel_density(eval_points, sample_points, weights, bandwidth: float):
    """Weighted Gaussian KDE, floored at EPS."""
    e = np.asarray(eval_points, dtype=np.float64)
    s = np.asarray(sample_points, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    ws = float(np.sum(w))
    if ws < EPS:
        return np.full_like(e, EPS)
    diff = e[:, None] - s[None, :]
    k = np.exp(-0.5 * (diff / bandwidth) ** 2) / (bandwidth * math.sqrt(2.0 * math.pi))
    return np.maximum(np.sum(w[None, :] * k, axis=1) / ws, EPS)


def detect_gap(distances, threshold_ratio: float = 0.15):
    """Index (sorted order) of the first element after the semantic
    cliff, or None.  Primary: max gap/span ≥ ratio; fallback z>2."""
    d = np.asarray(distances, dtype=np.float64)
    if len(d) < 3:
        return None
    sd = np.sort(d)
    gaps = np.diff(sd)
    if len(gaps) == 0:
        return None
    span = sd[-1] - sd[0]
    if span < EPS:
        return None
    ratios = gaps / span
    imax = int(np.argmax(ratios))
    if ratios[imax] >= threshold_ratio:
        return imax + 1
    mg, sg = float(np.mean(gaps)), float(np.std(gaps))
    if sg > EPS:
        z = (gaps - mg) / sg
        iz = int(np.argmax(z))
        if z[iz] > 2.0:
            return iz + 1
    return None


def gap_weights(distances):
    """1.0 below the gap threshold, 0.0 above; None when no gap."""
    d = np.asarray(distances, dtype=np.float64)
    idx = detect_gap(d)
    if idx is None:
        return None
    thr = np.sort(d)[idx]
    return np.where(d < thr, 1.0, 0.0)


def sharpen_weights(weights, temperature: float = 0.05):
    """Mass-preserving softmax-temperature sharpening."""
    w = np.asarray(weights, dtype=np.float64)
    mass = float(np.sum(w))
    s = np.exp((w - float(np.max(w))) / temperature)
    ssum = float(np.sum(s))
    if ssum > EPS:
        s = s * (mass / ssum)
    return s


def distance_density_weights(distances):
    """Fallback weights σ(median(d)/d − 1): closer ⇒ heavier."""
    d = np.asarray(distances, dtype=np.float64)
    med = float(np.median(d))
    return np.asarray(sigmoid(med / np.maximum(d, EPS) - 1.0))


def _signal_mass(w) -> float:
    if w is None:
        return 0.0
    w = np.asarray(w, dtype=np.float64)
    return 0.0 if w.size == 0 else float(np.sum(np.maximum(w, 0.0)))


class VectorProbabilityTransform:
    """Background Gaussian (μ_G, σ_G fixed) + adaptive relevant density."""

    def __init__(self, mu_G: float, sigma_G: float, base_rate: float | None = None):
        if sigma_G <= 0.0:
            raise ValueError(f"sigma_G must be positive, got {sigma_G}")
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
        self.mu_G = float(mu_G)
        self.sigma_G = float(sigma_G)
        self.base_rate = base_rate
        self._logit_br = float(logit(base_rate)) if base_rate is not None else 0.0

    @classmethod
    def fit_background(cls, distances, *, base_rate=None):
        """μ_G = mean, σ_G = std of corpus distances (a plain
        ``df.agg(avg, stddev_pop)`` in Spark)."""
        d = np.asarray(distances, dtype=np.float64)
        return cls(
            mu_G=float(np.mean(d)),
            sigma_G=max(float(np.std(d)), EPS),
            base_rate=base_rate,
        )

    def to_dict(self) -> dict:
        return {"mu_G": self.mu_G, "sigma_G": self.sigma_G, "base_rate": self.base_rate}

    @classmethod
    def from_dict(cls, d: dict) -> "VectorProbabilityTransform":
        return cls(d["mu_G"], d["sigma_G"], d.get("base_rate"))

    def estimate_kde(self, distances, weights, bandwidth_factor=2.0, *, eval_points=None):
        d = np.asarray(distances, dtype=np.float64)
        e = d if eval_points is None else np.asarray(eval_points, dtype=np.float64)
        h = silverman_bandwidth(d, weights) * bandwidth_factor
        return kernel_density(e, d, np.asarray(weights, dtype=np.float64), h)

    def fit_gmm_params(self, distances, weights=None, *, max_iter=100, tol=1e-6):
        """EM fit only — returns the fitted (μ_R, σ_R, π_R).

        Split out of :meth:`estimate_gmm` so the data-dependent SQL
        oracle (entry_queries.build_sql_vector_calibrated_topk) can fit
        the per-query mixture driver-side and inline the params; the
        arithmetic is unchanged."""
        d = np.asarray(distances, dtype=np.float64)
        n = len(d)
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            ws = float(np.sum(w))
            if ws > EPS:
                mu_R = float(np.sum(w * d) / ws)
                sigma_R = float(np.sqrt(np.sum(w * (d - mu_R) ** 2) / ws))
                pi_R = float(np.clip(ws / n, 0.1, 0.9))
            else:
                mu_R, sigma_R, pi_R = float(np.mean(d)), float(np.std(d)), 0.5
        else:
            mu_R = self.mu_G - 0.5 * self.sigma_G
            sigma_R = self.sigma_G * 0.5
            pi_R = 0.3
        if sigma_R < EPS:
            sigma_R = self.sigma_G * 0.5

        prev_ll = -np.inf
        for _ in range(max_iter):
            fr = pi_R * np.asarray(gaussian_pdf(d, mu_R, sigma_R))
            fg = (1.0 - pi_R) * np.asarray(gaussian_pdf(d, self.mu_G, self.sigma_G))
            total = np.maximum(fr + fg, EPS)
            gamma = fr / total
            ll = float(np.sum(np.log(total)))
            if abs(ll - prev_ll) < tol:
                break
            prev_ll = ll
            gs = float(np.sum(gamma))
            if gs < EPS:
                break
            mu_R = float(np.sum(gamma * d) / gs)
            sigma_R = float(np.sqrt(np.sum(gamma * (d - mu_R) ** 2) / gs))
            if sigma_R < EPS:
                sigma_R = self.sigma_G * 0.1
            pi_R = float(np.clip(gs / n, 0.01, 0.99))

        return mu_R, sigma_R, pi_R

    def estimate_gmm(self, distances, weights=None, *, max_iter=100, tol=1e-6, eval_points=None):
        """Fixed-background 2-component EM: only (μ_R, σ_R, π_R) move."""
        d = np.asarray(distances, dtype=np.float64)
        e = d if eval_points is None else np.asarray(eval_points, dtype=np.float64)
        mu_R, sigma_R, _ = self.fit_gmm_params(d, weights, max_iter=max_iter, tol=tol)
        return np.maximum(np.asarray(gaussian_pdf(e, mu_R, sigma_R)), EPS)

    def _relevant_density(
        self,
        eval_points,
        sample_distances,
        *,
        weights=None,
        method="auto",
        bandwidth_factor=2.0,
        density_prior=None,
    ):
        e = np.asarray(eval_points, dtype=np.float64)
        s = np.asarray(sample_distances, dtype=np.float64)
        if len(s) == 0:
            return np.full_like(e, EPS)
        wm, dm = _signal_mass(weights), _signal_mass(density_prior)
        if method == "auto":
            gw = gap_weights(s)
            if gw is not None:
                if len(s) >= 50:
                    return self.estimate_kde(s, gw, bandwidth_factor, eval_points=e)
                return self.estimate_gmm(s, gw, eval_points=e)
            if weights is not None and wm > EPS:
                return self.estimate_kde(s, sharpen_weights(weights), bandwidth_factor, eval_points=e)
            if density_prior is not None and dm > EPS:
                return self.estimate_gmm(s, density_prior, eval_points=e)
            return self.estimate_gmm(s, distance_density_weights(s), eval_points=e)
        if method == "kde":
            if weights is not None and wm > EPS:
                ew = np.asarray(weights, dtype=np.float64)
            elif density_prior is not None and dm > EPS:
                ew = np.asarray(density_prior, dtype=np.float64)
            else:
                gw = gap_weights(s)
                ew = gw if gw is not None else distance_density_weights(s)
            return self.estimate_kde(s, ew, bandwidth_factor, eval_points=e)
        if method == "gmm":
            if weights is not None and wm > EPS:
                ew = np.asarray(weights, dtype=np.float64)
            elif density_prior is not None and dm > EPS:
                ew = np.asarray(density_prior, dtype=np.float64)
            else:
                ew = None
            return self.estimate_gmm(s, ew, eval_points=e)
        raise ValueError(f"method must be 'auto', 'kde', or 'gmm', got {method!r}")

    def log_density_ratio(self, distances, f_R_values):
        d = np.asarray(distances, dtype=np.float64)
        fr = np.maximum(np.asarray(f_R_values, dtype=np.float64), EPS)
        fg = np.maximum(np.asarray(gaussian_pdf(d, self.mu_G, self.sigma_G)), EPS)
        out = np.log(fr / fg)
        return float(out) if out.ndim == 0 else out

    def calibrate(self, distances, *, weights=None, method="auto",
                  bandwidth_factor=2.0, density_prior=None):
        scalar = np.ndim(distances) == 0
        d = np.atleast_1d(np.asarray(distances, dtype=np.float64))
        f_R = self._relevant_density(
            d, d, weights=weights, method=method,
            bandwidth_factor=bandwidth_factor, density_prior=density_prior,
        )
        out = clamp01(sigmoid(self.log_density_ratio(d, f_R) + self._logit_br))
        return float(out[0]) if scalar else out

    def calibrate_with_sample(self, eval_distances, sample_distances, *, weights=None,
                              method="auto", bandwidth_factor=2.0, density_prior=None):
        """Index-aware path: the density sample (e.g. IVF probed cells)
        is decoupled from the evaluation points."""
        scalar = np.ndim(eval_distances) == 0
        e = np.atleast_1d(np.asarray(eval_distances, dtype=np.float64))
        f_R = self._relevant_density(
            e, np.asarray(sample_distances, dtype=np.float64), weights=weights,
            method=method, bandwidth_factor=bandwidth_factor, density_prior=density_prior,
        )
        out = clamp01(sigmoid(self.log_density_ratio(e, f_R) + self._logit_br))
        return float(out[0]) if scalar else out


def ivf_density_prior(cell_population, avg_population: float, *, gamma: float = 1.0):
    """σ(γ·(avg_pop/pop − 1)): sparse cells ⇒ higher prior (IDF analog)."""
    pop = np.maximum(np.asarray(cell_population, dtype=np.float64), EPS)
    out = sigmoid(gamma * (avg_population / pop - 1.0))
    return float(out) if np.ndim(out) == 0 else out


def knn_density_prior(kth_distance, global_median_kth: float, *, gamma: float = 1.0):
    """σ(γ·(kth_d/median_kth − 1)): sparse neighborhoods ⇒ higher prior."""
    kd = np.asarray(kth_distance, dtype=np.float64)
    out = sigmoid(gamma * (kd / max(global_median_kth, EPS) - 1.0))
    return float(out) if np.ndim(out) == 0 else out
