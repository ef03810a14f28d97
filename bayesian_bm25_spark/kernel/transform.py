"""Numpy kernel: Bayesian score→probability transform math.

This module is the *single source of truth* for the scalar/array math of
the engine.  The same functions run (a) inside Arrow-batched pandas UDFs
on executors and (b) on the driver as the pytest oracle, so Spark/oracle
parity holds by construction.

Semantics match the reference engine exactly (bayesian-bm25 v0.12.1):
clamping, split-form sigmoid, composite prior and the two-step product
form of the posterior are reproduced bit-for-bit.  Citations point at the
reference source so the parity claim is checkable:

- clamp / sigmoid / logit ........ reference probability.py:20-48
- likelihood σ(α·(s−β)) .......... reference probability.py:106-108 (Eq. 20)
- tf / norm / composite priors ... reference probability.py:110-140 (Eq. 25-27)
- two-step posterior ............. reference probability.py:142-169 (Eq. 22,
                                   Remark 4.4.5 — product form, NOT the
                                   logit form, for bit-level agreement)
- wand upper bound ............... reference probability.py:205-236 (Thm 6.1.2)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

EPS = 1e-10
ALPHA_FLOOR = 0.01

ArrayLike = "np.ndarray | float"


def clamp01(p):
    """Clamp probabilities into [EPS, 1-EPS] (reference Eq. 40)."""
    return np.clip(p, EPS, 1.0 - EPS)


def sigmoid(x):
    """Overflow-safe sigmoid via the split formulation.

    x >= 0 → 1/(1+e^-x);  x < 0 → e^x/(1+e^x).
    """
    x = np.asarray(x, dtype=np.float64)
    out = np.where(
        x >= 0.0,
        1.0 / (1.0 + np.exp(-np.clip(x, 0.0, None))),
        np.exp(np.clip(x, None, 0.0)) / (1.0 + np.exp(np.clip(x, None, 0.0))),
    )
    return float(out) if out.ndim == 0 else out


def logit(p):
    """log(p/(1-p)) with clamping."""
    p = clamp01(np.asarray(p, dtype=np.float64))
    out = np.log(p / (1.0 - p))
    return float(out) if out.ndim == 0 else out


def tf_prior(tf):
    """0.2 + 0.7·min(1, tf/10) — tf is the count of *distinct* query terms
    present in the doc (reference scorer.py:592-601), not a true term freq."""
    tf = np.asarray(tf, dtype=np.float64)
    out = 0.2 + 0.7 * np.minimum(1.0, tf / 10.0)
    return float(out) if out.ndim == 0 else out


def norm_prior(doc_len_ratio):
    """0.3 + 0.6·(1 − min(1, |r−0.5|·2)); peaks at r=0.5."""
    r = np.asarray(doc_len_ratio, dtype=np.float64)
    out = 0.3 + 0.6 * (1.0 - np.minimum(1.0, np.abs(r - 0.5) * 2.0))
    return float(out) if out.ndim == 0 else out


def composite_prior(tf, doc_len_ratio):
    """clip(0.7·P_tf + 0.3·P_norm, 0.1, 0.9)."""
    out = np.clip(0.7 * tf_prior(tf) + 0.3 * norm_prior(doc_len_ratio), 0.1, 0.9)
    return float(out) if np.ndim(out) == 0 else out


def posterior(likelihood, prior, base_rate=None):
    """Two-step Bayes update in product form (reference Remark 4.4.5).

    Step 1: p1 = L·p / (L·p + (1−L)(1−p)), clamped.
    Step 2 (when base_rate given): same update of p1 against base_rate.
    Equivalent to σ(logit L + logit p + logit br), but the product form is
    kept for bit-level agreement with the reference.
    """
    lv = np.asarray(likelihood, dtype=np.float64)
    pr = np.asarray(prior, dtype=np.float64)
    num = lv * pr
    out = clamp01(num / (num + (1.0 - lv) * (1.0 - pr)))
    if base_rate is not None:
        br = np.float64(base_rate)
        num2 = out * br
        out = clamp01(num2 / (num2 + (1.0 - out) * (1.0 - br)))
    return float(out) if np.ndim(out) == 0 else out


@dataclass
class TransformParams:
    """Driver-held learned state of the transform: a few floats.

    Broadcast into column expressions / pandas UDFs; persisted as JSON next
    to the index (reference keeps these on a Python object,
    probability.py:82-94).
    """

    alpha: float = 1.0
    beta: float = 0.0
    base_rate: float | None = None
    mode: str = "balanced"  # balanced | prior_aware | prior_free
    # online-learning state
    n_updates: int = 0
    grad_alpha_ema: float = 0.0
    grad_beta_ema: float = 0.0
    alpha_avg: float = field(default=None)  # type: ignore[assignment]
    beta_avg: float = field(default=None)  # type: ignore[assignment]

    VALID_MODES = ("balanced", "prior_aware", "prior_free")

    def __post_init__(self):
        if self.base_rate is not None and not (0.0 < self.base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {self.base_rate}")
        if self.mode not in self.VALID_MODES:
            raise ValueError(f"mode must be one of {self.VALID_MODES}, got {self.mode!r}")
        if self.alpha_avg is None:
            self.alpha_avg = self.alpha
        if self.beta_avg is None:
            self.beta_avg = self.beta

    # -- inference -----------------------------------------------------

    def likelihood(self, score):
        return sigmoid(self.alpha * (np.asarray(score, dtype=np.float64) - self.beta))

    def score_to_probability(self, score, tf, doc_len_ratio, prior_fn=None):
        """score → likelihood → prior → posterior(+base_rate).

        prior_free mode pins the prior at 0.5 (posterior == likelihood);
        a custom ``prior_fn(score, tf, ratio)`` replaces the composite
        prior otherwise (reference probability.py:171-203).
        """
        lv = self.likelihood(score)
        if self.mode == "prior_free":
            pr = np.float64(0.5)
        elif prior_fn is not None:
            pr = clamp01(np.asarray(prior_fn(score, tf, doc_len_ratio), dtype=np.float64))
        else:
            pr = composite_prior(tf, doc_len_ratio)
        return posterior(lv, pr, base_rate=self.base_rate)

    def wand_upper_bound(self, bm25_upper_bound, p_max=0.9):
        """Safe probability bound per term for WAND pruning (Thm 6.1.2)."""
        return posterior(self.likelihood(bm25_upper_bound), p_max, base_rate=self.base_rate)

    # -- learning (driver-side; state is 2 floats) ---------------------

    def _grads(self, scores, labels, tfs=None, ratios=None, weights=None, mode=None):
        mode = mode or self.mode
        L = clamp01(sigmoid(self.alpha * (scores - self.beta)))
        if mode == "prior_aware":
            p = np.asarray(composite_prior(tfs, ratios), dtype=np.float64)
            denom = L * p + (1.0 - L) * (1.0 - p)
            pred = clamp01(L * p / denom)
            dP_dL = p * (1.0 - p) / (denom**2)
            err = pred - labels
            ga = err * dP_dL * (L * (1.0 - L) * (scores - self.beta))
            gb = err * dP_dL * (-L * (1.0 - L) * self.alpha)
        else:
            err = L - labels
            ga = err * (scores - self.beta)
            gb = err * (-self.alpha)
        if weights is not None:
            ga = weights * ga
            gb = weights * gb
        return float(np.mean(ga)), float(np.mean(gb))

    def fit(
        self,
        scores,
        labels,
        *,
        learning_rate=0.01,
        max_iterations=1000,
        tolerance=1e-6,
        mode="balanced",
        tfs=None,
        doc_len_ratios=None,
        sample_weights=None,
    ):
        """Batch BCE gradient descent on (α, β) — reference Algorithm 8.3.1.

        Runs on the driver: the state is two floats and the (score, label)
        sample fits in memory; distributing the loop buys nothing.  For
        huge label sets the per-iteration gradient means distribute
        trivially via ``df.agg`` (they are means of row-local terms).
        """
        if mode not in self.VALID_MODES:
            raise ValueError(f"mode must be one of {self.VALID_MODES}, got {mode!r}")
        if mode == "prior_aware" and (tfs is None or doc_len_ratios is None):
            raise ValueError("tfs and doc_len_ratios are required when mode='prior_aware'")
        scores = np.asarray(scores, dtype=np.float64)
        labels = np.asarray(labels, dtype=np.float64)
        if tfs is not None:
            tfs = np.asarray(tfs, dtype=np.float64)
        if doc_len_ratios is not None:
            doc_len_ratios = np.asarray(doc_len_ratios, dtype=np.float64)
        for _ in range(max_iterations):
            ga, gb = self._grads(scores, labels, tfs, doc_len_ratios, sample_weights, mode)
            na, nb = self.alpha - learning_rate * ga, self.beta - learning_rate * gb
            done = abs(na - self.alpha) < tolerance and abs(nb - self.beta) < tolerance
            self.alpha, self.beta = na, nb
            if done:
                break
        self.mode = mode
        self.n_updates = 0
        self.grad_alpha_ema = 0.0
        self.grad_beta_ema = 0.0
        self.alpha_avg = self.alpha
        self.beta_avg = self.beta

    def update(
        self,
        score,
        label,
        *,
        learning_rate=0.01,
        momentum=0.9,
        decay_tau=1000.0,
        max_grad_norm=1.0,
        avg_decay=0.995,
        mode=None,
        tf=None,
        doc_len_ratio=None,
    ):
        """Online SGD step: EMA-smoothed grads + bias correction, L2 clip,
        lr decay lr/(1+t/τ), α floor, Polyak averaging (reference
        probability.py:350-473).  Streaming analog: ``foreachBatch`` over a
        feedback stream updating this broadcast state."""
        eff_mode = mode if mode is not None else self.mode
        if eff_mode not in self.VALID_MODES:
            raise ValueError(f"mode must be one of {self.VALID_MODES}, got {eff_mode!r}")
        if eff_mode == "prior_aware" and (tf is None or doc_len_ratio is None):
            raise ValueError("tf and doc_len_ratio are required when mode='prior_aware'")
        s = np.atleast_1d(np.asarray(score, dtype=np.float64))
        y = np.atleast_1d(np.asarray(label, dtype=np.float64))
        t = np.atleast_1d(np.asarray(tf, dtype=np.float64)) if tf is not None else None
        r = (
            np.atleast_1d(np.asarray(doc_len_ratio, dtype=np.float64))
            if doc_len_ratio is not None
            else None
        )
        ga, gb = self._grads(s, y, t, r, None, eff_mode)
        if mode is not None:
            self.mode = eff_mode

        self.grad_alpha_ema = momentum * self.grad_alpha_ema + (1 - momentum) * ga
        self.grad_beta_ema = momentum * self.grad_beta_ema + (1 - momentum) * gb
        self.n_updates += 1
        corr = 1.0 - momentum**self.n_updates
        ca, cb = self.grad_alpha_ema / corr, self.grad_beta_ema / corr
        norm = float(np.sqrt(ca * ca + cb * cb))
        if norm > max_grad_norm:
            ca *= max_grad_norm / norm
            cb *= max_grad_norm / norm
        lr = learning_rate / (1.0 + self.n_updates / decay_tau)
        self.alpha -= lr * ca
        self.beta -= lr * cb
        if self.alpha < ALPHA_FLOOR:
            self.alpha = ALPHA_FLOOR
        self.alpha_avg = avg_decay * self.alpha_avg + (1.0 - avg_decay) * self.alpha
        self.beta_avg = avg_decay * self.beta_avg + (1.0 - avg_decay) * self.beta

    # -- (de)serialization --------------------------------------------

    def to_dict(self) -> dict:
        return {
            "alpha": self.alpha,
            "beta": self.beta,
            "base_rate": self.base_rate,
            "mode": self.mode,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TransformParams":
        return cls(
            alpha=d["alpha"],
            beta=d["beta"],
            base_rate=d.get("base_rate"),
            mode=d.get("mode", "balanced"),
        )


@dataclass
class TemporalTransformParams(TransformParams):
    """Time-weighted variant: per-sample weight exp(−λ(max_ts−ts)),
    λ = ln2/half_life (reference probability.py:476-666)."""

    decay_half_life: float = 1000.0
    timestamp: int = 0

    def __post_init__(self):
        if self.decay_half_life <= 0.0:
            raise ValueError(f"decay_half_life must be positive, got {self.decay_half_life}")
        super().__post_init__()

    @property
    def decay_rate(self) -> float:
        return float(np.log(2.0) / self.decay_half_life)

    def fit(self, scores, labels, *, timestamps=None, **kw):
        scores = np.asarray(scores, dtype=np.float64)
        if timestamps is not None:
            ts = np.asarray(timestamps, dtype=np.float64)
            w = np.exp(-self.decay_rate * (float(np.max(ts)) - ts))
            w = w * (len(scores) / np.sum(w))
        else:
            w = np.ones(len(scores), dtype=np.float64)
        super().fit(scores, labels, sample_weights=w, **kw)

    def update(self, score, label, *, avg_decay=0.995, **kw):
        self.timestamp += 1
        eff = avg_decay * (1.0 - 1.0 / (1.0 + self.timestamp))
        super().update(score, label, avg_decay=eff, **kw)
