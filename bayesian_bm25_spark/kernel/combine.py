"""Numpy kernel: probabilistic score-combination ("fusion") math.

AND / OR / NOT, log-odds conjunction, gating, balanced hybrid fusion, and
the learnable / attention weighting schemes.  Semantics match the
reference engine (bayesian-bm25 fusion.py) exactly:

- cosine→prob ................. reference fusion.py:25-45   (Def. 7.1.2)
- NOT / AND / OR .............. reference fusion.py:48-100  (Eq. 33-37)
- alpha resolution ............ reference fusion.py:103-116 ("auto"→0.5)
- gating (relu/swish/gelu/
  softplus) ................... reference fusion.py:119-169
- log-odds conjunction ........ reference fusion.py:172-280 (weighted
  Log-OP default α=0; unweighted default α=0.5)
- balanced hybrid fusion ...... reference fusion.py:283-343 (per-candidate
  -set min-max in logit space; zero-variance → zeros)
- learnable simplex weights ... reference fusion.py:346-636
- attention weights ........... reference fusion.py:639-1143 (seeded
  Xavier init, softmax Jacobian chain)
- multi-head .................. reference fusion.py:1146-1372

The training loops run on the driver (state is a handful of floats); the
forward paths are also exposed as Spark Column expressions in
``bayesian_bm25_spark.functions.columns``.
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_spark.kernel.transform import clamp01, logit, sigmoid

SQRT_N_ALPHA = 0.5  # "auto" → √n scaling law (reference Thm 4.2.1)


def cosine_to_probability(score):
    """Map cosine similarity in [-1, 1] to probability: clamp((1+cos)/2)."""
    out = clamp01((1.0 + np.asarray(score, dtype=np.float64)) / 2.0)
    return float(out) if np.ndim(out) == 0 else out


def prob_not(prob):
    """Complement with double clamp: clamp(1 − clamp(p))."""
    out = clamp01(1.0 - clamp01(np.asarray(prob, dtype=np.float64)))
    return float(out) if np.ndim(out) == 0 else out


def prob_and(probs):
    """Product rule in log space over the last axis: exp(Σ ln p_i)."""
    p = clamp01(np.asarray(probs, dtype=np.float64))
    out = np.exp(np.sum(np.log(p), axis=-1))
    return float(out) if np.ndim(out) == 0 else out


def prob_or(probs):
    """Complement rule in log space: 1 − exp(Σ ln(1−p_i))."""
    p = clamp01(np.asarray(probs, dtype=np.float64))
    out = 1.0 - np.exp(np.sum(np.log(1.0 - p), axis=-1))
    return float(out) if np.ndim(out) == 0 else out


def resolve_alpha(alpha, default):
    """None → default; "auto" → 0.5; else float(alpha)."""
    if alpha is None:
        return default
    if isinstance(alpha, str):
        if alpha != "auto":
            raise ValueError(f"alpha must be a float, None, or 'auto', got {alpha!r}")
        return SQRT_N_ALPHA
    return float(alpha)


def apply_gating(logits, gating, beta=1.0):
    """Sparse-signal gating on logits before aggregation.

    relu: max(0,x) — MAP under sparse prior; swish: x·σ(βx); gelu:
    x·σ(1.702x); softplus: logaddexp(0,βx)/β (β ignored for gelu).
    """
    if gating == "none":
        return logits
    if gating == "relu":
        return np.maximum(0.0, logits)
    if gating == "swish":
        return logits * sigmoid(beta * logits)
    if gating == "gelu":
        return logits * sigmoid(1.702 * logits)
    if gating == "softplus":
        return np.logaddexp(0.0, beta * logits) / beta
    raise ValueError(
        f"gating must be 'none', 'relu', 'swish', 'gelu', or 'softplus', got {gating!r}"
    )


def log_odds_conjunction(
    probs,
    alpha=None,
    weights=None,
    gating="none",
    gating_beta=1.0,
    max_logit=None,
):
    """Log-odds conjunction with n^α confidence scaling.

    Unweighted: σ(n^α · mean(logit p_i)), default α=0.5.
    Weighted (Log-OP): σ(n^α · Σ w_i·logit p_i), w ≥ 0, Σw = 1,
    default α=0.  Gating and optional |logit| clipping are applied before
    scaling.
    """
    p = clamp01(np.asarray(probs, dtype=np.float64))
    n = p.shape[-1]
    x = apply_gating(logit(p), gating, beta=gating_beta)
    if max_logit is not None:
        x = np.clip(x, -max_logit, max_logit)
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        if np.any(w < 0):
            raise ValueError("weights must be non-negative")
        if abs(float(np.sum(w)) - 1.0) > 1e-6:
            raise ValueError(f"weights must sum to 1, got {float(np.sum(w))}")
        a = resolve_alpha(alpha, default=0.0)
        out = sigmoid((n**a) * np.sum(w * x, axis=-1))
        return float(out) if np.ndim(out) == 0 else out
    a = resolve_alpha(alpha, default=0.5)
    out = sigmoid(np.mean(x, axis=-1) * (n**a))
    return float(out) if np.ndim(out) == 0 else out


def min_max_normalize(arr):
    """(x−lo)/(hi−lo); all-zeros when the span is < 1e-12."""
    arr = np.asarray(arr, dtype=np.float64)
    lo, hi = float(arr.min()), float(arr.max())
    if hi - lo < 1e-12:
        return np.zeros_like(arr)
    return (arr - lo) / (hi - lo)


def balanced_log_odds_fusion(sparse_probs, dense_similarities, weight=0.5):
    """Hybrid sparse/dense fusion: min-max-normalized logits, convex mix.

    Returns a *score* (not a probability).  The normalization is a
    per-candidate-set global op — in Spark this is the one fusion op that
    needs a per-query window (min/max over the candidate set).
    """
    ls = logit(clamp01(np.asarray(sparse_probs, dtype=np.float64)))
    ld = logit(cosine_to_probability(np.asarray(dense_similarities, dtype=np.float64)))
    out = weight * min_max_normalize(ld) + (1.0 - weight) * min_max_normalize(ls)
    return float(out) if np.ndim(out) == 0 else out


def softmax(z, axis=-1):
    """Max-shifted softmax along ``axis``."""
    z = np.asarray(z, dtype=np.float64)
    e = np.exp(z - np.max(z, axis=axis, keepdims=True))
    return e / np.sum(e, axis=axis, keepdims=True)


def _ema_step(state, grad, momentum, n_updates):
    """EMA smoothing + bias correction shared by the online updaters."""
    state = momentum * state + (1.0 - momentum) * grad
    corrected = state / (1.0 - momentum**n_updates)
    return state, corrected


class LearnableLogOddsWeights:
    """Per-signal reliability weights on the simplex, softmax-parameterized.

    Zero logits initialize to uniform 1/n (Naive-Bayes start).  Forward:
    σ(n^α · Σ w_i·logit p_i [+ logit base_rate]).  The BCE gradient for
    logit z_j is Hebbian: n^α·(p−y)·w_j·(x_j − x̄_w).
    """

    def __init__(self, n_signals, alpha=0.0, base_rate=None):
        if n_signals < 1:
            raise ValueError(f"n_signals must be >= 1, got {n_signals}")
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
        self.n_signals = n_signals
        self.alpha = resolve_alpha(alpha, default=0.0)
        self.base_rate = base_rate
        self._logit_br = float(logit(base_rate)) if base_rate is not None else None
        self.z = np.zeros(n_signals, dtype=np.float64)
        self.n_updates = 0
        self._gz_ema = np.zeros(n_signals, dtype=np.float64)
        self.weights_avg = np.full(n_signals, 1.0 / n_signals, dtype=np.float64)

    @property
    def weights(self):
        return softmax(self.z)

    def _forward(self, x, w):
        lw = (self.n_signals**self.alpha) * np.sum(w * x, axis=-1)
        if self._logit_br is not None:
            lw = lw + self._logit_br
        return sigmoid(lw)

    def __call__(self, probs, use_averaged=False):
        p = clamp01(np.asarray(probs, dtype=np.float64))
        w = self.weights_avg if use_averaged else self.weights
        out = self._forward(logit(p), w)
        return float(out) if np.ndim(out) == 0 else out

    def _grad(self, x, labels, w):
        scale = self.n_signals**self.alpha
        p = np.atleast_1d(np.asarray(self._forward(x, w), dtype=np.float64))
        err = p - labels
        return np.mean(
            scale * err[:, None] * w[None, :] * (x - np.sum(w * x, axis=-1)[:, None]),
            axis=0,
        )

    def fit(self, probs, labels, *, learning_rate=0.01, max_iterations=1000, tolerance=1e-6):
        probs = np.asarray(probs, dtype=np.float64)
        labels = np.asarray(labels, dtype=np.float64)
        if probs.ndim == 1:
            probs = probs.reshape(1, -1)
        if probs.shape[-1] != self.n_signals:
            raise ValueError(
                f"probs last dimension {probs.shape[-1]} != n_signals {self.n_signals}"
            )
        x = logit(clamp01(probs))
        for _ in range(max_iterations):
            g = self._grad(x, labels, self.weights)
            self.z -= learning_rate * g
            if np.max(np.abs(learning_rate * g)) < tolerance:
                break
        self.n_updates = 0
        self._gz_ema = np.zeros(self.n_signals, dtype=np.float64)
        self.weights_avg = softmax(self.z).copy()

    def update(
        self,
        probs,
        label,
        *,
        learning_rate=0.01,
        momentum=0.9,
        decay_tau=1000.0,
        max_grad_norm=1.0,
        avg_decay=0.995,
    ):
        probs = np.atleast_1d(np.asarray(probs, dtype=np.float64))
        label = np.atleast_1d(np.asarray(label, dtype=np.float64))
        if probs.ndim == 1:
            probs = probs.reshape(1, -1)
        x = logit(clamp01(probs))
        g = self._grad(x, label, self.weights)
        self.n_updates += 1
        self._gz_ema, cg = _ema_step(self._gz_ema, g, momentum, self.n_updates)
        norm = float(np.sqrt(np.sum(cg**2)))
        if norm > max_grad_norm:
            cg = cg * (max_grad_norm / norm)
        lr = learning_rate / (1.0 + self.n_updates / decay_tau)
        self.z -= lr * cg
        self.weights_avg = avg_decay * self.weights_avg + (1.0 - avg_decay) * softmax(self.z)


class AttentionLogOddsWeights:
    """Query-dependent weights: w(q) = softmax(W·features + b).

    Feature-agnostic linear projection from query features to simplex
    weights; optional per-signal min-max logit normalization over the
    candidate batch (per query group in ``fit`` via ``query_ids``).
    """

    def __init__(
        self,
        n_signals,
        n_query_features,
        alpha=0.5,
        normalize=False,
        seed=0,
        base_rate=None,
    ):
        if n_signals < 1:
            raise ValueError(f"n_signals must be >= 1, got {n_signals}")
        if n_query_features < 1:
            raise ValueError(f"n_query_features must be >= 1, got {n_query_features}")
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
        self.n_signals = n_signals
        self.n_query_features = n_query_features
        self.alpha = resolve_alpha(alpha, default=0.5)
        self.normalize = normalize
        self.base_rate = base_rate
        self._logit_br = float(logit(base_rate)) if base_rate is not None else None
        rng = np.random.default_rng(seed)  # seeded Xavier init (reference fusion.py:691-694)
        self.W = rng.normal(0, 1.0 / np.sqrt(n_query_features), size=(n_signals, n_query_features))
        self.b = np.zeros(n_signals, dtype=np.float64)
        self.n_updates = 0
        self._gW_ema = np.zeros_like(self.W)
        self._gb_ema = np.zeros_like(self.b)
        self.W_avg = self.W.copy()
        self.b_avg = self.b.copy()

    @staticmethod
    def _normalize_logits(x):
        out = x.copy()
        for col in range(x.shape[-1]):
            out[..., col] = min_max_normalize(x[..., col])
        return out

    def compute_weights(self, query_features, use_averaged=False):
        W = self.W_avg if use_averaged else self.W
        b = self.b_avg if use_averaged else self.b
        return softmax(query_features @ W.T + b)

    def __call__(self, probs, query_features, use_averaged=False):
        probs = np.asarray(probs, dtype=np.float64)
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        w = self.compute_weights(qf, use_averaged)
        scale = self.n_signals**self.alpha
        if probs.ndim == 1:
            # single candidate: nothing to normalize across
            lw = scale * np.sum(w.squeeze(0) * logit(clamp01(probs)))
            if self._logit_br is not None:
                lw += self._logit_br
            return float(sigmoid(lw))
        x = logit(clamp01(probs))
        if self.normalize:
            x = self._normalize_logits(x)
        lw = scale * np.sum(w * x, axis=-1)
        if self._logit_br is not None:
            lw = lw + self._logit_br
        return np.atleast_1d(np.asarray(sigmoid(lw), dtype=np.float64))

    def _forward_grad(self, x, labels, qf):
        scale = self.n_signals**self.alpha
        w = softmax(qf @ self.W.T + self.b)
        x_bar = np.sum(w * x, axis=-1)
        lw = scale * x_bar
        if self._logit_br is not None:
            lw = lw + self._logit_br
        p = np.atleast_1d(np.asarray(sigmoid(lw), dtype=np.float64))
        err = p - labels
        grad_z = scale * err[:, None] * w * (x - x_bar[:, None])
        m = x.shape[0]
        return grad_z.T @ qf / m, np.mean(grad_z, axis=0)

    def _prep_x(self, probs, query_ids=None):
        x = logit(clamp01(probs))
        if self.normalize:
            if query_ids is not None:
                query_ids = np.asarray(query_ids)
                for qid in np.unique(query_ids):
                    mask = query_ids == qid
                    x[mask] = self._normalize_logits(x[mask])
            else:
                x = self._normalize_logits(x)
        return x

    def fit(
        self,
        probs,
        labels,
        query_features,
        *,
        query_ids=None,
        learning_rate=0.01,
        max_iterations=1000,
        tolerance=1e-6,
    ):
        probs = clamp01(np.asarray(probs, dtype=np.float64))
        labels = np.asarray(labels, dtype=np.float64)
        qf = np.asarray(query_features, dtype=np.float64)
        if probs.ndim == 1:
            probs = probs.reshape(1, -1)
        if qf.ndim == 1:
            qf = qf.reshape(1, -1)
        x = self._prep_x(probs, query_ids)
        for _ in range(max_iterations):
            gW, gb = self._forward_grad(x, labels, qf)
            self.W -= learning_rate * gW
            self.b -= learning_rate * gb
            max_change = max(
                float(np.max(np.abs(learning_rate * gW))),
                float(np.max(np.abs(learning_rate * gb))),
            )
            if max_change < tolerance:
                break
        self.n_updates = 0
        self._gW_ema = np.zeros_like(self.W)
        self._gb_ema = np.zeros_like(self.b)
        self.W_avg = self.W.copy()
        self.b_avg = self.b.copy()

    def update(
        self,
        probs,
        label,
        query_features,
        *,
        learning_rate=0.01,
        momentum=0.9,
        decay_tau=1000.0,
        max_grad_norm=1.0,
        avg_decay=0.995,
    ):
        probs = clamp01(np.atleast_1d(np.asarray(probs, dtype=np.float64)))
        label = np.atleast_1d(np.asarray(label, dtype=np.float64))
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        if probs.ndim == 1:
            probs = probs.reshape(1, -1)
        x = self._prep_x(probs)
        gW, gb = self._forward_grad(x, label, qf)
        self.n_updates += 1
        self._gW_ema, cW = _ema_step(self._gW_ema, gW, momentum, self.n_updates)
        self._gb_ema, cb = _ema_step(self._gb_ema, gb, momentum, self.n_updates)
        norm = float(np.sqrt(np.sum(cW**2) + np.sum(cb**2)))
        if norm > max_grad_norm:
            cW = cW * (max_grad_norm / norm)
            cb = cb * (max_grad_norm / norm)
        lr = learning_rate / (1.0 + self.n_updates / decay_tau)
        self.W -= lr * cW
        self.b -= lr * cb
        self.W_avg = avg_decay * self.W_avg + (1.0 - avg_decay) * self.W
        self.b_avg = avg_decay * self.b_avg + (1.0 - avg_decay) * self.b

    def compute_upper_bounds(self, upper_bound_probs, query_features, use_averaged=False):
        """Fused probability upper bound per candidate (Thm 8.7.1)."""
        ub = clamp01(np.asarray(upper_bound_probs, dtype=np.float64))
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        if ub.ndim == 1:
            ub = ub.reshape(1, -1)
        w = self.compute_weights(qf, use_averaged)
        x = logit(ub)
        if self.normalize:
            x = self._normalize_logits(x)
        lw = (self.n_signals**self.alpha) * np.sum(w * x, axis=-1)
        if self._logit_br is not None:
            lw = lw + self._logit_br
        return np.atleast_1d(np.asarray(sigmoid(lw), dtype=np.float64))

    def prune(self, probs, query_features, threshold, upper_bound_probs=None, use_averaged=False):
        """Drop candidates whose fused upper bound < threshold; fuse survivors.

        In Spark this is a plain ``df.where(ub_col >= threshold)`` before
        the (expensive) fusion projection.
        """
        probs = np.asarray(probs, dtype=np.float64)
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        if probs.ndim == 1:
            probs = probs.reshape(1, -1)
        if upper_bound_probs is None:
            upper_bound_probs = probs
        ub = self.compute_upper_bounds(upper_bound_probs, qf, use_averaged)
        keep = np.where(ub >= threshold)[0]
        if len(keep) == 0:
            return keep, np.array([], dtype=np.float64)
        surv_qf = qf[keep] if qf.shape[0] > 1 else qf
        return keep, np.atleast_1d(self(probs[keep], surv_qf, use_averaged))


class MultiHeadAttentionLogOddsWeights:
    """H independent attention heads (seeds 0..H−1); fused output is the
    mean-logit of the head outputs (reference Remark 8.6)."""

    def __init__(
        self,
        n_signals,
        n_query_features,
        n_heads=2,
        alpha=0.5,
        normalize=False,
        base_rate=None,
    ):
        if n_heads < 1:
            raise ValueError(f"n_heads must be >= 1, got {n_heads}")
        self.n_heads = n_heads
        self.heads = [
            AttentionLogOddsWeights(
                n_signals,
                n_query_features,
                alpha=alpha,
                normalize=normalize,
                seed=h,
                base_rate=base_rate,
            )
            for h in range(n_heads)
        ]

    def __call__(self, probs, query_features, use_averaged=False):
        outs = [
            np.atleast_1d(np.asarray(h(probs, query_features, use_averaged), dtype=np.float64))
            for h in self.heads
        ]
        fused = sigmoid(np.mean([logit(o) for o in outs], axis=0))
        out = np.atleast_1d(np.asarray(fused, dtype=np.float64))
        return float(out[0]) if np.ndim(probs) == 1 else out

    def fit(self, probs, labels, query_features, **kw):
        for h in self.heads:
            h.fit(probs, labels, query_features, **kw)

    def update(self, probs, label, query_features, **kw):
        for h in self.heads:
            h.update(probs, label, query_features, **kw)

    def compute_upper_bounds(self, upper_bound_probs, query_features, use_averaged=False):
        outs = [
            h.compute_upper_bounds(upper_bound_probs, query_features, use_averaged)
            for h in self.heads
        ]
        return np.atleast_1d(
            np.asarray(sigmoid(np.mean([logit(o) for o in outs], axis=0)), dtype=np.float64)
        )

    def prune(self, probs, query_features, threshold, upper_bound_probs=None, use_averaged=False):
        probs = np.asarray(probs, dtype=np.float64)
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        if probs.ndim == 1:
            probs = probs.reshape(1, -1)
        if upper_bound_probs is None:
            upper_bound_probs = probs
        ub = self.compute_upper_bounds(upper_bound_probs, qf, use_averaged)
        keep = np.where(ub >= threshold)[0]
        if len(keep) == 0:
            return keep, np.array([], dtype=np.float64)
        surv_qf = qf[keep] if qf.shape[0] > 1 else qf
        return keep, np.atleast_1d(self(probs[keep], surv_qf, use_averaged))
