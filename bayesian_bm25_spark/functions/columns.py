"""Spark Column builders mirroring the numpy kernel bit-for-bit in IEEE
float64.

Everything here compiles to Catalyst expressions (whole-stage codegen,
JVM-side) — the probability/fusion hot path never drops into Python.
Pandas UDFs are reserved for genuinely iterative math (PAVA interpolation,
per-query EM/KDE) elsewhere.

Mirrors (same formulas, same clamps, same constants):
- clamp/sigmoid/logit .......... kernel.transform (reference probability.py:20-48)
- likelihood/priors/posterior .. kernel.transform (reference probability.py:106-169)
- cosine→prob, NOT/AND/OR ...... kernel.combine   (reference fusion.py:25-100)
- gating + log-odds conjunction  kernel.combine   (reference fusion.py:119-280)
- BM25 idf/tf-part/impact ...... kernel.bm25      (BM25S paper / Lucene docs)
- Platt calibrate .............. kernel.calibrate (reference calibration.py:92-109)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-10


def _lit(x) -> Column:
    return x if isinstance(x, Column) else F.lit(float(x))


def clamp01(p: Column) -> Column:
    """Clamp into [EPS, 1-EPS]."""
    return F.least(F.greatest(p, F.lit(EPS)), F.lit(1.0 - EPS))


def sigmoid(x: Column) -> Column:
    """Split-form sigmoid: x>=0 → 1/(1+e^-x); else e^x/(1+e^x)."""
    x = _lit(x)
    return F.when(x >= 0.0, 1.0 / (1.0 + F.exp(-x))).otherwise(F.exp(x) / (1.0 + F.exp(x)))


def logit(p: Column) -> Column:
    p = clamp01(_lit(p))
    return F.log(p / (1.0 - p))


def likelihood(score: Column, alpha: float, beta: float) -> Column:
    """σ(α·(score − β)) with α, β broadcast as literals."""
    return sigmoid(_lit(alpha) * (_lit(score) - _lit(beta)))


def tf_prior(tf: Column) -> Column:
    return 0.2 + 0.7 * F.least(F.lit(1.0), _lit(tf) / 10.0)


def norm_prior(doc_len_ratio: Column) -> Column:
    r = _lit(doc_len_ratio)
    return 0.3 + 0.6 * (1.0 - F.least(F.lit(1.0), F.abs(r - 0.5) * 2.0))


def composite_prior(tf: Column, doc_len_ratio: Column) -> Column:
    raw = 0.7 * tf_prior(tf) + 0.3 * norm_prior(doc_len_ratio)
    return F.least(F.greatest(raw, F.lit(0.1)), F.lit(0.9))


def posterior(likelihood_col: Column, prior: Column, base_rate: float | None = None) -> Column:
    """Two-step Bayes update in product form (kept for bit parity with the
    kernel — NOT rewritten to the logit form)."""
    lv, pr = _lit(likelihood_col), _lit(prior)
    num = lv * pr
    out = clamp01(num / (num + (1.0 - lv) * (1.0 - pr)))
    if base_rate is not None:
        br = float(base_rate)
        num2 = out * br
        out = clamp01(num2 / (num2 + (1.0 - out) * (1.0 - br)))
    return out


def score_to_probability(
    score: Column,
    tf: Column,
    doc_len_ratio: Column,
    *,
    alpha: float,
    beta: float,
    base_rate: float | None = None,
    mode: str = "balanced",
    prior: Column | None = None,
) -> Column:
    """Full transform as one codegen'd expression tree.

    ``prior`` (a user-supplied Column) plays the role of the reference's
    ``prior_fn`` escape hatch; ``mode="prior_free"`` pins the prior at 0.5.
    """
    lv = likelihood(score, alpha, beta)
    if mode == "prior_free":
        pr = F.lit(0.5)
    elif prior is not None:
        pr = clamp01(prior)
    else:
        pr = composite_prior(tf, doc_len_ratio)
    return posterior(lv, pr, base_rate=base_rate)


def wand_upper_bound(
    bm25_upper_bound: Column, *, alpha: float, beta: float,
    base_rate: float | None = None, p_max: float = 0.9,
) -> Column:
    """Safe per-term probability bound for WAND pruning."""
    return posterior(likelihood(bm25_upper_bound, alpha, beta), F.lit(p_max), base_rate=base_rate)


# -- fusion -------------------------------------------------------------


def cosine_to_probability(score: Column) -> Column:
    return clamp01((1.0 + _lit(score)) / 2.0)


def prob_not(prob: Column) -> Column:
    return clamp01(1.0 - clamp01(_lit(prob)))


def prob_and(probs: Column) -> Column:
    """exp(Σ ln clamp(p_i)) over an array<double> column."""
    log_sum = F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc + F.log(clamp01(p))
    )
    return F.exp(log_sum)


def prob_or(probs: Column) -> Column:
    """1 − exp(Σ ln(1 − clamp(p_i))) over an array<double> column."""
    log_sum = F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc + F.log(1.0 - clamp01(p))
    )
    return 1.0 - F.exp(log_sum)


def gate(x: Column, gating: str = "none", beta: float = 1.0) -> Column:
    """Sparse-signal gating on a logit column."""
    if gating == "none":
        return x
    if gating == "relu":
        return F.greatest(F.lit(0.0), x)
    if gating == "swish":
        return x * sigmoid(_lit(beta) * x)
    if gating == "gelu":
        return x * sigmoid(F.lit(1.702) * x)
    if gating == "softplus":
        # logaddexp(0, βx)/β, overflow-safe: max(0,βx) + log1p(exp(−|βx|))
        bx = _lit(beta) * x
        return (F.greatest(F.lit(0.0), bx) + F.log1p(F.exp(-F.abs(bx)))) / _lit(beta)
    raise ValueError(f"unknown gating {gating!r}")


def log_odds_conjunction(
    probs: Column,
    alpha: float | str | None = None,
    weights: list[float] | None = None,
    gating: str = "none",
    gating_beta: float = 1.0,
    max_logit: float | None = None,
) -> Column:
    """σ(n^α · agg(logit p_i)) over an array<double> column.

    Unweighted: mean logit, default α=0.5.  Weighted Log-OP: Σ w_i·logit,
    default α=0 (weights validated on the driver, broadcast as literals).
    """
    from bayesian_bm25_spark.kernel.combine import resolve_alpha

    def one(p: Column) -> Column:
        g = gate(logit(p), gating, gating_beta)
        if max_logit is not None:
            g = F.least(F.greatest(g, F.lit(-max_logit)), F.lit(float(max_logit)))
        return g

    n = F.size(probs)
    if weights is not None:
        import numpy as np

        w = np.asarray(weights, dtype=np.float64)
        if np.any(w < 0):
            raise ValueError("weights must be non-negative")
        if abs(float(np.sum(w)) - 1.0) > 1e-6:
            raise ValueError(f"weights must sum to 1, got {float(np.sum(w))}")
        a = resolve_alpha(alpha, default=0.0)
        w_col = F.array(*[F.lit(float(x)) for x in w])
        s = F.aggregate(
            F.zip_with(probs, w_col, lambda p, wi: wi * one(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return sigmoid(F.pow(n.cast("double"), F.lit(a)) * s)
    a = resolve_alpha(alpha, default=0.5)
    s = F.aggregate(F.transform(probs, one), F.lit(0.0), lambda acc, v: acc + v)
    mean = s / n.cast("double")
    return sigmoid(mean * F.pow(n.cast("double"), F.lit(a)))


def platt(score: Column, a: float, b: float) -> Column:
    """σ(a·score + b) — Platt calibration with driver-fit (a, b)."""
    return sigmoid(_lit(a) * _lit(score) + _lit(b))


# -- BM25 ----------------------------------------------------------------


def bm25_idf(df: Column, n_docs: Column | int, method: str = "lucene") -> Column:
    """IDF for "robertson" | "lucene" | "atire" (see kernel.bm25)."""
    df = _lit(df).cast("double")
    n = _lit(n_docs).cast("double") if not isinstance(n_docs, Column) else n_docs.cast("double")
    if method == "robertson":
        return F.log((n - df + 0.5) / (df + 0.5))
    if method == "lucene":
        return F.log(1.0 + (n - df + 0.5) / (df + 0.5))
    if method == "atire":
        return F.log(n / df)
    raise ValueError(f"method must be robertson|lucene|atire, got {method!r}")


def bm25_tf_part(
    tf: Column, doc_len: Column, avgdl: Column | float, k1: float = 1.2, b: float = 0.75
) -> Column:
    tf = _lit(tf).cast("double")
    dl = _lit(doc_len).cast("double")
    avg = _lit(avgdl)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avg))


def bm25_impact(
    tf: Column,
    doc_len: Column,
    df: Column,
    n_docs: Column | int,
    avgdl: Column | float,
    k1: float = 1.2,
    b: float = 0.75,
    method: str = "lucene",
) -> Column:
    """Eager per-(term, doc) impact — computed once at index-build time;
    queries only ever sum this column."""
    return bm25_idf(df, n_docs, method) * bm25_tf_part(tf, doc_len, avgdl, k1, b)


# -- dense vectors -------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) with 0 for zero-norm inputs."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0.0, dot(a, b) / denom).otherwise(F.lit(0.0))


def tokenize(text: Column) -> Column:
    """The tokenizer contract: lower + whitespace split, empties dropped.

    Byte-identical per url to kernel.bm25.tokenize for ASCII text (the
    synthetic corpus and fixtures).  The parity claim is ASCII-scoped:
    JVM ``lower``/Java ``\\s`` and Python ``str.lower``/``str.split``
    disagree on some Unicode whitespace (NBSP, \\x1c-\\x1f) and locale
    casing — non-ASCII corpora should normalize upstream (NFC + explicit
    whitespace class) before relying on cross-engine identity."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)
