"""Explain/debug traces as nested struct columns.

The reference's FusionDebugger (debug.py:38-649) records every
intermediate of the probability pipeline per document.  In Spark the
trace is a nested ``struct`` column computed alongside the probability —
same codegen'd expressions, zero extra passes — and the human-readable
rendering runs driver-side over collected structs.

Trace shapes mirror the reference dataclasses:
- bm25 trace ..... BM25SignalTrace   (debug.py:38-63)
- vector trace ... VectorSignalTrace (debug.py:66-84)
- not trace ...... NotTrace          (debug.py:87-100)
- fusion trace ... FusionTrace       (debug.py:103-131, log_odds path)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.kernel.combine import resolve_alpha
from bayesian_bm25_spark.kernel.transform import TransformParams, logit as np_logit


def bm25_trace(
    score: Column,
    tf: Column,
    doc_len_ratio: Column,
    params: TransformParams,
) -> Column:
    """struct mirroring BM25SignalTrace — inputs, intermediates,
    logit-space values, posterior, and a parameter snapshot."""
    lik = C.likelihood(score, params.alpha, params.beta)
    tf_p = C.tf_prior(tf)
    norm_p = C.norm_prior(doc_len_ratio)
    comp_p = C.composite_prior(tf, doc_len_ratio)
    post = C.posterior(lik, comp_p, base_rate=params.base_rate)
    logit_br = (
        F.lit(float(np_logit(params.base_rate))) if params.base_rate is not None
        else F.lit(None).cast("double")
    )
    return F.struct(
        score.alias("raw_score"),
        tf.cast("double").alias("tf"),
        doc_len_ratio.cast("double").alias("doc_len_ratio"),
        lik.alias("likelihood"),
        tf_p.alias("tf_prior"),
        norm_p.alias("norm_prior"),
        comp_p.alias("composite_prior"),
        C.logit(lik).alias("logit_likelihood"),
        C.logit(comp_p).alias("logit_prior"),
        logit_br.alias("logit_base_rate"),
        post.alias("posterior"),
        F.lit(params.alpha).alias("alpha"),
        F.lit(params.beta).alias("beta"),
        F.lit(params.base_rate).cast("double").alias("base_rate"),
    )


def vector_trace(cosine: Column) -> Column:
    """struct mirroring VectorSignalTrace ((1+cos)/2 path)."""
    prob = C.cosine_to_probability(cosine)
    return F.struct(
        cosine.cast("double").alias("cosine_score"),
        prob.alias("probability"),
        C.logit(prob).alias("logit_probability"),
    )


def not_trace(prob: Column, name: str = "signal") -> Column:
    """struct mirroring NotTrace: complement + logit sign flip."""
    comp = C.prob_not(prob)
    return F.struct(
        prob.cast("double").alias("input_probability"),
        F.lit(name).alias("input_name"),
        comp.alias("complement"),
        C.logit(prob).alias("logit_input"),
        C.logit(comp).alias("logit_complement"),
    )


def fusion_trace(
    probs: Column,
    signal_names: list[str],
    alpha: float | str | None = None,
    weights: list[float] | None = None,
    gating: str = "none",
    gating_beta: float = 1.0,
) -> Column:
    """struct mirroring FusionTrace for the log_odds method: per-signal
    logits, mean logit, n^α scale, scaled logit, fused probability."""
    logits = F.transform(probs, lambda p: C.gate(C.logit(p), gating, gating_beta))
    n = F.size(probs).cast("double")
    if weights is not None:
        a = resolve_alpha(alpha, default=0.0)
        w_col = F.array(*[F.lit(float(x)) for x in weights])
        combined = F.aggregate(
            F.zip_with(logits, w_col, lambda x, wi: wi * x), F.lit(0.0), lambda acc, v: acc + v
        )
        mean_logit = F.lit(None).cast("double")
    else:
        a = resolve_alpha(alpha, default=0.5)
        combined = (
            F.aggregate(logits, F.lit(0.0), lambda acc, v: acc + v) / n
        )
        mean_logit = combined
    scale = F.pow(n, F.lit(a))
    scaled = combined * scale
    fused = C.sigmoid(scaled)
    return F.struct(
        probs.alias("signal_probabilities"),
        F.array(*[F.lit(s) for s in signal_names]).alias("signal_names"),
        F.lit("log_odds").alias("method"),
        logits.alias("logits"),
        mean_logit.alias("mean_logit"),
        F.lit(a).alias("alpha"),
        scale.alias("n_alpha_scale"),
        scaled.alias("scaled_logit"),
        (
            F.array(*[F.lit(float(x)) for x in weights])
            if weights is not None
            else F.lit(None).cast("array<double>")
        ).alias("weights"),
        fused.alias("fused_probability"),
        F.lit(gating).alias("gating"),
        F.lit(float(gating_beta)).alias("gating_beta"),
    )


def retrieve_with_explanations(
    scored_topk: DataFrame,
    params: TransformParams,
    avgdl: float,
) -> DataFrame:
    """Top-k frame + ``trace`` struct column — the analog of
    ``retrieve(explain=True)`` (reference scorer.py:536-562); scores ≤ 0
    yield a NULL trace as the reference yields None."""
    ratio = F.col("doc_len").cast("double") / F.lit(float(avgdl))
    trace = bm25_trace(F.col("score"), F.col("tf_match").cast("double"), ratio, params)
    return scored_topk.withColumn(
        "trace", F.when(F.col("score") > 0.0, trace)
    )


def format_bm25_trace(row: dict) -> str:
    """Driver-side human-readable rendering of a collected bm25 trace."""
    lines = [
        "BM25SignalTrace",
        f"  raw_score        : {row['raw_score']:.6f}",
        f"  tf / dl_ratio    : {row['tf']:.1f} / {row['doc_len_ratio']:.4f}",
        f"  likelihood       : {row['likelihood']:.6f}",
        f"  priors tf/norm/c : {row['tf_prior']:.4f} / {row['norm_prior']:.4f} / {row['composite_prior']:.4f}",
        f"  logits L/prior/br: {row['logit_likelihood']:.4f} / {row['logit_prior']:.4f} / {row['logit_base_rate']}",
        f"  posterior        : {row['posterior']:.6f}",
        f"  params α/β/br    : {row['alpha']:.4f} / {row['beta']:.4f} / {row['base_rate']}",
    ]
    return "\n".join(lines)


def compare_documents(
    traced: DataFrame, query_id: int, doc_a: int, doc_b: int
) -> dict:
    """Two-doc comparison: per-signal deltas + dominant signal (the
    reference's ComparisonResult, debug.py:532-649) over a traced frame
    with probability column."""
    rows = {
        int(r["doc_id"]): r
        for r in traced.where(
            (F.col("query_id") == query_id) & F.col("doc_id").isin([doc_a, doc_b])
        ).collect()
    }
    a, b = rows[doc_a], rows[doc_b]
    ta = a["trace"].asDict() if a["trace"] else None
    tb = b["trace"].asDict() if b["trace"] else None
    prob_a = float(a["probability"]) if "probability" in a.__fields__ else (
        float(ta["posterior"]) if ta else 0.0
    )
    prob_b = float(b["probability"]) if "probability" in b.__fields__ else (
        float(tb["posterior"]) if tb else 0.0
    )
    deltas = {}
    if ta and tb:
        for k in ("likelihood", "composite_prior", "posterior"):
            deltas[k] = float(ta[k]) - float(tb[k])
        dominant = max(deltas, key=lambda k: abs(deltas[k]))
    else:
        dominant = "missing_signal"
    # crossover: a non-dominant signal that favors the opposite document
    # (reference debug.py:616-629)
    fused_delta = prob_a - prob_b
    crossover = None
    for name, delta in deltas.items():
        if name == dominant:
            continue
        if fused_delta != 0.0 and delta != 0.0 and (fused_delta > 0) != (delta > 0):
            crossover = name
            break
    return {
        "doc_a": doc_a,
        "doc_b": doc_b,
        "prob_a": prob_a,
        "prob_b": prob_b,
        "signal_values": {
            k: (float(ta[k]) if ta else 0.5, float(tb[k]) if tb else 0.5)
            for k in deltas
        },
        "signal_deltas": deltas,
        "dominant_signal": dominant,
        "crossover_stage": crossover,
    }


def format_summary(
    doc_id, signals: dict[str, float], fused: float,
    method: str = "log_odds", alpha: float | None = None,
) -> str:
    """Compact one-line summary — reference debug.py:753-771 layout:
    ``<doc>: BM25=0.812 Vec=0.633 -> Fused=0.742 (log_odds, alpha=0.5)``."""
    parts = " ".join(f"{name}={p:.3f}" for name, p in signals.items())
    alpha_str = f", alpha={alpha}" if alpha is not None else ""
    return f"{doc_id}: {parts} -> Fused={fused:.3f} ({method}{alpha_str})"


def format_comparison(comparison: dict) -> str:
    """Human-readable two-document comparison — reference
    debug.py:773-841 layout (signal table, rank order, dominant signal,
    crossover note) over a ``compare_documents`` result."""
    a_label, b_label = comparison["doc_a"], comparison["doc_b"]
    lines = [f"Comparison: {a_label} vs {b_label}"]
    lines.append(
        f"  {'Signal':<16} {str(a_label):>8}  {str(b_label):>8}  {'delta':>8}   dominant"
    )
    for name, delta in comparison["signal_deltas"].items():
        va, vb = comparison["signal_values"][name]
        marker = "   <-- largest" if name == comparison["dominant_signal"] else ""
        lines.append(f"  {name:<16} {va:>8.3f}  {vb:>8.3f}  {delta:>+8.3f}{marker}")
    fused_delta = comparison["prob_a"] - comparison["prob_b"]
    lines.append(
        f"  {'Fused':<16} {comparison['prob_a']:>8.3f}  {comparison['prob_b']:>8.3f}"
        f"  {fused_delta:>+8.3f}"
    )
    lines.append("")
    if fused_delta > 0:
        lines.append(f"  Rank order: {a_label} > {b_label} (by {fused_delta:+.3f})")
    elif fused_delta < 0:
        lines.append(f"  Rank order: {b_label} > {a_label} (by +{abs(fused_delta):.3f})")
    else:
        lines.append("  Rank order: tied")
    dom = comparison["dominant_signal"]
    if dom in comparison["signal_deltas"]:
        dom_delta = comparison["signal_deltas"][dom]
        favored = a_label if dom_delta >= 0 else b_label
        lines.append(f"  Dominant signal: {dom} ({dom_delta:+.3f} in {favored}'s favor)")
    if comparison.get("crossover_stage"):
        cross = comparison["crossover_stage"]
        cross_delta = comparison["signal_deltas"][cross]
        cross_favored = a_label if cross_delta >= 0 else b_label
        lines.append(
            f"  Note: {cross} favored {cross_favored}, but {dom} signal outweighed it"
        )
    return "\n".join(lines)
