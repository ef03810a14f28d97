"""Numpy BM25 oracle: impact math, in-memory index, parameter estimation.

The reference delegates raw BM25 to the external ``bm25s`` package
(reference scorer.py:20-26, not available here), configured with variants
"robertson" | "lucene" | "atire" (reference scorer.py:174-177).  This
module implements the published formulas (BM25S paper / Lucene docs)
directly and serves as the *oracle* the Spark engine must be
rank-identical to.  The same ``impact`` function runs inside the Spark
index build (as a Column expression mirroring ``impact_expr``).

With N docs, df = term doc-frequency, tf = in-doc term count, dl = doc
length:

    tf-part  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    robertson: idf = ln((N − df + 0.5)/(df + 0.5))
    lucene:    idf = ln(1 + (N − df + 0.5)/(df + 0.5))
    atire:     idf = ln(N/df)
    impact(t, d) = idf(t) · tf-part(t, d)

Impacts are precomputed eagerly at index time ("impact scores"); query
scoring is a sparse sum over the query's terms — duplicated query tokens
contribute once per occurrence.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

VALID_METHODS = ("robertson", "lucene", "atire")
VALID_BASE_RATE_METHODS = ("percentile", "mixture", "elbow")


def idf(df, n_docs, method="lucene"):
    """Inverse document frequency for the given BM25 variant (vectorized)."""
    df = np.asarray(df, dtype=np.float64)
    if method == "robertson":
        return np.log((n_docs - df + 0.5) / (df + 0.5))
    if method == "lucene":
        return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    if method == "atire":
        return np.log(n_docs / df)
    raise ValueError(f"method must be one of {VALID_METHODS}, got {method!r}")


def tf_part(tf, doc_len, avgdl, k1=1.2, b=0.75):
    """BM25 term-frequency saturation with length normalization."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def impact(tf, doc_len, df, n_docs, avgdl, k1=1.2, b=0.75, method="lucene"):
    """Eager per-(term, doc) impact score: idf · tf-part."""
    return idf(df, n_docs, method) * tf_part(tf, doc_len, avgdl, k1, b)


def tokenize(text: str) -> list[str]:
    """The engine's tokenizer contract: ``text.lower().split()``
    (whitespace split, empties dropped) — byte-identical per url to the
    reference loader (reference benchmarks/utils.py:43)."""
    return text.lower().split()


class BM25Oracle:
    """Single-process inverted index over a token corpus.

    This is the pytest oracle for the Spark engine: same impact math, same
    deterministic tie-break (score desc, doc_id asc) for top-k.  It is
    intentionally simple — numpy + dicts — and only ever sees test-sized
    corpora.
    """

    def __init__(self, k1=1.2, b=0.75, method="lucene"):
        if method not in VALID_METHODS:
            raise ValueError(f"method must be one of {VALID_METHODS}, got {method!r}")
        self.k1 = k1
        self.b = b
        self.method = method
        self.n_docs = 0
        self.avgdl = 0.0
        self.doc_lengths = np.zeros(0, dtype=np.float64)
        # term -> {doc_id: impact}
        self._impacts: dict[str, dict[int, float]] = {}
        # term -> df
        self.df: dict[str, int] = {}

    def index(self, corpus_tokens: list[list[str]]) -> None:
        self.n_docs = len(corpus_tokens)
        self.doc_lengths = np.array([len(d) for d in corpus_tokens], dtype=np.float64)
        self.avgdl = float(np.mean(self.doc_lengths)) if self.n_docs else 0.0
        tf_maps = [Counter(doc) for doc in corpus_tokens]
        self.df = Counter()
        for tf_map in tf_maps:
            self.df.update(tf_map.keys())
        self._impacts = {}
        for doc_id, tf_map in enumerate(tf_maps):
            dl = self.doc_lengths[doc_id]
            for term, tf in tf_map.items():
                self._impacts.setdefault(term, {})[doc_id] = float(
                    impact(tf, dl, self.df[term], self.n_docs, self.avgdl,
                           self.k1, self.b, self.method)
                )

    def get_scores(self, query_tokens: list[str]) -> np.ndarray:
        """Dense score vector over all docs; duplicate query tokens add."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        for term in query_tokens:
            for doc_id, imp in self._impacts.get(term, {}).items():
                scores[doc_id] += imp
        return scores

    def retrieve(self, queries: list[list[str]], k=10):
        """Top-k per query with pinned tie-break (score desc, doc_id asc).

        Returns (doc_ids, scores) arrays of shape (n_queries, k); ranks
        past the number of scoreable docs are filled with (-1, 0.0).
        """
        nq = len(queries)
        doc_ids = np.full((nq, k), -1, dtype=np.int64)
        scores = np.zeros((nq, k), dtype=np.float64)
        for qi, q in enumerate(queries):
            s = self.get_scores(q)
            order = np.lexsort((np.arange(self.n_docs), -s))[:k]
            doc_ids[qi, : len(order)] = order
            scores[qi, : len(order)] = s[order]
        return doc_ids, scores

    def term_upper_bounds(self) -> dict[str, float]:
        """Per-term max impact — the WAND bound input."""
        return {t: max(m.values()) for t, m in self._impacts.items()}


def sample_pseudo_query_scores(oracle: BM25Oracle, corpus_tokens, seed=42, sample_size=50):
    """Seeded pseudo-query sampling for parameter estimation.

    Mirrors the reference protocol exactly (reference scorer.py:287-311):
    ``default_rng(seed).choice(n, min(n, 50), replace=False)``; each
    sampled doc's first 5 tokens form a query; keep per-query nonzero
    score arrays.  Runs on the driver so the numpy RNG stream is
    reproduced bit-for-bit — never inside executors.
    """
    n = len(corpus_tokens)
    rng = np.random.default_rng(seed)
    idxs = rng.choice(n, size=min(n, sample_size), replace=False)
    out = []
    for idx in idxs:
        toks = corpus_tokens[idx]
        if not toks:
            continue
        s = oracle.get_scores(toks[:5])
        nz = s[s > 0]
        if len(nz) > 0:
            out.append(nz)
    return out


def estimate_alpha_beta(per_query_scores, user_alpha=None, user_beta=None):
    """β = median(scores), α = 1/std(scores) (std>0 else 1.0); user wins.

    (reference scorer.py:313-337 — exact median on the pooled sample,
    not an approximate percentile.)
    """
    if user_alpha is not None and user_beta is not None:
        return user_alpha, user_beta
    if not per_query_scores:
        return (user_alpha or 1.0, user_beta or 0.0)
    pooled = np.concatenate(per_query_scores)
    est_beta = float(np.median(pooled))
    std = float(np.std(pooled))
    est_alpha = 1.0 / std if std > 0 else 1.0
    return (
        user_alpha if user_alpha is not None else est_alpha,
        user_beta if user_beta is not None else est_beta,
    )


def estimate_base_rate(per_query_scores, n_docs, method="percentile"):
    """Dispatch to percentile / mixture / elbow; clamp to [1e-6, 0.5]."""
    if method not in VALID_BASE_RATE_METHODS:
        raise ValueError(
            f"base_rate_method must be one of {VALID_BASE_RATE_METHODS}, got {method!r}"
        )
    if not per_query_scores:
        return 1e-6
    if method == "percentile":
        return _base_rate_percentile(per_query_scores, n_docs)
    if method == "mixture":
        return _base_rate_mixture(per_query_scores)
    return _base_rate_elbow(per_query_scores)


def _base_rate_percentile(per_query_scores, n_docs):
    """Mean over queries of frac(scores ≥ per-query 95th pct) / n_docs."""
    ratios = []
    for s in per_query_scores:
        thr = float(np.percentile(s, 95))
        ratios.append(int(np.sum(s >= thr)) / n_docs)
    return float(np.clip(float(np.mean(ratios)), 1e-6, 0.5))


def _base_rate_mixture(per_query_scores):
    """2-component Gaussian EM (20 iters, median-split init, log-sum-exp
    E-step); base rate = mixing weight of the higher-mean component."""
    x = np.concatenate(per_query_scores)
    if len(x) < 2:
        return 1e-6
    med = float(np.median(x))
    lo = x <= med
    hi = ~lo
    mu0 = float(np.mean(x[lo])) if np.any(lo) else med - 1.0
    mu1 = float(np.mean(x[hi])) if np.any(hi) else med + 1.0
    v0 = max(float(np.var(x[lo])) if np.any(lo) else 1.0, 1e-8)
    v1 = max(float(np.var(x[hi])) if np.any(hi) else 1.0, 1e-8)
    pi1 = 0.5
    for _ in range(20):
        s0, s1 = np.sqrt(v0), np.sqrt(v1)
        lp0 = -0.5 * ((x - mu0) / s0) ** 2 - np.log(s0)
        lp1 = -0.5 * ((x - mu1) / s1) ** 2 - np.log(s1)
        lw0 = np.log(max(1.0 - pi1, 1e-10)) + lp0
        lw1 = np.log(max(pi1, 1e-10)) + lp1
        gamma = np.exp(lw1 - np.logaddexp(lw0, lw1))
        n1 = float(np.sum(gamma))
        n0 = float(np.sum(1.0 - gamma))
        if n0 < 1e-8 or n1 < 1e-8:
            break
        mu0 = float(np.sum((1.0 - gamma) * x) / n0)
        mu1 = float(np.sum(gamma * x) / n1)
        v0 = max(float(np.sum((1.0 - gamma) * (x - mu0) ** 2) / n0), 1e-8)
        v1 = max(float(np.sum(gamma * (x - mu1) ** 2) / n1), 1e-8)
        pi1 = n1 / len(x)
    rate = pi1 if mu1 >= mu0 else 1.0 - pi1
    return float(np.clip(rate, 1e-6, 0.5))


def _base_rate_elbow(per_query_scores):
    """Knee of the descending sorted score curve: max perpendicular
    distance to the first–last chord; rate = max(1, knee)/n."""
    y = np.sort(np.concatenate(per_query_scores))[::-1]
    n = len(y)
    if n < 3:
        return 1e-6
    x = np.arange(n, dtype=np.float64)
    dx = float(n - 1)
    dy = float(y[-1] - y[0])
    chord = np.sqrt(dx * dx + dy * dy)
    if chord < 1e-12:
        return 1e-6
    dist = np.abs(dy * x - dx * (y - y[0])) / chord
    knee = int(np.argmax(dist))
    return float(np.clip(max(1, knee) / n, 1e-6, 0.5))


def block_maxes(score_matrix: np.ndarray, block_size: int = 128) -> np.ndarray:
    """Per-(term, block) max over a (n_terms, n_docs) impact matrix.

    Block-max index for BMW-style pruning (reference scorer.py:55-81);
    the Spark analog is ``groupBy(term, floor(local_rank/bs)).max(impact)``.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    m = np.asarray(score_matrix, dtype=np.float64)
    if m.ndim != 2:
        raise ValueError(f"score_matrix must be 2D (n_terms, n_docs), got {m.ndim}D")
    n_terms, n_docs = m.shape
    n_blocks = (n_docs + block_size - 1) // block_size
    out = np.empty((n_terms, n_blocks), dtype=np.float64)
    for blk in range(n_blocks):
        out[:, blk] = np.max(m[:, blk * block_size : min((blk + 1) * block_size, n_docs)], axis=1)
    return out
