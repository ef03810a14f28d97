"""Live ranking: watch rankings shift as feedback updates the model
(Spark analog of reference examples/live_ranking.py):
a news-search scenario where editorial clicks steepen the sigmoid via
``TransformParams.update`` (O(1) driver-side state), and documents
whose BM25 score and composite prior disagree swap ranks.  The
re-ranking itself is one vectorized ``score_to_probability`` call.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bayesian_bm25_spark.kernel.transform import TransformParams

DOCS = [
    # (id, title, bm25, tf, doc_len_ratio)
    ("D01", "EU AI Act: Full Text", 9.2, 8, 0.5),
    ("D06", "AI Regulation: US vs EU", 8.5, 7, 0.6),
    ("D02", "AI Law Overview (Long Report)", 7.3, 1, 2.5),   # weak prior
    ("D09", "Regulatory Compliance for AI", 6.5, 9, 0.5),    # strong prior
    ("D03", "AI Governance Brief", 5.8, 1, 0.1),             # weak prior
    ("D10", "Global AI Policy Landscape 2026", 4.9, 8, 0.5), # strong prior
    ("D04", "Machine Learning Basics", 3.1, 2, 1.0),
    ("D05", "Tech News Roundup", 1.8, 1, 1.2),
]


def rank(params: TransformParams):
    scores = np.array([d[2] for d in DOCS])
    tfs = np.array([d[3] for d in DOCS], dtype=float)
    dlrs = np.array([d[4] for d in DOCS])
    probs = params.score_to_probability(scores, tfs, dlrs)
    order = np.argsort(-probs)
    return [(DOCS[i][0], DOCS[i][1], float(probs[i])) for i in order]


def show(title, ranking):
    print(title)
    for pos, (did, name, p) in enumerate(ranking, 1):
        print(f"  {pos}. [{did}] P={p:.4f}  {name}")
    print()


def main() -> None:
    rng = np.random.default_rng(42)
    # Nearly-flat sigmoid: the composite prior dominates initially.
    params = TransformParams(alpha=0.2, beta=4.0)
    before = rank(params)
    show("Initial ranking (flat sigmoid, prior-dominated):", before)

    # Editors click docs whose BM25 score is genuinely high (>6), skip
    # the rest — feedback that score should matter more than the prior.
    for _ in range(300):
        d = DOCS[rng.integers(0, len(DOCS))]
        label = 1.0 if d[2] > 6.0 else 0.0
        params.update(d[2], label, learning_rate=0.05)

    after = rank(params)
    show(f"After 300 feedback events (alpha={params.alpha:.2f}, "
         f"beta={params.beta:.2f}) — BM25 signal overtakes the prior:", after)

    moved = sum(1 for a, b in zip(before, after) if a[0] != b[0])
    print(f"Positions changed: {moved}/{len(DOCS)}")


if __name__ == "__main__":
    main()
