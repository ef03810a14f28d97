"""Multi-head attention fusion with pruning
(Spark analog of reference examples/multi_head_fusion.py):
``MultiHeadAttentionLogOddsWeights`` learns several independent
query-conditioned weighting patterns and averages their log-odds.
Training is driver-side (the state is a few small matrices); the
``dense_kappa``/``multihead_fusion`` entry queries show the same math
applied to DataFrames via broadcast parameters.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bayesian_bm25_spark.kernel.combine import (
    AttentionLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
)
from bayesian_bm25_spark.kernel.transform import sigmoid


def log_loss(p, y):
    p = np.clip(p, 1e-9, 1 - 1e-9)
    return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())


def main() -> None:
    rng = np.random.default_rng(42)
    n, n_qf, n_sig = 300, 2, 2
    labels = rng.integers(0, 2, size=n).astype(np.float64)
    qf = rng.standard_normal((n, n_qf))
    reliable = np.asarray(sigmoid(np.where(labels == 1, 2.0, -2.0) + rng.standard_normal(n) * 0.5))
    noisy = np.asarray(sigmoid(np.where(labels == 1, 1.0, -1.0) + rng.standard_normal(n) * 2.0))
    probs = np.column_stack([reliable, noisy])
    tr, te = slice(0, 200), slice(200, n)

    # --- 1. Multi-head vs single-head quality -------------------------
    single = AttentionLogOddsWeights(n_signals=n_sig, n_query_features=n_qf)
    single.fit(probs[tr], labels[tr], qf[tr], learning_rate=0.05, max_iterations=400)
    multi = MultiHeadAttentionLogOddsWeights(
        n_signals=n_sig, n_query_features=n_qf, n_heads=4
    )
    multi.fit(probs[tr], labels[tr], qf[tr], learning_rate=0.05, max_iterations=400)

    p_single = single(probs[te], qf[te])
    p_multi = multi(probs[te], qf[te])
    print("Held-out log-loss:")
    print(f"  single-head: {log_loss(p_single, labels[te]):.4f}")
    print(f"  multi-head:  {log_loss(p_multi, labels[te]):.4f}")

    # --- 2. Attention pruning for efficient re-ranking ----------------
    # Upper-bound probabilities per signal let prune() discard candidates
    # whose fused probability cannot reach the threshold.
    ub = np.minimum(probs[te] + 0.05, 1.0)
    threshold = 0.6
    keep_idx, keep_probs = multi.prune(
        probs[te], qf[te], threshold, upper_bound_probs=ub
    )
    exact = p_multi >= threshold
    print(f"\nPruning at threshold {threshold}: kept {len(keep_idx)}/{len(p_multi)} "
          f"candidates ({int(exact.sum())} truly above threshold)")
    assert set(np.nonzero(exact)[0]).issubset(set(keep_idx)), "prune must be safe"
    print("Safety check passed: no above-threshold candidate was pruned.")

    # --- 3. Head diversity --------------------------------------------
    print("\nPer-head attention weights for one query (heads learn "
          "different patterns):")
    one_qf = qf[te][:1]
    for h, head in enumerate(multi.heads):
        w = head.compute_weights(one_qf)[0]
        print(f"  head {h}: {np.round(w, 4)}")


if __name__ == "__main__":
    main()
