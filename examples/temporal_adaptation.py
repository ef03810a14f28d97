"""Adapting to changing user behavior over time
(Spark analog of reference examples/temporal_adaptation.py):
``TemporalTransformParams`` exponentially decays old observations
(weight exp(-ln2/half_life * age)) so the fitted sigmoid tracks
concept drift.  The state is two floats on the driver; at scale the
labeled (score, click, timestamp) stream comes from a DataFrame and
only the tiny fitted parameters move.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bayesian_bm25_spark.kernel.transform import (
    TemporalTransformParams,
    TransformParams,
    sigmoid,
)

PHASE1 = (1.5, 0.5)  # (alpha, beta) generating clicks in phase 1
PHASE2 = (3.0, 2.0)  # concept drift: phase 2 users are pickier
N = 200


def simulate(rng, n, alpha, beta):
    scores = rng.uniform(0.0, 3.5, size=n)
    labels = (rng.random(n) < sigmoid(alpha * (scores - beta))).astype(np.float64)
    return scores, labels


def main() -> None:
    rng = np.random.default_rng(42)
    s1, l1 = simulate(rng, N, *PHASE1)
    s2, l2 = simulate(rng, N, *PHASE2)
    scores = np.concatenate([s1, s2])
    labels = np.concatenate([l1, l2])
    timestamps = np.arange(2 * N, dtype=np.float64)

    print(f"Concept drift at t={N}: (alpha,beta) {PHASE1} -> {PHASE2}\n")

    # --- 1+2. Temporal vs uniform fit on the full drifted stream ------
    uniform = TransformParams()
    uniform.fit(scores, labels, learning_rate=0.05, max_iterations=3000)
    temporal = TemporalTransformParams(decay_half_life=50.0)
    temporal.fit(scores, labels, timestamps=timestamps,
                 learning_rate=0.05, max_iterations=3000)
    print(f"{'model':<22} {'alpha':>7} {'beta':>7}   (phase-2 truth: 3.0, 2.0)")
    print(f"{'uniform (no decay)':<22} {uniform.alpha:7.3f} {uniform.beta:7.3f}")
    print(f"{'temporal hl=50':<22} {temporal.alpha:7.3f} {temporal.beta:7.3f}")

    # --- 3. Half-life tuning: adaptation speed vs stability -----------
    print("\nHalf-life sweep (smaller = faster adaptation, noisier):")
    for hl in (10.0, 50.0, 200.0, 1000.0):
        t = TemporalTransformParams(decay_half_life=hl)
        t.fit(scores, labels, timestamps=timestamps,
              learning_rate=0.05, max_iterations=3000)
        print(f"  half_life={hl:7.1f} -> alpha={t.alpha:6.3f} beta={t.beta:6.3f}")

    # A phase-2 score of 1.5 sits below the new beta=2.0 midpoint; the
    # temporal model should score it below 0.5, the uniform one above.
    p_uni = float(uniform.likelihood(1.5))
    p_tmp = float(temporal.likelihood(1.5))
    print(f"\nLikelihood at score=1.5 after drift: uniform={p_uni:.3f}, "
          f"temporal={p_tmp:.3f} (truth {sigmoid(3.0 * (1.5 - 2.0)):.3f})")


if __name__ == "__main__":
    main()
