"""Kernel parity: fusion math vs the paper golden table and the reference
numpy implementation."""

from __future__ import annotations

import numpy as np
import pytest

from bayesian_bm25_spark.kernel import (
    AttentionLogOddsWeights,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
    apply_gating,
    balanced_log_odds_fusion,
    cosine_to_probability,
    log_odds_conjunction,
    min_max_normalize,
    prob_and,
    prob_not,
    prob_or,
    resolve_alpha,
)


class TestFusionGoldens:
    # Paper Section 4.5 golden table (reference
    # tests/test_paper_theorems.py:389-432)
    GOLDEN = [
        ((0.9, 0.9), 0.81, 0.96),
        ((0.7, 0.7), 0.49, 0.77),
        ((0.7, 0.3), 0.21, 0.50),
        ((0.3, 0.3), 0.09, 0.23),
    ]

    def test_golden_table(self):
        for (p1, p2), expect_and, expect_conj in self.GOLDEN:
            pair = np.array([p1, p2])
            assert prob_and(pair) == pytest.approx(expect_and, abs=5e-3)
            assert log_odds_conjunction(pair) == pytest.approx(expect_conj, abs=5e-3)

    def test_070_030_is_exactly_half(self):
        # symmetric evidence cancels: mean logit = 0 → σ(0) = 0.5
        assert log_odds_conjunction(np.array([0.7, 0.3])) == pytest.approx(0.5, abs=1e-9)

    def test_not_involution_and_de_morgan(self):
        p = np.array([0.2, 0.5, 0.9])
        np.testing.assert_allclose(prob_not(prob_not(p)), p, rtol=1e-7)
        pair = np.array([0.4, 0.7])
        lhs = prob_not(prob_and(pair))
        rhs = prob_or(np.array([prob_not(0.4), prob_not(0.7)]))
        assert lhs == pytest.approx(rhs, rel=1e-9)

    def test_or_bounds(self):
        p = np.array([[0.2, 0.3], [0.9, 0.95]])
        out = prob_or(p)
        assert np.all(out >= np.max(p, axis=-1) - 1e-9)
        assert np.all(out <= 1.0)

    def test_cosine_mapping(self):
        assert cosine_to_probability(1.0) == pytest.approx(1.0, abs=1e-9)
        assert cosine_to_probability(-1.0) == pytest.approx(0.0, abs=1e-9)
        assert cosine_to_probability(0.0) == 0.5

    def test_resolve_alpha(self):
        assert resolve_alpha(None, 0.5) == 0.5
        assert resolve_alpha("auto", 0.0) == 0.5
        assert resolve_alpha(0.25, 0.5) == 0.25
        with pytest.raises(ValueError):
            resolve_alpha("bogus", 0.5)

    def test_weighted_conjunction_validation(self):
        p = np.array([0.8, 0.6])
        with pytest.raises(ValueError):
            log_odds_conjunction(p, weights=np.array([0.9, 0.2]))
        with pytest.raises(ValueError):
            log_odds_conjunction(p, weights=np.array([-0.1, 1.1]))

    def test_sign_preservation(self):
        # all-agreeing irrelevance must stay < 0.5 (no inversion)
        assert log_odds_conjunction(np.array([0.3, 0.2, 0.4])) < 0.5
        assert log_odds_conjunction(np.array([0.7, 0.8, 0.6])) > 0.5

    def test_balanced_fusion_zero_variance_signal(self):
        sparse = np.array([0.5, 0.5, 0.5])  # zero variance → contributes zeros
        dense = np.array([0.9, 0.1, 0.5])
        out = balanced_log_odds_fusion(sparse, dense, weight=0.5)
        assert out[0] == pytest.approx(0.5 * 1.0)
        assert out[1] == pytest.approx(0.0)

    def test_min_max(self):
        np.testing.assert_allclose(min_max_normalize(np.array([2.0, 4.0, 6.0])), [0, 0.5, 1])
        np.testing.assert_array_equal(min_max_normalize(np.array([3.0, 3.0])), [0, 0])


class TestLearnableWeights:
    def test_uniform_init_matches_unweighted_alpha0(self):
        w = LearnableLogOddsWeights(n_signals=3, alpha=0.0)
        p = np.array([0.85, 0.7, 0.6])
        expect = log_odds_conjunction(p, alpha=0.0, weights=np.full(3, 1 / 3))
        assert w(p) == pytest.approx(expect, rel=1e-12)

    def test_fit_upweights_informative_signal(self):
        rng = np.random.default_rng(42)
        n = 400
        labels = rng.integers(0, 2, n).astype(np.float64)
        good = np.clip(labels * 0.8 + 0.1 + rng.normal(0, 0.05, n), 0.01, 0.99)
        noise = rng.uniform(0.01, 0.99, n)
        w = LearnableLogOddsWeights(n_signals=2)
        w.fit(np.column_stack([good, noise]), labels)
        assert w.weights[0] > w.weights[1]

    def test_update_stays_on_simplex(self):
        w = LearnableLogOddsWeights(n_signals=3)
        rng = np.random.default_rng(1)
        for _ in range(30):
            w.update(rng.uniform(0.05, 0.95, 3), float(rng.integers(0, 2)))
        assert np.sum(w.weights) == pytest.approx(1.0, rel=1e-9)
        assert np.all(w.weights >= 0)


class TestAttentionWeights:
    def test_seeded_init_deterministic(self):
        a1 = AttentionLogOddsWeights(2, 3, seed=0)
        a2 = AttentionLogOddsWeights(2, 3, seed=0)
        np.testing.assert_array_equal(a1.W, a2.W)

    def test_prune_safety(self):
        a = AttentionLogOddsWeights(2, 3, seed=0)
        rng = np.random.default_rng(42)
        probs = rng.uniform(0.05, 0.95, (50, 2))
        qf = rng.normal(0, 1, 3)
        ub = np.minimum(probs + 0.05, 0.99)
        fused_all = a(probs, qf)
        keep, fused = a.prune(probs, qf, threshold=0.5, upper_bound_probs=ub)
        # no pruned candidate may have had fused prob >= threshold
        dropped = np.setdiff1d(np.arange(50), keep)
        assert np.all(fused_all[dropped] < 0.5 + 1e-9)
        np.testing.assert_allclose(fused, fused_all[keep], rtol=1e-12)

    def test_multi_head_mean_logit(self):
        from bayesian_bm25_spark.kernel import logit, sigmoid

        mh = MultiHeadAttentionLogOddsWeights(2, 3, n_heads=3)
        rng = np.random.default_rng(0)
        probs = rng.uniform(0.1, 0.9, (5, 2))
        qf = rng.normal(0, 1, 3)
        outs = np.array([np.atleast_1d(h(probs, qf)) for h in mh.heads])
        expect = sigmoid(np.mean(logit(outs), axis=0))
        np.testing.assert_allclose(mh(probs, qf), expect, rtol=1e-12)


class TestReferenceParity:
    def test_row_ops_bitwise(self, ref):
        rf = ref.fusion
        rng = np.random.default_rng(9)
        p = rng.uniform(0.001, 0.999, (200, 4))
        np.testing.assert_array_equal(prob_and(p), rf.prob_and(p))
        np.testing.assert_array_equal(prob_or(p), rf.prob_or(p))
        np.testing.assert_array_equal(prob_not(p), rf.prob_not(p))
        np.testing.assert_array_equal(cosine_to_probability(2 * p - 1), rf.cosine_to_probability(2 * p - 1))

    def test_conjunction_bitwise_all_gatings(self, ref):
        rf = ref.fusion
        rng = np.random.default_rng(10)
        p = rng.uniform(0.001, 0.999, (100, 3))
        w = np.array([0.5, 0.3, 0.2])
        for gating in ("none", "relu", "swish", "gelu", "softplus"):
            np.testing.assert_array_equal(
                log_odds_conjunction(p, gating=gating, gating_beta=1.3),
                rf.log_odds_conjunction(p, gating=gating, gating_beta=1.3),
            )
            np.testing.assert_array_equal(
                log_odds_conjunction(p, alpha="auto", weights=w, gating=gating, max_logit=4.0),
                rf.log_odds_conjunction(p, alpha="auto", weights=w, gating=gating, max_logit=4.0),
            )

    def test_gating_matches(self, ref):
        x = np.linspace(-8, 8, 200)
        for g in ("relu", "swish", "gelu", "softplus"):
            np.testing.assert_array_equal(
                apply_gating(x, g, beta=0.7), ref.fusion._apply_gating(x, g, beta=0.7)
            )

    def test_balanced_fusion_bitwise(self, ref):
        rng = np.random.default_rng(12)
        sp = rng.uniform(0.001, 0.999, 100)
        ds = rng.uniform(-1, 1, 100)
        np.testing.assert_array_equal(
            balanced_log_odds_fusion(sp, ds, weight=0.4),
            ref.fusion.balanced_log_odds_fusion(sp, ds, weight=0.4),
        )

    def test_learnable_fit_trajectory_identical(self, ref):
        rng = np.random.default_rng(21)
        probs = rng.uniform(0.05, 0.95, (200, 3))
        labels = rng.integers(0, 2, 200).astype(np.float64)
        theirs = ref.fusion.LearnableLogOddsWeights(3, alpha=0.3, base_rate=0.1)
        theirs.fit(probs, labels)
        ours = LearnableLogOddsWeights(3, alpha=0.3, base_rate=0.1)
        ours.fit(probs, labels)
        np.testing.assert_allclose(ours.weights, theirs.weights, rtol=1e-10)
        np.testing.assert_allclose(ours(probs), theirs(probs), rtol=1e-10)

    def test_attention_fit_trajectory_identical(self, ref):
        rng = np.random.default_rng(22)
        probs = rng.uniform(0.05, 0.95, (150, 2))
        labels = rng.integers(0, 2, 150).astype(np.float64)
        qf = rng.normal(0, 1, (150, 3))
        qids = rng.integers(0, 10, 150)
        theirs = ref.fusion.AttentionLogOddsWeights(2, 3, normalize=True, seed=0, base_rate=0.2)
        theirs.fit(probs, labels, qf, query_ids=qids)
        ours = AttentionLogOddsWeights(2, 3, normalize=True, seed=0, base_rate=0.2)
        ours.fit(probs, labels, qf, query_ids=qids)
        np.testing.assert_allclose(ours.W, theirs._W, rtol=1e-10)
        np.testing.assert_allclose(ours.b, theirs._b, rtol=1e-10)
        np.testing.assert_allclose(
            np.atleast_1d(ours(probs, qf)), np.atleast_1d(theirs(probs, qf)), rtol=1e-10
        )

    def test_attention_update_trajectory_identical(self, ref):
        rng = np.random.default_rng(23)
        theirs = ref.fusion.AttentionLogOddsWeights(2, 3, seed=1)
        ours = AttentionLogOddsWeights(2, 3, seed=1)
        for _ in range(25):
            p = rng.uniform(0.05, 0.95, 2)
            y = float(rng.integers(0, 2))
            q = rng.normal(0, 1, 3)
            theirs.update(p, y, q)
            ours.update(p, y, q)
        np.testing.assert_allclose(ours.W, theirs._W, rtol=1e-10)
        np.testing.assert_allclose(ours.W_avg, theirs._W_avg, rtol=1e-10)
