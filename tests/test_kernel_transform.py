"""Kernel parity: probability transform math vs paper goldens and the
reference's own numpy implementation (bit-level where applicable)."""

from __future__ import annotations

import numpy as np
import pytest

from bayesian_bm25_spark.kernel import (
    TemporalTransformParams,
    TransformParams,
    composite_prior,
    logit,
    norm_prior,
    posterior,
    sigmoid,
    tf_prior,
)

PAPER_SCORES = np.array([1.0464478, 0.56150854, 1.1230172])
PAPER_TFS = np.array([5.0, 3.0, 7.0])
PAPER_RATIOS = np.array([0.5, 0.5, 0.5])


class TestScalarKernels:
    def test_sigmoid_basics(self):
        assert sigmoid(0.0) == 0.5
        assert sigmoid(100.0) == pytest.approx(1.0)
        assert sigmoid(-100.0) == pytest.approx(0.0, abs=1e-30)
        # split form must not overflow
        assert np.isfinite(sigmoid(np.array([-1e6, 1e6]))).all()

    def test_logit_sigmoid_duality(self):
        for p in [0.01, 0.3, 0.5, 0.77, 0.999]:
            assert sigmoid(logit(p)) == pytest.approx(p, rel=1e-12)

    def test_tf_prior_goldens(self):
        # reference tests/test_probability.py:69-83
        assert tf_prior(0.0) == pytest.approx(0.2)
        assert tf_prior(10.0) == pytest.approx(0.9)
        assert tf_prior(100.0) == pytest.approx(0.9)
        assert tf_prior(5.0) == pytest.approx(0.2 + 0.7 * 0.5)

    def test_norm_prior_shape(self):
        assert norm_prior(0.5) == pytest.approx(0.9)
        assert norm_prior(0.0) == pytest.approx(0.3)
        assert norm_prior(1.0) == pytest.approx(0.3)
        assert norm_prior(2.0) == pytest.approx(0.3)

    def test_composite_prior_clamp(self):
        out = composite_prior(np.array([0.0, 100.0]), np.array([0.0, 0.5]))
        assert np.all(out >= 0.1) and np.all(out <= 0.9)

    def test_posterior_uniform_prior_is_likelihood(self):
        # reference tests/test_probability.py:122-128
        for lv in [0.1, 0.5, 0.9]:
            assert posterior(lv, 0.5) == pytest.approx(lv, rel=1e-9)

    def test_posterior_base_rate_neutral_at_half(self):
        assert posterior(0.7, 0.4, base_rate=0.5) == pytest.approx(posterior(0.7, 0.4), rel=1e-12)

    def test_posterior_logit_identity(self):
        lv, pr, br = 0.73, 0.41, 0.2
        expect = sigmoid(logit(lv) + logit(pr) + logit(br))
        assert posterior(lv, pr, base_rate=br) == pytest.approx(expect, rel=1e-9)


class TestTransformParams:
    def test_paper_score_ordering_preserved(self):
        # reference tests/test_probability.py:156-175: ranking by score is
        # preserved through the transform when priors are equal-ish
        t = TransformParams(alpha=1.0, beta=0.0)
        probs = t.score_to_probability(PAPER_SCORES, PAPER_TFS, PAPER_RATIOS)
        assert np.argsort(probs)[::-1].tolist() == np.argsort(PAPER_SCORES)[::-1].tolist()

    def test_prior_free_mode(self):
        t = TransformParams(alpha=2.0, beta=1.0, mode="prior_free")
        probs = t.score_to_probability(PAPER_SCORES, PAPER_TFS, PAPER_RATIOS)
        np.testing.assert_allclose(probs, t.likelihood(PAPER_SCORES), rtol=1e-12)

    def test_prior_fn_override(self):
        t = TransformParams(alpha=1.0, beta=0.0)
        fixed = t.score_to_probability(1.0, 5.0, 0.5, prior_fn=lambda s, tf, r: 0.5)
        assert fixed == pytest.approx(t.likelihood(1.0), rel=1e-9)

    def test_base_rate_validation(self):
        with pytest.raises(ValueError):
            TransformParams(base_rate=1.5)
        with pytest.raises(ValueError):
            TransformParams(base_rate=0.0)

    def test_base_rate_is_rank_preserving(self):
        # reference tests/test_scorer.py:158-169
        t0 = TransformParams(alpha=1.0, beta=0.5)
        t1 = TransformParams(alpha=1.0, beta=0.5, base_rate=0.01)
        rng = np.random.default_rng(42)
        scores = rng.uniform(0, 10, 200)
        tfs = rng.uniform(0, 20, 200)
        ratios = rng.uniform(0.1, 3.0, 200)
        p0 = t0.score_to_probability(scores, tfs, ratios)
        p1 = t1.score_to_probability(scores, tfs, ratios)
        assert np.argsort(p0).tolist() == np.argsort(p1).tolist()

    def test_wand_upper_bound_dominates(self):
        # pruning safety (reference tests/test_wand.py:75-108): no random
        # doc's probability may exceed the term's bound
        t = TransformParams(alpha=1.2, beta=2.0, base_rate=0.05)
        ub_score = 7.5
        bound = t.wand_upper_bound(ub_score)
        rng = np.random.default_rng(42)
        scores = rng.uniform(0, ub_score, 500)
        tfs = rng.uniform(0, 20, 500)
        ratios = rng.uniform(0.1, 3.0, 500)
        probs = t.score_to_probability(scores, tfs, ratios)
        assert np.all(probs <= bound + 1e-12)

    def test_fit_balanced_learns_separation(self):
        rng = np.random.default_rng(42)
        neg = rng.normal(1.0, 0.5, 300)
        pos = rng.normal(5.0, 0.5, 300)
        scores = np.concatenate([neg, pos])
        labels = np.concatenate([np.zeros(300), np.ones(300)])
        t = TransformParams(alpha=1.0, beta=0.0)
        t.fit(scores, labels, mode="balanced")
        assert t.likelihood(5.0) > 0.8
        assert t.likelihood(1.0) < 0.4
        assert t.mode == "balanced"

    def test_fit_prior_aware_requires_features(self):
        t = TransformParams()
        with pytest.raises(ValueError):
            t.fit(np.ones(4), np.ones(4), mode="prior_aware")

    def test_update_moves_params_and_averages(self):
        t = TransformParams(alpha=1.0, beta=0.0)
        for _ in range(20):
            t.update(5.0, 1.0)
            t.update(0.5, 0.0)
        assert t.n_updates == 40
        assert t.alpha >= 0.01
        assert t.alpha_avg != 1.0  # Polyak average moved

    def test_temporal_weights_favor_recent(self):
        # two contradictory regimes: recent labels should dominate
        scores = np.concatenate([np.full(50, 3.0), np.full(50, 3.0)])
        labels = np.concatenate([np.zeros(50), np.ones(50)])
        ts = np.arange(100, dtype=np.float64)
        t_short = TemporalTransformParams(decay_half_life=5.0)
        t_short.fit(scores, labels, timestamps=ts, mode="balanced")
        t_flat = TemporalTransformParams(decay_half_life=1e9)
        t_flat.fit(scores, labels, timestamps=ts, mode="balanced")
        assert t_short.likelihood(3.0) > t_flat.likelihood(3.0)

    def test_serialization_roundtrip(self):
        t = TransformParams(alpha=1.7, beta=0.3, base_rate=0.05, mode="prior_free")
        t2 = TransformParams.from_dict(t.to_dict())
        assert (t2.alpha, t2.beta, t2.base_rate, t2.mode) == (1.7, 0.3, 0.05, "prior_free")


class TestReferenceParity:
    """Bit-level agreement with the reference numpy implementation."""

    def test_sigmoid_logit_posterior_bitwise(self, ref):
        rp = ref.probability
        x = np.linspace(-50, 50, 1001)
        np.testing.assert_array_equal(sigmoid(x), rp.sigmoid(x))
        p = np.linspace(0.001, 0.999, 999)
        np.testing.assert_array_equal(logit(p), rp.logit(p))
        lv = np.linspace(0.01, 0.99, 99)
        pr = np.linspace(0.99, 0.01, 99)
        np.testing.assert_array_equal(
            posterior(lv, pr, base_rate=0.07),
            rp.BayesianProbabilityTransform.posterior(lv, pr, base_rate=0.07),
        )

    def test_priors_bitwise(self, ref):
        rp = ref.probability.BayesianProbabilityTransform
        tf = np.linspace(0, 30, 301)
        r = np.linspace(0, 3, 301)
        np.testing.assert_array_equal(tf_prior(tf), rp.tf_prior(tf))
        np.testing.assert_array_equal(norm_prior(r), rp.norm_prior(r))
        np.testing.assert_array_equal(composite_prior(tf, r), rp.composite_prior(tf, r))

    def test_score_to_probability_bitwise(self, ref):
        theirs = ref.probability.BayesianProbabilityTransform(alpha=1.3, beta=2.1, base_rate=0.03)
        ours = TransformParams(alpha=1.3, beta=2.1, base_rate=0.03)
        rng = np.random.default_rng(7)
        s = rng.uniform(0, 12, 500)
        tf = rng.integers(0, 15, 500).astype(np.float64)
        r = rng.uniform(0.05, 2.5, 500)
        np.testing.assert_array_equal(
            ours.score_to_probability(s, tf, r), theirs.score_to_probability(s, tf, r)
        )
        np.testing.assert_array_equal(
            ours.wand_upper_bound(9.9), theirs.wand_upper_bound(9.9)
        )

    def test_fit_trajectory_identical(self, ref):
        rng = np.random.default_rng(3)
        scores = rng.normal(2.0, 1.5, 400)
        labels = (scores + rng.normal(0, 1, 400) > 2.0).astype(np.float64)
        tfs = rng.integers(0, 12, 400).astype(np.float64)
        ratios = rng.uniform(0.2, 2.0, 400)
        for mode in ("balanced", "prior_aware", "prior_free"):
            theirs = ref.probability.BayesianProbabilityTransform(alpha=1.0, beta=0.0)
            theirs.fit(scores, labels, mode=mode, tfs=tfs, doc_len_ratios=ratios)
            ours = TransformParams(alpha=1.0, beta=0.0)
            ours.fit(scores, labels, mode=mode, tfs=tfs, doc_len_ratios=ratios)
            assert ours.alpha == pytest.approx(theirs.alpha, rel=1e-12), mode
            assert ours.beta == pytest.approx(theirs.beta, rel=1e-12), mode

    def test_online_update_trajectory_identical(self, ref):
        theirs = ref.probability.BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        ours = TransformParams(alpha=1.0, beta=0.0)
        rng = np.random.default_rng(11)
        for _ in range(50):
            s = float(rng.uniform(0, 8))
            y = float(rng.integers(0, 2))
            theirs.update(s, y)
            ours.update(s, y)
        assert ours.alpha == pytest.approx(theirs.alpha, rel=1e-12)
        assert ours.beta == pytest.approx(theirs.beta, rel=1e-12)
        assert ours.alpha_avg == pytest.approx(theirs.averaged_alpha, rel=1e-12)
        assert ours.beta_avg == pytest.approx(theirs.averaged_beta, rel=1e-12)

    def test_temporal_fit_identical(self, ref):
        rng = np.random.default_rng(5)
        scores = rng.normal(2.0, 1.0, 200)
        labels = rng.integers(0, 2, 200).astype(np.float64)
        ts = np.sort(rng.uniform(0, 1000, 200))
        theirs = ref.probability.TemporalBayesianTransform(decay_half_life=100.0)
        theirs.fit(scores, labels, timestamps=ts)
        ours = TemporalTransformParams(decay_half_life=100.0)
        ours.fit(scores, labels, timestamps=ts)
        assert ours.alpha == pytest.approx(theirs.alpha, rel=1e-12)
        assert ours.beta == pytest.approx(theirs.beta, rel=1e-12)
