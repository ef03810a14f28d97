"""Kernel parity: calibration metrics, Platt/isotonic calibrators, IR
metrics, BM25 oracle basics, and base-rate estimators."""

from __future__ import annotations

import numpy as np
import pytest

from bayesian_bm25_spark.kernel import (
    BM25Oracle,
    IsotonicCalibrator,
    PlattCalibrator,
    average_precision,
    block_maxes,
    brier_score,
    calibration_report,
    dcg_at_k,
    estimate_alpha_beta,
    estimate_base_rate,
    expected_calibration_error,
    idf,
    log_loss,
    ndcg_at_k,
    precision_at_k,
    reliability_diagram,
    sample_pseudo_query_scores,
    tokenize,
)
from tests.conftest import SIX_DOCS

README_PROBS = np.array([0.9, 0.8, 0.3, 0.1, 0.7, 0.2])
README_LABELS = np.array([1.0, 1.0, 0.0, 0.0, 1.0, 0.0])


class TestCalibrationMetrics:
    def test_perfect_calibration_ece_zero(self):
        # reference tests/test_metrics.py:23-28
        p = np.array([0.0, 1.0, 0.0, 1.0])
        y = np.array([0.0, 1.0, 0.0, 1.0])
        assert expected_calibration_error(p, y) == pytest.approx(0.0)

    def test_brier_and_logloss_basics(self):
        assert brier_score(README_LABELS, README_LABELS) == 0.0
        assert log_loss(README_LABELS, README_LABELS) == pytest.approx(0.0, abs=1e-10)
        assert brier_score(README_PROBS, README_LABELS) == pytest.approx(
            np.mean((README_PROBS - README_LABELS) ** 2)
        )

    def test_report_bundles(self):
        rep = calibration_report(README_PROBS, README_LABELS)
        assert rep.n_samples == 6
        assert "ECE" in rep.summary()

    def test_reference_parity(self, ref):
        rm = ref.metrics
        rng = np.random.default_rng(4)
        p = rng.uniform(0, 1, 500)
        y = rng.integers(0, 2, 500).astype(np.float64)
        assert expected_calibration_error(p, y) == pytest.approx(
            rm.expected_calibration_error(p, y), rel=1e-12
        )
        assert brier_score(p, y) == rm.brier_score(p, y)
        assert log_loss(p, y) == rm.log_loss(p, y)
        assert reliability_diagram(p, y) == rm.reliability_diagram(p, y)
        # edge probabilities exercise the closed-first-bin rule
        edge = np.array([0.0, 0.1, 0.1000000001, 0.2, 1.0])
        ye = np.ones(5)
        assert expected_calibration_error(edge, ye) == pytest.approx(
            rm.expected_calibration_error(edge, ye), rel=1e-12
        )


class TestCalibrators:
    def test_platt_learns_separation(self):
        rng = np.random.default_rng(42)
        scores = np.concatenate([rng.normal(-2, 1, 300), rng.normal(2, 1, 300)])
        labels = np.concatenate([np.zeros(300), np.ones(300)])
        c = PlattCalibrator()
        c.fit(scores, labels)
        assert c.calibrate(3.0) > 0.7
        assert c.calibrate(-3.0) < 0.3

    def test_platt_reference_parity(self, ref):
        rng = np.random.default_rng(8)
        s = rng.normal(0, 2, 400)
        y = (s + rng.normal(0, 1, 400) > 0).astype(np.float64)
        theirs = ref.calibration.PlattCalibrator()
        theirs.fit(s, y)
        ours = PlattCalibrator()
        ours.fit(s, y)
        assert ours.a == pytest.approx(theirs.a, rel=1e-12)
        assert ours.b == pytest.approx(theirs.b, rel=1e-12)

    def test_isotonic_monotone(self):
        rng = np.random.default_rng(42)
        s = rng.uniform(0, 10, 500)
        y = (s + rng.normal(0, 2, 500) > 5).astype(np.float64)
        c = IsotonicCalibrator()
        c.fit(s, y)
        grid = np.linspace(-1, 11, 200)
        out = c.calibrate(grid)
        assert np.all(np.diff(out) >= -1e-12)

    def test_isotonic_reference_parity(self, ref):
        rng = np.random.default_rng(13)
        s = rng.uniform(0, 10, 300)
        y = (s + rng.normal(0, 2, 300) > 5).astype(np.float64)
        theirs = ref.calibration.IsotonicCalibrator()
        theirs.fit(s, y)
        ours = IsotonicCalibrator()
        ours.fit(s, y)
        np.testing.assert_allclose(ours.bx, theirs._x, rtol=1e-12)
        np.testing.assert_allclose(ours.by, theirs._y, rtol=1e-12)
        grid = np.linspace(-2, 12, 257)
        np.testing.assert_allclose(ours.calibrate(grid), theirs.calibrate(grid), rtol=1e-12)


class TestIRMetrics:
    def test_ndcg_perfect_ranking(self):
        assert ndcg_at_k([3, 2, 1, 0], 4) == pytest.approx(1.0)
        assert ndcg_at_k([0, 0, 0], 3) == 0.0
        assert dcg_at_k([1, 1], 2) == pytest.approx(1.0 + 1.0 / np.log2(3))

    def test_precision_and_ap(self):
        assert precision_at_k([1, 0, 1, 0], 2) == 0.5
        assert average_precision([1, 0, 1]) == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
        assert average_precision([0, 0]) == 0.0


class TestBM25Oracle:
    def make(self):
        o = BM25Oracle(k1=1.2, b=0.75, method="lucene")
        o.index([tokenize(d) for d in SIX_DOCS])
        return o

    def test_basic_stats(self):
        o = self.make()
        assert o.n_docs == 6
        assert o.df["cat"] == 3
        assert o.df["the"] == 4
        assert o.avgdl == pytest.approx(np.mean([len(tokenize(d)) for d in SIX_DOCS]))

    def test_cat_query_hits(self):
        # docs {0,1,5} contain "cat" (reference tests/test_scorer.py:99)
        o = self.make()
        s = o.get_scores(["cat"])
        assert set(np.nonzero(s)[0].tolist()) == {0, 1, 5}
        assert s[3] == 0.0  # reference tests/test_scorer.py:122

    def test_oov_and_empty_queries(self):
        o = self.make()
        assert np.all(o.get_scores(["xyznonexistent"]) == 0.0)
        assert np.all(o.get_scores([]) == 0.0)

    def test_retrieve_tie_break_pinned(self):
        o = self.make()
        ids, scores = o.retrieve([["cat"]], k=6)
        # descending scores; ties broken by ascending doc_id; padding -1
        assert list(scores[0][:3]) == sorted(scores[0][:3], reverse=True)
        assert ids[0, 3] == -1 or scores[0, 3] == 0.0

    def test_idf_variants(self):
        assert idf(3, 6, "robertson") == pytest.approx(np.log((6 - 3 + 0.5) / 3.5))
        assert idf(3, 6, "lucene") == pytest.approx(np.log(1 + 3.5 / 3.5))
        assert idf(3, 6, "atire") == pytest.approx(np.log(2.0))

    def test_duplicate_query_terms_add(self):
        o = self.make()
        np.testing.assert_allclose(o.get_scores(["cat", "cat"]), 2 * o.get_scores(["cat"]))

    def test_block_maxes(self):
        rng = np.random.default_rng(42)
        m = rng.uniform(0, 10, (5, 200))
        bm = block_maxes(m, block_size=64)
        assert bm.shape == (5, 4)
        assert bm[2, 0] == np.max(m[2, :64])
        # safety: every score ≤ its block max
        for t in range(5):
            for d in range(200):
                assert m[t, d] <= bm[t, d // 64] + 1e-12


class TestEstimators:
    def test_alpha_beta_user_override(self):
        assert estimate_alpha_beta([], user_alpha=2.0, user_beta=1.0) == (2.0, 1.0)
        assert estimate_alpha_beta([]) == (1.0, 0.0)

    def test_alpha_beta_from_scores(self):
        s = [np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0])]
        a, b = estimate_alpha_beta(s)
        pooled = np.concatenate(s)
        assert b == np.median(pooled)
        assert a == pytest.approx(1.0 / np.std(pooled))

    def test_base_rate_percentile_bimodal(self):
        # FIXTURES.md F5 bimodal sample (reference tests/test_scorer.py:264-277)
        rng = np.random.default_rng(42)
        sample = np.abs(np.concatenate([rng.normal(1.0, 0.5, 900), rng.normal(5.0, 0.5, 100)]))
        rate = estimate_base_rate([sample], n_docs=1000, method="percentile")
        assert 1e-6 <= rate <= 0.5

    def test_base_rate_mixture_identifies_minority(self):
        rng = np.random.default_rng(42)
        sample = np.concatenate([rng.normal(1.0, 0.5, 900), rng.normal(5.0, 0.5, 100)])
        rate = estimate_base_rate([sample], n_docs=1000, method="mixture")
        assert 0.05 <= rate <= 0.2  # ~10% relevant component

    def test_base_rate_elbow(self):
        # elbow sample: 10 high scores then a slope (reference tests/test_scorer.py:279-288)
        sample = np.concatenate([np.full(10, 10.0), np.linspace(2.0, 0.1, 90)])
        rate = estimate_base_rate([sample], n_docs=100, method="elbow")
        assert 0.05 <= rate <= 0.2

    def test_empty_fallback(self):
        assert estimate_base_rate([], 100) == 1e-6

    def test_pseudo_query_sampling_deterministic(self):
        o = BM25Oracle()
        corpus = [tokenize(d) for d in SIX_DOCS]
        o.index(corpus)
        a = sample_pseudo_query_scores(o, corpus)
        b = sample_pseudo_query_scores(o, corpus)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestIRReferenceParity:
    def test_ir_metrics_bitwise(self, ref):
        import importlib
        import sys

        sys.path.insert(0, "/root/reference")
        rm = importlib.import_module("benchmarks.metrics")
        rng = np.random.default_rng(42)
        for _ in range(20):
            rel = rng.integers(0, 4, rng.integers(1, 15)).astype(float)
            for k in (1, 5, 10, 20):
                assert dcg_at_k(rel, k) == rm.dcg_at_k(rel, k)
                assert ndcg_at_k(rel, k) == rm.ndcg_at_k(rel, k)
                assert precision_at_k(rel, k) == rm.precision_at_k(rel, k)
            assert average_precision(rel) == pytest.approx(
                rm.average_precision(rel), rel=1e-12
            )
        assert precision_at_k([1.0], 10) == rm.precision_at_k(np.array([1.0]), 10)
