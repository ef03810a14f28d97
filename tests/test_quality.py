"""End-to-end quality harness: fusion must beat BM25 (and the best
fusion must beat BOTH single signals) on the synthetic BEIR fixture —
the engine-level counterpart of the reference's README quality tables
(hybrid_beir.py → NDCG@10/MAP)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def quality_results(spark, tmp_path_factory):
    from bayesian_bm25_spark.operators.quality import evaluate_fusion_matrix
    from bayesian_bm25_spark.sources.synthetic_beir import write_fixture

    root = str(tmp_path_factory.mktemp("quality"))
    # smaller than the BENCH/QUALITY.md run, same structure
    fixture = write_fixture(
        root, n_topics=8, lexical_per_topic=5, semantic_per_topic=3,
        noise_docs=40, distractors_per_topic=4,
    )
    return evaluate_fusion_matrix(spark, fixture, root, k=10)


class TestQualityHarness:
    def test_all_methods_present_and_bounded(self, quality_results):
        assert set(quality_results) == {
            "bm25", "dense", "convex", "rrf", "balanced", "logodds_local",
            "vpt_balanced", "arctan_or", "gated_relu", "gated_swish",
            "gated_gelu", "gated_softplus", "logodds", "dense_arctan",
            "attention", "multihead", "cosine_or", "learnable",
        }
        for m in quality_results.values():
            assert 0.0 <= m["ndcg"] <= 1.0
            assert 0.0 <= m["map"] <= 1.0
            assert 0.0 <= m["p"] <= 1.0

    def test_every_fusion_beats_bm25(self, quality_results):
        """The fixture hides the semantic relevants from the lexical
        signal — any calibrated fusion must outrank BM25 alone."""
        bm25 = quality_results["bm25"]["ndcg"]
        for name in ("convex", "rrf", "balanced", "logodds_local"):
            assert quality_results[name]["ndcg"] > bm25, name

    def test_best_fusion_beats_both_single_signals(self, quality_results):
        """The hybrid win: complementary signals → the best fusion
        outranks BOTH bm25-only and dense-only."""
        best = max(
            quality_results[n]["ndcg"]
            for n in ("convex", "rrf", "balanced", "logodds_local")
        )
        assert best > quality_results["bm25"]["ndcg"]
        assert best > quality_results["dense"]["ndcg"]

    def test_learned_fusion_beats_single_signals(self, quality_results):
        """The reference's headline method (attention fusion,
        README.md:433) — fit on the fixture qrels — must beat both
        single signals, and at least match the untrained balanced
        baseline (the fixture is constructed so fusion wins)."""
        att = quality_results["attention"]["ndcg"]
        assert att > quality_results["bm25"]["ndcg"]
        assert att > quality_results["dense"]["ndcg"]
        assert att >= quality_results["balanced"]["ndcg"]
        mh = quality_results["multihead"]["ndcg"]
        assert mh > quality_results["bm25"]["ndcg"]
        assert mh > quality_results["dense"]["ndcg"]
