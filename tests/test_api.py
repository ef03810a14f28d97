"""Facade API: reference call shapes on Spark, checked vs the oracle."""

from __future__ import annotations

import numpy as np
import pytest

from bayesian_bm25_spark.api import BayesianBM25Scorer, MultiFieldScorer
from bayesian_bm25_spark.kernel.bm25 import (
    BM25Oracle,
    estimate_alpha_beta,
    sample_pseudo_query_scores,
    tokenize,
)
from bayesian_bm25_spark.kernel.transform import TransformParams
from tests.conftest import SIX_DOCS


@pytest.fixture(scope="module")
def scorer(spark, tmp_path_factory):
    s = BayesianBM25Scorer(
        spark=spark,
        index_path=str(tmp_path_factory.mktemp("api_idx")),
        base_rate="auto",
    )
    s.index([tokenize(d) for d in SIX_DOCS])
    return s


@pytest.fixture(scope="module")
def oracle():
    o = BM25Oracle()
    corpus = [tokenize(d) for d in SIX_DOCS]
    o.index(corpus)
    pq = sample_pseudo_query_scores(o, corpus)
    a, b = estimate_alpha_beta(pq)
    from bayesian_bm25_spark.kernel.bm25 import estimate_base_rate

    return o, TransformParams(alpha=a, beta=b,
                              base_rate=estimate_base_rate(pq, 6, "percentile")), corpus


class TestScorerFacade:
    def test_reference_shapes(self, scorer):
        ids, probs = scorer.retrieve([["cat"], ["dog"]], k=3)
        assert ids.shape == (2, 3) and probs.shape == (2, 3)
        assert scorer.num_docs == 6
        assert 0.0 < scorer.base_rate <= 0.5

    def test_retrieve_matches_oracle(self, scorer, oracle):
        o, params, corpus = oracle
        queries = [["cat"], ["machine", "learning"]]
        ids, probs = scorer.retrieve(queries, k=6)
        oids, oscores = o.retrieve(queries, k=6)
        for qi, q in enumerate(queries):
            expect = [(int(d), float(s)) for d, s in zip(oids[qi], oscores[qi]) if s > 0]
            got = [(int(d), p) for d, p in zip(ids[qi], probs[qi]) if d >= 0]
            assert [d for d, _ in got] == [d for d, _ in expect]
            for (did, p), (_, s) in zip(got, expect):
                tf = len(set(q) & set(corpus[did]))
                ratio = o.doc_lengths[did] / o.avgdl
                assert p == pytest.approx(
                    scorer.transform.score_to_probability(s, tf, ratio), rel=1e-9
                )

    def test_dense_probabilities(self, scorer, oracle):
        o, _, corpus = oracle
        probs = scorer.get_probabilities(["cat"])
        assert probs.shape == (6,)
        s = o.get_scores(["cat"])
        assert set(np.nonzero(probs)[0]) == set(np.nonzero(s)[0])

    def test_retrieve_explain_result(self, scorer):
        """retrieve(explain=True) — the reference's RetrievalResult
        shape (scorer.py:494-562): same ids/probs as the plain path,
        explanations[q][r] traces with posterior == probability, None
        at empty ranks."""
        queries = [["cat"], ["zzz_oov"]]
        ids, probs = scorer.retrieve(queries, k=3)
        res = scorer.retrieve(queries, k=3, explain=True)
        assert res.doc_ids.tolist() == ids.tolist()
        assert np.allclose(res.probabilities, probs)
        tr = res.explanations[0][0]
        assert tr is not None
        assert tr.posterior == pytest.approx(res.probabilities[0][0])
        for f in ("raw_score", "tf", "doc_len_ratio", "likelihood",
                  "tf_prior", "norm_prior", "composite_prior", "alpha", "beta"):
            assert hasattr(tr, f), f
        assert res.explanations[1] == [None, None, None]  # OOV query

    def test_warm_scoring_cache_identical_results(self, scorer):
        """Cached scoring layout (one postings re-shuffle reused across
        batches) must be rank- and probability-identical to the
        per-batch plan."""
        queries = [["cat"], ["dog", "cat"], ["zzz_oov"]]
        ids0, p0 = scorer.retrieve(queries, k=3)
        scorer.warm_scoring_cache(num_partitions=8)
        assert scorer._scoring_src is not None
        try:
            ids1, p1 = scorer.retrieve(queries, k=3)
            assert ids0.tolist() == ids1.tolist()
            assert p0.tolist() == p1.tolist()
            ids2, p2 = scorer.retrieve(queries, k=3)  # second cached batch
            assert ids0.tolist() == ids2.tolist()
        finally:
            scorer._drop_scoring_cache()
        assert scorer._scoring_src is None

    def test_empty_and_oov(self, scorer):
        ids, probs = scorer.retrieve([[], ["zzz_missing"]], k=3)
        assert (ids == -1).all() and (probs == 0.0).all()

    def test_add_documents(self, spark, tmp_path):
        s = BayesianBM25Scorer(spark=spark, index_path=str(tmp_path / "grow"))
        s.index([tokenize(d) for d in SIX_DOCS[:4]])
        assert s.num_docs == 4
        s.add_documents([tokenize(d) for d in SIX_DOCS[4:]])
        assert s.num_docs == 6
        ids, _ = s.retrieve([["machine", "learning"]], k=1)
        assert ids[0, 0] == 4  # the appended ML doc ranks first


class TestMultiFieldFacade:
    def test_reference_shape_roundtrip(self, spark, tmp_path):
        docs = [
            {"title": ["cat", "sat", "mat"], "body": ["the", "cat", "sat", "on", "the", "mat"]},
            {"title": ["dog", "chased", "cat"], "body": ["the", "dog", "chased", "the", "cat", "around"]},
            {"title": ["hello", "world"], "body": ["hello", "world", "program"]},
        ]
        mf = MultiFieldScorer(
            fields=["title", "body"],
            field_weights={"title": 0.4, "body": 0.6},
            spark=spark,
            index_path=str(tmp_path / "mf"),
        )
        mf.index(docs)
        ids, probs = mf.retrieve([["cat"]], k=3)
        assert ids.shape == (1, 3)
        assert ids[0, 0] in (0, 1)
        dense = mf.get_probabilities(["cat"])
        assert dense.shape == (3,)
        # unmatched doc gets the all-zero-signal conjunction, not 0
        assert 0.0 < dense[2] < 1e-6
