"""Multi-field search, hybrid fusion operators, IR metrics — Spark vs the
numpy kernel oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesian_bm25_spark.kernel import combine as KC
from bayesian_bm25_spark.kernel.bm25 import (
    BM25Oracle,
    estimate_alpha_beta,
    sample_pseudo_query_scores,
)
from bayesian_bm25_spark.kernel.score_metrics import (
    average_precision as np_ap,
)
from bayesian_bm25_spark.kernel.score_metrics import (
    ndcg_at_k as np_ndcg,
)
from bayesian_bm25_spark.kernel.score_metrics import (
    precision_at_k as np_prec,
)
from bayesian_bm25_spark.kernel.transform import TransformParams
from bayesian_bm25_spark.operators import fusion_ops as FO
from bayesian_bm25_spark.operators import ir_metrics as IR
from bayesian_bm25_spark.operators.multi_field import (
    build_multi_field_index,
    field_probabilities,
    retrieve_multi_field,
    validate_weights,
)
from bayesian_bm25_spark.sources.webcorpus import queries_to_df

# FIXTURES.md F4 — reference tests/test_multi_field.py:16-41
TWO_FIELD_DOCS = [
    {"title": "cat sat mat", "body": "the cat sat on the mat"},
    {"title": "dog chased cat", "body": "the dog chased the cat around"},
    {"title": "quick brown fox", "body": "a quick brown fox jumps over the lazy dog"},
    {"title": "hello world", "body": "hello world program"},
    {"title": "machine learning", "body": "machine learning is a subset of artificial intelligence"},
]


def oracle_field(field: str):
    o = BM25Oracle()
    corpus = [d[field].split() for d in TWO_FIELD_DOCS]
    o.index(corpus)
    pq = sample_pseudo_query_scores(o, corpus)
    a, b = estimate_alpha_beta(pq)
    return o, TransformParams(alpha=a, beta=b), corpus


def oracle_multi_probs(query: list[str], weights=(0.5, 0.5), alpha=0.5):
    """Reference pipeline: per-field dense probs → weighted conjunction."""
    stacks = []
    for field in ("title", "body"):
        o, params, corpus = oracle_field(field)
        scores = o.get_scores(query)
        probs = np.zeros(len(corpus))
        mask = scores > 0
        if mask.any():
            tf = np.array([len(set(query) & set(c)) for c in corpus], dtype=float)
            ratios = o.doc_lengths / o.avgdl
            probs[mask] = params.score_to_probability(scores[mask], tf[mask], ratios[mask])
        stacks.append(probs)
    stacked = np.column_stack(stacks)
    # full-outer-join semantics: prob 0 stays 0 → clamped inside conjunction
    return KC.log_odds_conjunction(stacked, alpha=alpha, weights=np.array(weights))


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mf_idx"))
    docs = spark.createDataFrame(
        [(i, d["title"], d["body"]) for i, d in enumerate(TWO_FIELD_DOCS)],
        "doc_id long, title string, body string",
    )
    return build_multi_field_index(spark, docs, ["title", "body"], path)


class TestMultiField:
    def test_weights_validation(self):
        assert validate_weights(["a", "b"], None) == {"a": 0.5, "b": 0.5}
        with pytest.raises(ValueError):
            validate_weights(["a", "b"], {"a": 0.9, "b": 0.2})
        with pytest.raises(ValueError):
            validate_weights(["a", "b"], {"a": 1.0})

    def test_per_field_params_match_oracle(self, mf_index):
        for field in ("title", "body"):
            _, params, _ = oracle_field(field)
            got = mf_index.per_field[field].params
            assert got.alpha == pytest.approx(params.alpha, rel=1e-9), field
            assert got.beta == pytest.approx(params.beta, rel=1e-9), field

    def test_fused_probabilities_match_oracle(self, mf_index):
        query = ["cat"]
        qdf = queries_to_df(mf_index.spark, [query])
        got = retrieve_multi_field(mf_index, qdf, k=5).collect()
        expect = oracle_multi_probs(query)
        by_doc = {int(r["doc_id"]): float(r["probability"]) for r in got}
        # candidates = docs matching in ≥1 field
        for did, p in by_doc.items():
            assert p == pytest.approx(expect[did], rel=1e-9), did
        # ranking matches the oracle's ordering over the same candidates
        order = sorted(by_doc, key=lambda d: (-by_doc[d], d))
        expect_order = sorted(by_doc, key=lambda d: (-expect[d], d))
        assert order == expect_order

    def test_field_weighting_changes_ranking_inputs(self, mf_index):
        qdf = queries_to_df(mf_index.spark, [["cat"]])
        probs = field_probabilities(mf_index, qdf).collect()
        assert {c for c in probs[0].asDict()} == {"query_id", "doc_id", "p_title", "p_body"}
        # doc present in body only for "the" style tokens still gets p_title=0
        assert all(r["p_title"] >= 0.0 for r in probs)


def make_signal_frames(spark):
    """Deterministic sparse/dense candidate frames for 2 queries."""
    rng = np.random.default_rng(42)
    sparse_rows, dense_rows = [], []
    for q in range(2):
        sdocs = rng.choice(50, 12, replace=False)
        ddocs = rng.choice(50, 12, replace=False)
        for d in sdocs:
            sparse_rows.append((q, int(d), float(rng.uniform(0.01, 0.99))))
        for d in ddocs:
            dense_rows.append((q, int(d), float(rng.uniform(-1, 1))))
    sparse = spark.createDataFrame(sparse_rows, "query_id long, doc_id long, probability double")
    dense = spark.createDataFrame(dense_rows, "query_id long, doc_id long, sim double")
    return sparse, dense


class TestFusionOps:
    def test_union_fills_neutral(self, spark):
        sparse, dense = make_signal_frames(spark)
        cands = FO.union_candidates(sparse, dense)
        rows = cands.collect()
        assert all(r["p_sparse"] is not None and r["cos_dense"] is not None for r in rows)
        n_union = cands.select("query_id", "doc_id").distinct().count()
        assert n_union == cands.count()

    def test_balanced_fusion_matches_kernel(self, spark):
        sparse, dense = make_signal_frames(spark)
        cands = FO.union_candidates(sparse, dense)
        got = FO.balanced_fusion(cands, weight=0.4).collect()
        import pandas as pd

        pdf = pd.DataFrame([r.asDict() for r in got])
        for q, g in pdf.groupby("query_id"):
            expect = KC.balanced_log_odds_fusion(
                g["p_sparse"].to_numpy(), g["cos_dense"].to_numpy(), weight=0.4
            )
            np.testing.assert_allclose(g["fused"].to_numpy(), expect, rtol=1e-9)

    def test_convex_fusion_bounds_and_weighting(self, spark):
        sparse, dense = make_signal_frames(spark)
        cands = FO.union_candidates(sparse, dense)
        rows = FO.convex_fusion(cands, weight=1.0).collect()
        assert all(0.0 <= r["fused"] <= 1.0 for r in rows)
        # weight=1.0 → ranking by dense only
        import pandas as pd

        pdf = pd.DataFrame([r.asDict() for r in rows])
        for _, g in pdf.groupby("query_id"):
            assert (
                g.sort_values("fused", ascending=False)["cos_dense"].is_monotonic_decreasing
            )

    def test_rrf_matches_manual(self, spark):
        sparse, dense = make_signal_frames(spark)
        got = {
            (r["query_id"], r["doc_id"]): r["fused"]
            for r in FO.rrf_fusion(sparse, dense, k=60).collect()
        }
        import pandas as pd

        sp = pd.DataFrame(sparse.collect(), columns=["query_id", "doc_id", "probability"])
        dn = pd.DataFrame(dense.collect(), columns=["query_id", "doc_id", "sim"])
        for q in (0, 1):
            s = sp[sp.query_id == q].sort_values(
                ["probability", "doc_id"], ascending=[False, True]
            )
            d = dn[dn.query_id == q].sort_values(["sim", "doc_id"], ascending=[False, True])
            srank = {int(r.doc_id): i + 1 for i, r in enumerate(s.itertuples())}
            drank = {int(r.doc_id): i + 1 for i, r in enumerate(d.itertuples())}
            for doc in set(srank) | set(drank):
                expect = (1.0 / (60 + srank[doc]) if doc in srank else 0.0) + (
                    1.0 / (60 + drank[doc]) if doc in drank else 0.0
                )
                assert got[(q, doc)] == pytest.approx(expect, rel=1e-12)

    def test_conjunction_fusion_row_local(self, spark):
        sparse, dense = make_signal_frames(spark)
        cands = FO.union_candidates(sparse, dense)
        rows = FO.conjunction_fusion(cands, alpha="auto").collect()
        for r in rows:
            expect = KC.log_odds_conjunction(
                np.array([r["p_sparse"], KC.cosine_to_probability(r["cos_dense"])]),
                alpha="auto",
            )
            assert r["fused"] == pytest.approx(expect, rel=1e-9)

    def test_topk_fused(self, spark):
        sparse, dense = make_signal_frames(spark)
        out = FO.topk_fused(FO.rrf_fusion(sparse, dense), k=5).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        for q, ranks in per_q.items():
            assert sorted(ranks) == [1, 2, 3, 4, 5]


class TestIRMetrics:
    @pytest.fixture(scope="class")
    def fixtures(self, spark):
        ranking_rows = [
            (0, 1, 10), (0, 2, 11), (0, 3, 12), (0, 4, 13),
            (1, 1, 20), (1, 2, 21), (1, 3, 22),
            (2, 1, 30), (2, 2, 31),  # no relevant docs at all
        ]
        qrel_rows = [
            (0, 10, 3), (0, 12, 1), (0, 99, 2),
            (1, 21, 1),
        ]
        ranking = spark.createDataFrame(ranking_rows, "query_id long, rank int, doc_id long")
        qrels = spark.createDataFrame(qrel_rows, "query_id long, doc_id long, relevance int")
        return ranking, qrels

    def test_ndcg_matches_kernel(self, fixtures):
        ranking, qrels = fixtures
        got = {r["query_id"]: r["ndcg"] for r in IR.ndcg_at_k(ranking, qrels, k=4).collect()}
        # query 0: rels at ranks [3,0,1,0]; ideal from qrels {3,1,2} → [3,2,1]
        assert got[0] == pytest.approx(
            (3 / np.log2(2) + 1 / np.log2(4))
            / (3 / np.log2(2) + 2 / np.log2(3) + 1 / np.log2(4)),
            rel=1e-9,
        )
        assert got[1] == pytest.approx(np_ndcg([0, 1, 0], 4), rel=1e-9)
        assert got[2] == 0.0

    def test_precision_matches_kernel(self, fixtures):
        ranking, qrels = fixtures
        got = {r["query_id"]: r["precision"] for r in IR.precision_at_k(ranking, qrels, k=2).collect()}
        assert got[0] == pytest.approx(np_prec([1, 0], 2))
        assert got[1] == pytest.approx(np_prec([0, 1], 2))
        assert got[2] == 0.0

    def test_ap_matches_kernel(self, fixtures):
        ranking, qrels = fixtures
        got = {r["query_id"]: r["ap"] for r in IR.average_precision(ranking, qrels).collect()}
        assert got[0] == pytest.approx(np_ap([1, 0, 1, 0]), rel=1e-9)
        assert got[1] == pytest.approx(np_ap([0, 1, 0]), rel=1e-9)
        assert got[2] == 0.0
