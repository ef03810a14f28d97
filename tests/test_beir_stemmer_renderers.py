"""BEIR-format loader, Porter stemmer, multi-field append, renderers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions.stemmer import porter_stem, stem_terms
from bayesian_bm25_spark.operators import query as Q
from bayesian_bm25_spark.operators.index_build import IndexConfig, build_index
from bayesian_bm25_spark.sources.beir_local import load_ir_dataset
from bayesian_bm25_spark.sources.webcorpus import queries_to_df


class TestPorterStemmer:
    # end-to-end outputs of the classic Porter algorithm (Porter 1980);
    # values verified against the canonical implementation's behavior
    VECTORS = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
        "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        "running": "run", "flies": "fli",
    }

    def test_canonical_vectors(self):
        bad = {
            w: (porter_stem(w), e)
            for w, e in self.VECTORS.items()
            if porter_stem(w) != e
        }
        assert not bad, bad

    def test_index_with_stemmer_matches_stemmed_queries(self, spark, tmp_path):
        texts = [
            "cats running happily",          # stems: cat run happili
            "a dog walked alone",            # dog walk alon
            "relational databases scaling",  # relat databas scale->scal
        ]
        pages = spark.createDataFrame(
            [(i, f"https://s.test/{i}", t, "en") for i, t in enumerate(texts)],
            "doc_id long, url string, text string, lang string",
        )
        idx = build_index(
            spark, pages, str(tmp_path / "stem_idx"),
            IndexConfig(stemmer="porter", alpha=1.0, beta=1.0, build_compressed=False),
        )
        terms = {r["term"] for r in idx.postings.select("term").distinct().collect()}
        assert "cat" in terms and "run" in terms and "cats" not in terms
        # query with surface forms, stemmed the same way → matches doc 0
        qdf = stem_terms(queries_to_df(spark, [["cat", "running"]]))
        got = Q.retrieve(idx.postings, qdf, idx.params, idx.avgdl, k=1).collect()
        assert len(got) == 1 and got[0]["doc_id"] == 0

    def test_unknown_stemmer_rejected(self, spark):
        from bayesian_bm25_spark.operators.index_build import tokenize_pages

        pages = spark.createDataFrame(
            [(0, "u", "x y", "en")], "doc_id long, url string, text string, lang string"
        )
        with pytest.raises(ValueError, match="unknown stemmer"):
            tokenize_pages(pages, stemmer="snowball2")


class TestStopwords:
    """BEIR-protocol stopword filtering (reference hybrid_beir.py:293:
    bm25s.tokenize(stopwords='english') alongside the stemmer)."""

    def test_filter_preserves_duplicates_and_order(self, spark):
        from bayesian_bm25_spark.operators.index_build import tokenize_pages

        pages = spark.createDataFrame(
            [(0, "u", "the cat and the cat ran", "en")],
            "doc_id long, url string, text string, lang string",
        )
        row = tokenize_pages(pages, stopwords="english").collect()[0]
        # "the"/"and" removed; the duplicate surviving token stays twice
        # (array_except-style dedup would corrupt tf)
        assert row["tokens"] == ["cat", "cat", "ran"]
        assert row["doc_len"] == 3

    def test_stopword_removed_before_stemming(self, spark):
        """bm25s order: filter on the UNSTEMMED surface form.  'during'
        is a stopword whose Porter stem ('dure') is not — filtering
        after stemming would wrongly keep it."""
        from bayesian_bm25_spark.operators.index_build import tokenize_pages

        pages = spark.createDataFrame(
            [(0, "u", "during running", "en")],
            "doc_id long, url string, text string, lang string",
        )
        row = tokenize_pages(pages, stemmer="porter", stopwords="english").collect()[0]
        assert row["tokens"] == ["run"]

    def test_index_and_query_agree_on_stopwords(self, spark, tmp_path):
        """Docs differing ONLY by stopwords index identically, and
        stopword-laden queries rank identically to their content-word
        cores — through the full facade path."""
        from bayesian_bm25_spark.api import BayesianBM25Scorer

        texts = [
            "the quick brown fox and the lazy dog",
            "quick brown fox lazy dog",          # same minus stopwords
            "a completely unrelated document about databases",
        ]
        pages = spark.createDataFrame(
            [(i, f"https://s.test/{i}", t, "en") for i, t in enumerate(texts)],
            "doc_id long, url string, text string, lang string",
        )
        eng = BayesianBM25Scorer(
            spark, index_path=str(tmp_path / "sw_idx"),
            stemmer="porter2", stopwords="english",
            alpha=1.0, beta=1.0, build_compressed=False,
        )
        eng.index(pages)
        lens = {
            r["doc_id"]: r["doc_len"]
            for r in eng._index.doc_stats.collect()
        }
        assert lens[0] == lens[1] == 5  # stopword-only difference gone
        ids_sw, p_sw = eng.retrieve([["the", "quick", "fox", "and"]], k=2)
        ids_core, p_core = eng.retrieve([["quick", "fox"]], k=2)
        assert ids_sw.tolist() == ids_core.tolist()
        assert p_sw.tolist() == p_core.tolist()
        assert set(ids_sw[0]) == {0, 1}

    def test_unknown_stopword_set_rejected(self):
        from bayesian_bm25_spark.functions.stopwords import resolve_stopwords

        with pytest.raises(ValueError, match="unknown stopword set"):
            resolve_stopwords("klingon")

    def test_explicit_list_and_driver_twin(self):
        from bayesian_bm25_spark.functions.stopwords import filter_tokens_driver

        assert filter_tokens_driver(
            ["foo", "bar", "foo", "baz"], ["bar", "baz"]
        ) == ["foo", "foo"]


def _write_beir_fixture(root) -> str:
    """Tiny BEIR-layout dataset: 4 docs, 2 judged queries, 1 unjudged."""
    d = os.path.join(str(root), "toy-beir")
    os.makedirs(os.path.join(d, "qrels"), exist_ok=True)
    corpus = [
        {"_id": "d1", "title": "Feline care", "text": "cats purr and nap"},
        {"_id": "d2", "title": "", "text": "dogs bark loudly at night"},
        {"_id": "d3", "title": "Cooking", "text": "soup recipes with basil"},
        {"_id": "d4", "text": "quantum computing with qubits"},  # no title key
    ]
    with open(os.path.join(d, "corpus.jsonl"), "w") as f:
        for row in corpus:
            f.write(json.dumps(row) + "\n")
    queries = [
        {"_id": "q1", "text": "cats purr"},
        {"_id": "q2", "text": "quantum qubits"},
        {"_id": "q9", "text": "unjudged query"},
    ]
    with open(os.path.join(d, "queries.jsonl"), "w") as f:
        for row in queries:
            f.write(json.dumps(row) + "\n")
    with open(os.path.join(d, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t2\n")
        f.write("q1\td3\t1\n")
        f.write("q2\td4\t1\n")
    return d


class TestBeirLoader:
    def test_load_build_and_ndcg(self, spark, tmp_path):
        from bayesian_bm25_spark.operators.ir_metrics import mean_metric, ndcg_at_k

        ds = load_ir_dataset(spark, _write_beir_fixture(tmp_path))
        # title+text concat (reference utils.py:38-42); unjudged q9 dropped
        texts = {r["url"]: r["text"] for r in ds.pages.collect()}
        assert texts["d1"] == "Feline care cats purr and nap"
        assert texts["d2"] == "dogs bark loudly at night"   # empty title
        assert texts["d4"] == "quantum computing with qubits"
        assert ds.queries.count() == 2
        assert ds.qrels.count() == 3

        idx = build_index(
            spark, ds.pages, str(tmp_path / "beir_idx"),
            IndexConfig(alpha=1.0, beta=1.0, build_compressed=False),
        )
        ranking = Q.retrieve(idx.postings, ds.queries, idx.params, idx.avgdl, k=4)
        per_q = {r["query_id"]: r["ndcg"] for r in ndcg_at_k(ranking, ds.qrels, k=4).collect()}
        # q2 retrieves its only relevant doc (d4) at rank 1 → NDCG 1.0;
        # q1 retrieves d1 (rel 2) but d3 shares no query term, so the
        # qrels-based ideal caps its NDCG below 1
        ndcgs = sorted(per_q.values())
        assert ndcgs[1] == pytest.approx(1.0)
        assert 0.6 < ndcgs[0] < 1.0
        assert mean_metric(ndcg_at_k(ranking, ds.qrels, k=4), "ndcg") > 0.8

    def test_external_id_round_trip(self, spark, tmp_path):
        ds = load_ir_dataset(spark, _write_beir_fixture(tmp_path))
        m = {r["ext_doc_id"]: r["doc_id"] for r in ds.doc_ids.collect()}
        assert sorted(m) == ["d1", "d2", "d3", "d4"]
        assert sorted(m.values()) == [0, 1, 2, 3]
        # qrels are keyed by the engine's long ids
        qr = ds.qrels.collect()
        assert all(isinstance(r["doc_id"], int) for r in qr)


class TestMultiFieldAppend:
    def test_add_documents_rebuilds_all_fields(self, spark, tmp_path):
        from bayesian_bm25_spark.operators import multi_field as MFO

        docs = spark.createDataFrame(
            [
                (0, "cats and dogs", "a long body about cats"),
                (1, "quantum physics", "qubits entangle"),
            ],
            "doc_id long, title string, body string",
        )
        idx = MFO.build_multi_field_index(
            spark, docs, ["title", "body"], str(tmp_path / "mf1"),
            config=IndexConfig(alpha=1.0, beta=1.0, build_compressed=False),
        )
        more = spark.createDataFrame(
            [(2, "gardening tips", "basil and thyme care")],
            "doc_id long, title string, body string",
        )
        idx2 = MFO.add_documents_multi_field(idx, more, str(tmp_path / "mf2"))
        assert all(fi.n_docs == 3 for fi in idx2.per_field.values())
        got = MFO.retrieve_multi_field(
            idx2, queries_to_df(spark, [["basil"]]), k=1
        ).collect()
        assert len(got) == 1 and got[0]["doc_id"] == 2

        # overlapping ids rejected
        clash = spark.createDataFrame(
            [(1, "x", "y")], "doc_id long, title string, body string"
        )
        with pytest.raises(ValueError, match="overlaps"):
            MFO.add_documents_multi_field(idx2, clash, str(tmp_path / "mf3"))

    def test_facade_add_documents(self, spark, tmp_path):
        from bayesian_bm25_spark.api import MultiFieldScorer

        s = MultiFieldScorer(
            ["title", "body"], spark=spark,
            index_path=str(tmp_path / "mfs"), alpha=1.0, beta=1.0,
            build_compressed=False,
        )
        s.index([
            {"title": ["cats"], "body": ["cats", "purr"]},
            {"title": ["dogs"], "body": ["dogs", "bark"]},
        ])
        s.add_documents([{"title": ["basil"], "body": ["basil", "soup"]}])
        ids, probs = s.retrieve([["basil"]], k=1)
        # rank is the contract; the absolute probability depends on the
        # auto-estimated α/β over this tiny corpus
        assert ids[0][0] == 2 and probs[0][0] > 0.0


class TestRenderers:
    def test_format_summary_golden(self):
        from bayesian_bm25_spark.operators.explain_traces import format_summary

        out = format_summary(
            "doc-7", {"BM25": 0.8123, "Vec": 0.6331}, 0.7421,
            method="log_odds", alpha=0.5,
        )
        assert out == "doc-7: BM25=0.812 Vec=0.633 -> Fused=0.742 (log_odds, alpha=0.5)"

    def test_format_comparison_golden(self, spark, six_traced):
        from bayesian_bm25_spark.operators.explain_traces import (
            compare_documents,
            format_comparison,
        )

        traced, docs = six_traced
        cmpres = compare_documents(traced, 0, docs[0], docs[1])
        text = format_comparison(cmpres)
        assert text.startswith(f"Comparison: {docs[0]} vs {docs[1]}")
        assert "Rank order:" in text
        assert "Dominant signal:" in text
        assert "<-- largest" in text
        # the fused row renders both probabilities
        assert f"{cmpres['prob_a']:.3f}" in text


@pytest.fixture(scope="module")
def six_traced(spark, tmp_path_factory):
    from bayesian_bm25_spark.operators.explain_traces import (
        retrieve_with_explanations,
    )
    from tests.conftest import SIX_DOCS

    pages = spark.createDataFrame(
        [(i, f"https://example.org/doc/{i}", t, "en") for i, t in enumerate(SIX_DOCS)],
        "doc_id long, url string, text string, lang string",
    )
    idx = build_index(
        spark, pages, str(tmp_path_factory.mktemp("idx_trace")),
        IndexConfig(base_rate="auto", build_compressed=False),
    )
    qdf = queries_to_df(spark, [["cat"]])
    scored = Q.with_probability(
        Q.topk(Q.score_queries(idx.postings, qdf), k=6), idx.params, idx.avgdl
    )
    traced = retrieve_with_explanations(scored, idx.params, idx.avgdl)
    docs = [r["doc_id"] for r in traced.orderBy("rank").collect()[:2]]
    return traced, docs


class TestPagesSource:
    def test_identifier_detection(self):
        from bayesian_bm25_spark.sources.pages_source import is_table_identifier

        assert is_table_identifier("iceberg_cat.web.pages")
        assert not is_table_identifier("/root/testdata/sf0.001/documents.parquet")
        assert not is_table_identifier("s3://bucket/pages")
        assert not is_table_identifier("pages.parquet")

    def test_parquet_branch_prunes_columns(self, spark, tmp_path):
        from bayesian_bm25_spark.sources.pages_source import read_pages
        from bayesian_bm25_spark.sources.webcorpus import generate_pages

        p = str(tmp_path / "pages.parquet")
        generate_pages(spark, 20, seed=1).withColumn(
            "junk", F.lit("x")
        ).write.parquet(p)
        df = read_pages(spark, p)
        assert "junk" not in df.columns and "url" in df.columns and "doc_id" in df.columns
        # projection reaches the parquet scan (column pruning)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "junk" not in plan.split("ReadSchema")[-1]

    def test_missing_text_rejected(self, spark, tmp_path):
        from bayesian_bm25_spark.sources.pages_source import read_pages

        p = str(tmp_path / "bad.parquet")
        spark.createDataFrame([(1, "u")], "a long, url string").write.parquet(p)
        with pytest.raises(ValueError, match="url\\+text"):
            read_pages(spark, p)


class TestPorter2:
    """Snowball English (Porter2) — the reference's BEIR-baseline
    stemmer (hybrid_beir.py:288-296).  Expectations derived from the
    published snowballstem.org spec: exception lists verbatim, plus
    hand-traced step outputs on Porter1-divergent words."""

    SPEC_EXCEPTIONS = {
        "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
        "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
        "early": "earli", "only": "onli", "singly": "singl",
        "sky": "sky", "news": "news", "atlas": "atlas", "bias": "bias",
        "andes": "andes", "cosmos": "cosmos", "howe": "howe",
        "inning": "inning", "outing": "outing", "canning": "canning",
        "herring": "herring", "earring": "earring",
        "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    }

    # Porter1 and Porter2 disagree on every one of these
    DIVERGENT = {
        "dying": ("dy", "die"),
        "news": ("new", "news"),
        "herring": ("her", "herring"),
        "gas": ("ga", "gas"),
        "ties": ("ti", "tie"),
        "say": ("sai", "say"),
        "enjoy": ("enjoi", "enjoy"),
        "cry": ("cry", "cri"),
        "generously": ("gener", "generous"),
        "generally": ("gener", "general"),
        "communal": ("commun", "communal"),
    }

    GRAMMAR = {
        # gener-/commun-/arsen- R1 exception: morphological families
        # keep distinct stems instead of collapsing to "gener"
        "generate": "generat", "generates": "generat",
        "generating": "generat", "general": "general",
        "generic": "generic", "generous": "generous",
        "communism": "communism", "arsenal": "arsenal",
        # steps 0-5 hand-traced
        "caresses": "caress", "ponies": "poni", "cries": "cri",
        "cats": "cat", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "failing": "fail", "filing": "file", "happy": "happi",
        "by": "by", "relational": "relat", "conditional": "condit",
        "rational": "ration", "valency": "valenc", "digitizer": "digit",
        "radically": "radic", "differently": "differ",
        "vileness": "vile", "analogously": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formality": "formal",
        "sensibility": "sensibl", "dependent": "depend",
        "replacement": "replac", "adjustable": "adjust",
        "adoption": "adopt",
    }

    def test_spec_exception_lists(self):
        from bayesian_bm25_spark.functions.stemmer import porter2_stem

        for w, exp in self.SPEC_EXCEPTIONS.items():
            assert porter2_stem(w) == exp, w

    def test_divergent_from_porter1(self):
        from bayesian_bm25_spark.functions.stemmer import (
            porter2_stem,
            porter_stem,
        )

        for w, (p1, p2) in self.DIVERGENT.items():
            assert porter_stem(w) == p1, w
            assert porter2_stem(w) == p2, w

    def test_grammar_cases(self):
        from bayesian_bm25_spark.functions.stemmer import porter2_stem

        for w, exp in self.GRAMMAR.items():
            assert porter2_stem(w) == exp, w

    def test_index_build_with_porter2(self, spark, tmp_path):
        from bayesian_bm25_spark.functions.stemmer import stem_terms

        texts = [
            "cats dying generously in the news",
            "dogs lying about their skies",
        ]
        pages = spark.createDataFrame(
            [(i, f"https://p2.test/{i}", t, "en") for i, t in enumerate(texts)],
            "doc_id long, url string, text string, lang string",
        )
        idx = build_index(
            spark, pages, str(tmp_path / "p2_idx"),
            IndexConfig(stemmer="porter2", alpha=1.0, beta=1.0, build_compressed=False),
        )
        terms = {r["term"] for r in idx.postings.select("term").distinct().collect()}
        assert {"cat", "die", "generous", "news", "lie", "sky"} <= terms
        assert "dying" not in terms and "new" not in terms
        qdf = stem_terms(
            queries_to_df(spark, [["dying", "generously"]]), algorithm="porter2"
        )
        got = Q.retrieve(idx.postings, qdf, idx.params, idx.avgdl, k=1).collect()
        assert len(got) == 1 and got[0]["doc_id"] == 0


class TestEmbeddingCache:
    """Content-addressed embedding cache (sources/embedding_cache):
    misses-only encoding, append-safe reuse, duplicate-text dedup —
    the Spark-native replacement for the reference's count-keyed .npz
    cache (hybrid_beir.py:303-373).  Encoder invocations happen on
    executors, so miss-only behavior is asserted two ways: cache-row
    growth (dedup + append deltas) and an exploding encoder on the
    fully-cached path."""

    @staticmethod
    def _docs(spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_cache_hit_skips_encoder_and_is_append_safe(self, spark, tmp_path):
        import numpy as np

        from bayesian_bm25_spark.sources.embedding_cache import (
            cached_embeddings,
            stub_encoder,
        )

        cache = str(tmp_path / "emb_cache")
        texts = ["alpha beta", "gamma delta", "alpha beta"]  # dup text
        enc = stub_encoder(dim=8)

        def cache_rows(tag):
            return (
                spark.read.parquet(cache)
                .where(f"model_tag = '{tag}'")
                .count()
            )

        out1 = cached_embeddings(
            spark, self._docs(spark, texts), cache, enc, "stub8"
        ).collect()
        assert len(out1) == 3
        assert cache_rows("stub8") == 2  # duplicate text encoded once

        def exploding(ts):
            raise AssertionError(f"encoder called on cached texts: {list(ts)}")

        out2 = {
            r["doc_id"]: r["embedding"]
            for r in cached_embeddings(
                spark, self._docs(spark, texts), cache, exploding, "stub8"
            ).collect()
        }
        assert len(out2) == 3
        e1 = {r["doc_id"]: r["embedding"] for r in out1}
        for k in e1:
            assert np.allclose(e1[k], out2[k])
        assert cache_rows("stub8") == 2  # hit path appended nothing

        # append: one new text -> exactly one new cache row
        out3 = cached_embeddings(
            spark,
            self._docs(spark, texts + ["epsilon zeta"]),
            cache,
            enc,
            "stub8",
        ).collect()
        assert len(out3) == 4
        assert cache_rows("stub8") == 3

        # a different model_tag is a separate partition: its own rows
        cached_embeddings(
            spark, self._docs(spark, ["alpha beta"]), cache, enc, "other"
        ).collect()
        assert cache_rows("other") == 1
        assert cache_rows("stub8") == 3
