"""Vector calibration (vs reference numpy), similarity search, dedup,
text analysis."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayesian_bm25_spark.kernel.vector_calibrate import (
    VectorProbabilityTransform,
    detect_gap,
    distance_density_weights,
    gap_weights,
    gaussian_pdf,
    ivf_density_prior,
    kernel_density,
    knn_density_prior,
    sharpen_weights,
    silverman_bandwidth,
)
from bayesian_bm25_spark.operators import dedup as DD
from bayesian_bm25_spark.operators import similarity as SIM
from bayesian_bm25_spark.operators import text_analysis as TA
from bayesian_bm25_spark.operators import vector_ops as VO


class TestVectorKernelReferenceParity:
    def ref_vpt(self, ref):
        import bayesian_bm25.vector_probability as rvp

        return rvp

    def test_pdf_bandwidth_kde_bitwise(self, ref):
        rvp = self.ref_vpt(ref)
        rng = np.random.default_rng(42)
        x = rng.normal(0.8, 0.15, 500)
        w = rng.uniform(0, 1, 500)
        np.testing.assert_array_equal(gaussian_pdf(x, 0.8, 0.15), rvp._gaussian_pdf(x, 0.8, 0.15))
        assert silverman_bandwidth(x, w) == rvp._silverman_bandwidth(x, w)
        e = np.linspace(0.2, 1.4, 50)
        np.testing.assert_array_equal(
            kernel_density(e, x, w, 0.1), rvp._kernel_density(e, x, w, 0.1)
        )

    def test_gap_and_weights_bitwise(self, ref):
        rvp = self.ref_vpt(ref)
        t_ref = rvp.VectorProbabilityTransform(0.8, 0.15)
        # FIXTURES.md F7 gap sample (README.md:190)
        gap_sample = np.array([0.10, 0.15, 0.20, 0.50, 0.75, 0.80, 0.85])
        assert detect_gap(gap_sample) == t_ref._detect_gap(gap_sample)
        np.testing.assert_array_equal(gap_weights(gap_sample), t_ref._gap_weights(gap_sample))
        rng = np.random.default_rng(1)
        smooth = rng.normal(0.8, 0.05, 100)
        assert detect_gap(smooth) == t_ref._detect_gap(smooth)
        w = rng.uniform(0.4, 0.6, 50)
        np.testing.assert_array_equal(sharpen_weights(w), t_ref._sharpen_weights(w))
        d = rng.uniform(0.1, 1.5, 50)
        np.testing.assert_array_equal(
            distance_density_weights(d), t_ref._distance_density_weights(d)
        )

    def test_calibrate_all_methods_bitwise(self, ref):
        rvp = self.ref_vpt(ref)
        rng = np.random.default_rng(42)
        bg = rng.normal(0.8, 0.15, 10000)
        theirs = rvp.VectorProbabilityTransform.fit_background(bg, base_rate=0.05)
        ours = VectorProbabilityTransform.fit_background(bg, base_rate=0.05)
        assert ours.mu_G == theirs.mu_G and ours.sigma_G == theirs.sigma_G
        for dists in (
            rng.uniform(0.1, 1.2, 200),  # smooth, large
            np.array([0.10, 0.15, 0.20, 0.50, 0.75, 0.80, 0.85]),  # gap, small
            np.concatenate([rng.uniform(0.1, 0.3, 60), rng.uniform(0.7, 1.2, 60)]),  # gap, large
        ):
            w = rng.uniform(0, 1, len(dists))
            for method in ("auto", "kde", "gmm"):
                np.testing.assert_allclose(
                    ours.calibrate(dists, method=method),
                    theirs.calibrate(dists, method=method),
                    rtol=1e-12,
                    err_msg=f"{method} len={len(dists)}",
                )
                np.testing.assert_allclose(
                    ours.calibrate(dists, weights=w, method=method),
                    theirs.calibrate(dists, weights=w, method=method),
                    rtol=1e-12,
                )
        # eval/sample decoupling
        ev = rng.uniform(0.2, 1.0, 30)
        smp = rng.uniform(0.1, 1.2, 150)
        np.testing.assert_allclose(
            ours.calibrate_with_sample(ev, smp),
            theirs.calibrate_with_sample(ev, smp),
            rtol=1e-12,
        )

    def test_density_priors_bitwise(self, ref):
        rvp = self.ref_vpt(ref)
        # FIXTURES.md F7: (pop=150, avg=100), (kth=0.5, median=0.8)
        assert ivf_density_prior(150, 100.0) == rvp.ivf_density_prior(150, 100.0)
        assert knn_density_prior(0.5, 0.8) == rvp.knn_density_prior(0.5, 0.8)
        pops = np.array([10, 100, 1000])
        np.testing.assert_array_equal(
            ivf_density_prior(pops, 100.0), rvp.ivf_density_prior(pops, 100.0)
        )


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


class TestSimilaritySearch:
    def test_ivf_recall_vs_brute_force(self, spark, emb_df):
        import pandas as pd

        pdf = emb_df.toPandas()
        mat = np.stack(pdf["embedding"].to_numpy())
        centroids = SIM.train_centroids(mat, n_cells=8, seed=42)
        assigned = SIM.assign_cells(emb_df, centroids)
        queries = [(int(r.vec_id), np.array(r.embedding)) for r in
                   pdf.head(3).itertuples()]
        got = SIM.ivf_search(assigned, centroids, queries, k=5, nprobe=8)
        qdf = spark.createDataFrame(
            [(q, [float(x) for x in v]) for q, v in queries],
            "query_id long, q_emb array<float>",
        )
        exact = SIM.brute_force_topk(emb_df, qdf, k=5)
        # probing ALL cells == exact search
        g = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
        e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
        assert g == e

    def test_ivf_partial_probe_recall(self, spark, emb_df):
        pdf = emb_df.toPandas()
        mat = np.stack(pdf["embedding"].to_numpy())
        centroids = SIM.train_centroids(mat, n_cells=16, seed=42)
        assigned = SIM.assign_cells(emb_df, centroids).cache()
        queries = [(int(r.vec_id), np.array(r.embedding)) for r in pdf.head(5).itertuples()]
        got = SIM.ivf_search(assigned, centroids, queries, k=5, nprobe=4)
        qdf = spark.createDataFrame(
            [(q, [float(x) for x in v]) for q, v in queries],
            "query_id long, q_emb array<float>",
        )
        exact = SIM.brute_force_topk(emb_df, qdf, k=5)
        inter = got.select("query_id", "vec_id").intersect(
            exact.select("query_id", "vec_id")
        )
        recall = inter.count() / exact.count()
        assert recall >= 0.5  # nprobe=4/16 cells; self-vector always found

    def test_cell_stats_and_prior(self, spark, emb_df):
        pdf = emb_df.toPandas()
        centroids = SIM.train_centroids(np.stack(pdf["embedding"].to_numpy()), n_cells=8)
        assigned = SIM.assign_cells(emb_df, centroids)
        stats = SIM.cell_stats(assigned)
        total = stats.agg(F.sum("population")).collect()[0][0]
        assert total == emb_df.count()
        avg_pop = total / stats.count()
        with_prior = VO.with_ivf_density_prior(stats, avg_pop)
        rows = with_prior.collect()
        for r in rows:
            expect = ivf_density_prior(r["population"], avg_pop)
            assert r["density_prior"] == pytest.approx(expect, rel=1e-9)

    def test_lsh_buckets_deterministic(self, spark, emb_df):
        b1 = SIM.hyperplane_lsh_buckets(emb_df, 64, n_bits=8, seed=42)
        b2 = SIM.hyperplane_lsh_buckets(emb_df, 64, n_bits=8, seed=42)
        assert b1.select("vec_id", "lsh_bucket").collect() == b2.select("vec_id", "lsh_bucket").collect()


class TestVectorOpsSpark:
    def test_calibrate_per_query_matches_kernel(self, spark, emb_df):
        import pandas as pd

        pdf = emb_df.limit(3).toPandas()
        queries = spark.createDataFrame(
            [(int(r.vec_id), [float(x) for x in r.embedding]) for r in pdf.itertuples()],
            "query_id long, q_emb array<float>",
        )
        dists = VO.distances_from_embeddings(emb_df, queries)
        vpt = VO.fit_background(dists)
        got = VO.calibrate_per_query(dists, vpt).toPandas()
        for qid, g in got.groupby("query_id"):
            g = g.sort_values("vec_id")
            expect = vpt.calibrate(g["distance"].to_numpy())
            np.testing.assert_allclose(g["vector_prob"].to_numpy(), expect, rtol=1e-9)

    def test_calibrate_per_query_gmm_bitwise_vs_driver(self, spark, emb_df):
        """Forced-GMM path: the distributed applyInPandas EM must equal
        driver-numpy EM on the identical collected candidate arrays
        BITWISE (same float64 code path; Arrow round-trips doubles
        exactly) — the golden for the per-query EM stage of the
        rows-only vector_calibrated_topk entry (reference
        vector_probability.py:296-431)."""
        pdf = emb_df.limit(4).toPandas()
        queries = spark.createDataFrame(
            [(int(r.vec_id), [float(x) for x in r.embedding]) for r in pdf.itertuples()],
            "query_id long, q_emb array<float>",
        )
        dists = VO.distances_from_embeddings(emb_df, queries)
        vpt = VO.fit_background(dists, base_rate=0.05)
        got = VO.calibrate_per_query(dists, vpt, method="gmm").toPandas()
        for qid, g in got.groupby("query_id"):
            g = g.sort_values("vec_id")
            expect = vpt.calibrate(g["distance"].to_numpy(), method="gmm")
            np.testing.assert_array_equal(g["vector_prob"].to_numpy(), expect)

    def test_vector_calibrated_topk_entry_golden(self, spark):
        """End-to-end golden for the vector-calibration driver entry:
        rebuild its exact top-10 on the driver (numpy EM on collected
        round-9 distances — the entry's cross-engine determinism
        contract — rank by round-6 prob DESC / vec_id ASC) and require
        identical rows."""
        from bayesian_bm25_spark.entry_queries import SPARK_QUERIES

        sf = "/root/testdata/sf0.001"
        got = [
            (r["query_id"], r["rank"], r["vec_id"], r["vprob_r"])
            for r in SPARK_QUERIES["vector_calibrated_topk"](spark, sf).collect()
        ]

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        dists = VO.distances_from_embeddings(emb, queries).withColumn(
            "distance", F.round("distance", 9)
        )
        vpt = VO.fit_background(dists, base_rate=0.05)
        pdf = dists.toPandas()
        expect = []
        for qid, g in pdf.groupby("query_id", sort=True):
            g = g.sort_values("vec_id")
            probs = np.atleast_1d(vpt.calibrate(g["distance"].to_numpy()))
            order = np.lexsort((g["vec_id"].to_numpy(), -np.round(probs, 6)))[:10]
            for rank, i in enumerate(order, start=1):
                expect.append(
                    (int(qid), rank, int(g["vec_id"].to_numpy()[i]),
                     round(float(probs[i]), 6))
                )
        assert sorted(got) == sorted(expect)


class TestDedup:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "The quick  brown fox jumps over the lazy dog"),  # case/ws dup of 0
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
            (3, "completely different text about spark engines"),
            (4, "completely different text about spark engines"),  # exact dup of 3
            (5, "unrelated short doc"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_duplicates(self, docs):
        # canonical form: one fixed-width row per duplicate member (no
        # collect_list — a 10^8-way dup group stays many narrow rows)
        rows = DD.exact_duplicates(docs).collect()
        by_canon = {}
        for r in rows:
            by_canon.setdefault(r["canonical_id"], set()).add(r["doc_id"])
            assert r["n_docs"] == 2
        assert by_canon == {0: {0, 1}, 3: {3, 4}}

    def test_bucket_cap_drops_hot_bucket(self, spark):
        # one viral bucket (>cap) must be excluded, with the drop recorded
        rows = [(i, "hot") for i in range(10)] + [(100, "cold"), (101, "cold")]
        df = spark.createDataFrame(rows, "doc_id long, bucket string")
        kept, dropped = DD.cap_bucket_size(df, ["bucket"], cap=5)
        assert {r["bucket"] for r in kept.collect()} == {"cold"}
        d = dropped.collect()
        assert len(d) == 1 and d[0]["bucket"] == "hot" and d[0]["bucket_size"] == 10

    def test_minhash_lsh_finds_near_dups(self, docs):
        pairs = {(r["a"], r["b"]) for r in DD.minhash_lsh_pairs(docs).collect()}
        assert (0, 1) in pairs
        assert (3, 4) in pairs
        assert (0, 2) in pairs  # 8/10 shared shingles → some band collides

    def test_jaccard_verify(self, docs):
        sh = DD.shingles(docs)
        pairs = DD.minhash_lsh_pairs(docs)
        verified = {(r["a"], r["b"]): r["jaccard"] for r in
                    DD.jaccard_verify(sh, pairs, threshold=0.5).collect()}
        assert verified[(0, 1)] == pytest.approx(1.0)
        assert verified[(3, 4)] == pytest.approx(1.0)
        assert 0.5 <= verified[(0, 2)] < 1.0

    def test_simhash_near_dups_close(self, docs):
        fps = {r["doc_id"]: r["simhash"] for r in DD.simhash64(docs).collect()}
        def hamming(a, b):
            return bin(a ^ b).count("1")
        assert hamming(fps[0], fps[1]) == 0  # identical after normalization
        assert hamming(fps[0], fps[2]) < hamming(fps[0], fps[3])

    def test_simhash_multiprobe_recovers_top_window_diffs(self, spark):
        """A pair differing ONLY inside the top 16-bit window is missed
        by single-probe blocking but found by multi-probe (a lower
        window is clean) — the dedup.py multi-probe contract."""
        base = 0x3A5A_5A5A_5A5A_5A5A
        rows = [
            (0, base),
            (1, base ^ (1 << 60)),   # differs in the TOP window only
            (2, base ^ (1 << 5)),    # differs in the BOTTOM window only
            (3, 0x0123_4567_89AB_CDEF),  # unrelated
        ]
        fp = spark.createDataFrame(rows, "doc_id long, simhash long")
        single = {(r["a"], r["b"]) for r in DD.simhash_candidates(fp).collect()}
        assert (0, 1) not in single          # top-window diff → missed
        assert (0, 2) in single              # top window identical → found
        multi = {
            (r["a"], r["b"])
            for r in DD.simhash_candidates(fp, prefix_bits=15, n_probes=4).collect()
        }
        # default prefix_bits resolves to 63 // n_probes = 15 for
        # multi-probe — identical pair set, no ValueError
        auto = {
            (r["a"], r["b"])
            for r in DD.simhash_candidates(fp, n_probes=4).collect()
        }
        assert auto == multi
        assert (0, 1) in multi               # recovered by a lower window
        assert (0, 2) in multi
        assert (1, 2) in multi               # Hamming 2, disjoint windows
        assert not any(3 in p for p in multi)

    def test_simhash_multiprobe_overlap_rejected(self, spark):
        """Windows must fit the 63 usable bits — overlapping (clamped)
        windows silently weaken the recall guarantee, so they raise."""
        fp = spark.createDataFrame([(0, 1)], "doc_id long, simhash long")
        with pytest.raises(ValueError, match="63 usable"):
            DD.simhash_candidates(fp, prefix_bits=16, n_probes=4)
        with pytest.raises(ValueError, match="prefix_bits"):
            DD.simhash_candidates(fp, prefix_bits=64)

    def test_embedding_near_dups(self, spark):
        rng = np.random.default_rng(42)
        base = rng.normal(0, 1, 16)
        rows = [
            (0, [float(x) for x in base]),
            (1, [float(x) for x in base + rng.normal(0, 0.01, 16)]),  # near-dup
            (2, [float(x) for x in rng.normal(0, 1, 16)]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        dups = {(r["a"], r["b"]) for r in DD.embedding_near_dups(emb, threshold=0.95).collect()}
        assert (0, 1) in dups
        assert (0, 2) not in dups


class TestTextAnalysis:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "the cat sat on the mat with a hat for the dog"),
            (1, "el perro y el gato en la casa de los vecinos se fue por la paz"),
            (2, "zzz qqq www eee rrr"),
            (3, "1234 5678 !!! ???"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_language_id(self, docs):
        got = {r["doc_id"]: r["lang_pred"] for r in TA.language_id(docs).collect()}
        assert got[0] == "en"
        assert got[1] == "es"
        assert got[2] == "und"

    def test_quality_features(self, docs):
        rows = {r["doc_id"]: r for r in TA.quality_features(docs).collect()}
        assert rows[0]["quality_score"] > rows[3]["quality_score"]
        assert rows[3]["digit_ratio"] > 0.3
        assert 0.0 <= rows[0]["quality_score"] <= 1.0

    def test_token_counts(self, docs):
        rows = {r["doc_id"]: r for r in TA.token_counts(docs).collect()}
        assert rows[0]["ws_tokens"] == 12
        assert rows[0]["bpe_est"] >= rows[0]["ws_tokens"]  # short words → ≥1 unit each

    def test_fingerprint_stable_under_whitespace(self, spark):
        docs = spark.createDataFrame(
            [(0, "Hello   World Foo"), (1, "hello world foo")], "doc_id long, text string"
        )
        fps = [r["fp"] for r in TA.fingerprint(docs).collect()]
        assert fps[0] == fps[1]


class TestConnectedComponents:
    def test_chain_and_isolated_cluster(self, spark):
        # chain 1-2-3-4 (min label must propagate the full diameter)
        # plus a separate pair (10, 11)
        pairs = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
        )
        got = {
            r["node"]: r["component"]
            for r in DD.connected_components(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_path_converges(self, spark):
        # path of 12 nodes: worst-case diameter for label propagation
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(11)], "a long, b long"
        )
        got = {
            r["node"]: r["component"]
            for r in DD.connected_components(pairs).collect()
        }
        assert set(got.values()) == {0} and len(got) == 12
