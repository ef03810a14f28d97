"""Golden tests: the pure-Python XXH64 replica vs Spark's F.xxhash64.

The driver-side bucket pruning (query.prune_query_terms_buckets with
``driver_terms``) is only sound if functions/xxhash.py reproduces
Spark's hash bit-for-bit — including the UTF-8 encoding, the signed
view, and pmod semantics."""

import random
import string

from pyspark.sql import functions as F

from bayesian_bm25_spark.functions.xxhash import term_bucket, xxhash64_signed


def test_xxhash64_matches_spark(spark):
    # edge lengths around every block boundary of the algorithm
    # (0, <8, 8, <32, 32, >32) plus multi-byte UTF-8
    terms = [
        "", "a", "the", "café", "日本語テキスト", "x" * 7, "y" * 8,
        "z" * 31, "w" * 32, "v" * 33, "u" * 100, "hello world",
    ]
    rng = random.Random(42)
    alphabet = string.ascii_lowercase + string.digits + "éüß日本-_"
    terms += [
        "".join(rng.choices(alphabet, k=rng.randint(1, 80))) for _ in range(300)
    ]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(32)).alias("b"),
    )
    for r in df.collect():
        assert xxhash64_signed(r["term"]) == r["h"], repr(r["term"])
        assert term_bucket(r["term"], 32) == r["b"], repr(r["term"])


def test_driver_terms_prune_matches_job_prune(spark, tmp_path):
    """The driver-computed bucket set must equal the Spark-job-computed
    one for the same query batch (same pruned plan either way)."""
    from bayesian_bm25_spark.operators import query as Q

    n_buckets = 8
    terms = ["alpha", "bravo", "charlie", "delta", "echo"]
    postings = spark.createDataFrame(
        [(t, 0, 1.0, 10, pb) for t in ["alpha", "zulu", "mike"]
         for pb in [0]],
        "term string, doc_id long, impact double, doc_len long, _x int",
    ).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    ).drop("_x")
    qdf = spark.createDataFrame(
        [(0, terms)], "query_id long, terms array<string>"
    )
    qt = Q.query_terms(qdf)
    via_job = Q.prune_query_terms_buckets(postings, qt, n_buckets)
    via_driver = Q.prune_query_terms_buckets(
        postings, qt, n_buckets, driver_terms=terms
    )
    rows_job = {(r["term"], r["doc_id"]) for r in via_job.collect()}
    rows_driver = {(r["term"], r["doc_id"]) for r in via_driver.collect()}
    assert rows_job == rows_driver
