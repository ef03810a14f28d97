"""Deduplication operators for web-scale training-data pipelines.

Five tiers, cheapest-first — the standard dedup ladder for a 100 TB
corpus:

1. exact:            hash-groupBy on normalized text (one shuffle)
2. MinHash + LSH:    shingle → k minhashes → banded buckets → bucket
                     join → exact-Jaccard verify (candidates only)
3. SimHash:          64-bit near-dup fingerprint; same-bucket or
                     Hamming-≤t candidates
4. n-gram Jaccard:   exact verification metric (used by tier 2)
5. embedding cosine: semantic near-dup via LSH buckets + cosine verify

MinHash uses md5-based permutations (min over md5(k|shingle)) so the
signatures are engine-independent and SQL-checkable; SimHash folds the
md5 of each shingle into 64 bits.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C


def normalize_text_col(text: F.Column) -> F.Column:
    """Dedup normalization: lowercase, collapse whitespace."""
    return F.concat_ws(" ", C.tokenize(text))


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_docs, doc_ids) for groups with more than one doc.
    One hash-groupBy; at 10^12 rows this is the cheapest possible pass."""
    return (
        docs.select(F.col(id_col), F.md5(normalize_text_col(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle): distinct n-token shingles per doc."""
    tokens = C.tokenize(F.col(text_col))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = 8) -> DataFrame:
    """(doc_id, mh0..mh{k-1}): k-th minhash = min(md5(k|shingle)).

    md5 hex compares lexicographically the same in every engine, making
    the signature portable (and SQL-oracle-checkable)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}|"), F.col("shingle")))).alias(f"mh{k}")
        for k in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig: DataFrame, n_hashes: int = 8, rows_per_band: int = 2) -> DataFrame:
    """(doc_id, band, bucket): banded LSH buckets over the signature."""
    frames = []
    for band in range(n_hashes // rows_per_band):
        cols = [F.col(f"mh{band * rows_per_band + r}") for r in range(rows_per_band)]
        frames.append(
            sig.select(
                "doc_id",
                F.lit(band).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, n_hashes: int = 8,
                      rows_per_band: int = 2, text_col: str = "text") -> DataFrame:
    """(a, b) candidate near-dup pairs sharing at least one LSH band."""
    bands = lsh_bands(minhash_signatures(shingles(docs, n, text_col), n_hashes),
                      n_hashes, rows_per_band)
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (the verify stage of
    the MinHash ladder): (a, b, jaccard) with jaccard ≥ threshold."""
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col("doc_id").alias("a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        pairs.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(counts.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(counts.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash64(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over shingle md5s.

    Each shingle votes its md5's 64 bits ±1; the sign pattern of the
    per-bit sums is the fingerprint.  Vectorized per Arrow batch."""
    import pandas as pd

    sh = shingles(docs, n, text_col)
    hashed = sh.select(
        "doc_id", F.unhex(F.substring(F.md5("shingle"), 1, 16)).alias("h8")
    )
    grouped = hashed.groupBy("doc_id").agg(F.collect_list("h8").alias("hashes"))

    def fold(batches):
        for pdf in batches:
            out = []
            for doc_id, hs in zip(pdf["doc_id"], pdf["hashes"]):
                arr = np.frombuffer(b"".join(bytes(h) for h in hs), dtype=np.uint8)
                bits = np.unpackbits(arr.reshape(-1, 8), axis=1)
                votes = bits.sum(axis=0) * 2 - len(hs)
                fp = 0
                for b in votes > 0:
                    fp = (fp << 1) | int(b)
                out.append({"doc_id": int(doc_id), "simhash": np.int64(np.uint64(fp) & np.uint64(0x7FFFFFFFFFFFFFFF)).item()})
            yield pd.DataFrame(out)

    return grouped.mapInPandas(fold, schema="doc_id long, simhash long")


def simhash_candidates(fp: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """(a, b) pairs sharing the top ``prefix_bits`` of the SimHash — the
    blocked candidate generation (rotate the prefix for multi-probe)."""
    shifted = fp.withColumn("block", F.shiftright(F.col("simhash"), 63 - prefix_bits))
    left = shifted.alias("l")
    right = shifted.alias("r")
    return (
        left.join(right, "block")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        n_bits: int = 12, seed: int = 42,
                        emb_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(a, b, cos) semantic near-dups: LSH-bucket candidates + exact
    cosine verify ≥ threshold.  The bucket join keeps the pair blow-up
    ~O(N·bucket_size) instead of O(N²)."""
    from bayesian_bm25_spark.operators.similarity import (
        hyperplane_lsh_buckets,
        lsh_candidate_pairs,
    )

    dim = len(embeddings.select(emb_col).first()[0])
    bucketed = hyperplane_lsh_buckets(embeddings, dim, n_bits=n_bits, seed=seed, emb_col=emb_col)
    pairs = lsh_candidate_pairs(bucketed, id_col=id_col)
    a_emb = embeddings.select(F.col(id_col).alias("a"), F.col(emb_col).alias("emb_a"))
    b_emb = embeddings.select(F.col(id_col).alias("b"), F.col(emb_col).alias("emb_b"))
    return (
        pairs.join(a_emb, "a")
        .join(b_emb, "b")
        .withColumn("cos", C.cosine_similarity(F.col("emb_a"), F.col("emb_b")))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
