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

Skew guards: every bucket self-join in the ladder goes through
``cap_bucket_size`` — one boilerplate page duplicated 10^8 times (or one
degenerate LSH bucket) otherwise turns a candidate join O(size²) inside
a single task.  Dropped buckets are returned as a lazy DataFrame for
logging/auditing, never silently discarded without a trace.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C

#: default per-bucket population cap for candidate self-joins.  A bucket
#: at the cap contributes ~cap²/2 candidate pairs in one task — 5000 →
#: 12.5M pairs ≈ a few hundred MB, the largest single task we accept.
DEFAULT_BUCKET_CAP = 5000


def normalize_text_col(text: F.Column) -> F.Column:
    """Dedup normalization: lowercase, collapse whitespace."""
    return F.concat_ws(" ", C.tokenize(text))


def cap_bucket_size(
    df: DataFrame, keys: list[str], cap: int
) -> tuple[DataFrame, DataFrame]:
    """Skew guard for bucket self-joins: drop rows in over-populated
    buckets.  Returns ``(kept, dropped_buckets)`` where dropped_buckets
    is a lazy (keys..., bucket_size) DataFrame the caller can count/log
    — truncation is recorded, not silent.

    At 100 TB the sizes table is |distinct buckets| rows (tiny next to
    the data) and AQE broadcast-joins it back.
    """
    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("bucket_size"))
    kept = df.join(sizes.where(F.col("bucket_size") <= cap), keys).drop("bucket_size")
    dropped = sizes.where(F.col("bucket_size") > cap)
    return kept, dropped


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text_hash, canonical_id, n_docs) for every doc in a
    duplicate group (>1 member); canonical_id = min doc_id of the group.

    One hash-shuffle, fixed row width: a boilerplate page duplicated
    10^8× yields 10^8 narrow rows spread across tasks — never one giant
    array row (the ``collect_list`` anti-pattern).  Keep-set = rows where
    doc_id == canonical_id; drop-set = the rest.
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text_col(F.col(text_col))).alias("text_hash"),
    )
    w = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .where(F.col("n_docs") > 1)
        .select("doc_id", "text_hash", "canonical_id", "n_docs")
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle): distinct n-token shingles per doc.  Docs with
    fewer than ``n`` tokens produce no shingles."""
    tokens = C.tokenize(F.col(text_col))
    sh = F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
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
                      rows_per_band: int = 2, text_col: str = "text",
                      max_bucket_size: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """(a, b) candidate near-dup pairs sharing at least one LSH band.

    Buckets above ``max_bucket_size`` are excluded from the self-join
    (skew guard); at web scale a degenerate bucket (empty pages, boiler-
    plate) would otherwise put O(size²) pairs in one task.  Members of a
    dropped bucket can still pair through their other bands."""
    bands = lsh_bands(minhash_signatures(shingles(docs, n, text_col), n_hashes),
                      n_hashes, rows_per_band)
    if max_bucket_size is not None:
        bands, _ = cap_bucket_size(bands, ["band", "bucket"], max_bucket_size)
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

    Each shingle votes its md5's top-64 bits ±1; the sign pattern of the
    per-bit sums is the fingerprint (top bit cleared so it fits a signed
    long).

    ZERO-shuffle plan: ``shingles`` is an explode — a narrow op — so
    every doc's shingle rows are already CONTIGUOUS inside one
    partition.  The fold is ``mapInPandas`` over those contiguous runs
    (``_run_grouped`` carries batch-spanning tails), replacing the old
    ``groupBy(doc_id).collect_list`` which shuffled every shingle hash
    across the cluster.  At web scale that shuffle is ~8 bytes ×
    shingles ≈ the corpus token count — eliminating it makes the
    fingerprint pass scan-bound.  Requires ``docs`` to carry one row
    per doc_id (true for every corpus table here); the md5/unhex
    projections preserve intra-partition row order."""
    import pandas as pd  # noqa: F401

    from bayesian_bm25_spark.operators.index_build import _run_grouped

    sh = shingles(docs, n, text_col)
    hashed = sh.select(
        "doc_id", F.unhex(F.substring(F.md5("shingle"), 1, 16)).alias("h8")
    )

    def fold(batches):
        def flush(g: dict) -> dict:
            hs = g["h8"]
            blob = b"".join(bytes(h) for h in hs)
            bits = np.unpackbits(
                np.frombuffer(blob, dtype=np.uint8).reshape(-1, 8), axis=1
            )
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(hs)
            fp = int(np.packbits(votes > 0).view(">u8")[0])
            return {
                "doc_id": int(g["doc_id"][0]),
                "simhash": fp & 0x7FFFFFFFFFFFFFFF,
            }

        yield from _run_grouped(batches, ["doc_id"], flush)

    return hashed.mapInPandas(fold, schema="doc_id long, simhash long")


def simhash_candidates(fp: DataFrame, prefix_bits: int | None = None,
                       n_probes: int = 1,
                       max_bucket_size: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """(a, b) pairs sharing a ``prefix_bits`` window of the SimHash in
    at least one of ``n_probes`` probe positions.

    Multi-probe blocking (the Manku-style rotated-block scheme): probe
    ``p`` blocks on the ``prefix_bits``-wide window starting
    ``p · prefix_bits`` below bit 62 (only 63 bits are usable — the top
    bit is cleared so the fingerprint fits a signed long).  The windows
    are DISJOINT, so by pigeonhole a pair within Hamming distance
    ``n_probes - 1`` always has at least one window free of differing
    bits → guaranteed a shared block key.  (Differing bits BELOW the
    covered span leave every window clean — harmless for recall.)
    With the defaults for multi-probe use, 4×15-bit windows guarantee
    Hamming ≤ 3.  Single-probe (default) blocks on the top window only
    and misses pairs whose differing bits happen to land there.

    ``n_probes · prefix_bits`` must fit the 63 usable bits — overlapping
    (clamped) windows would silently weaken the guarantee and duplicate
    self-join work, so that's an error, not a fallback.

    Rows explode to ``n_probes`` (probe-tagged) block keys; the bucket
    cap applies per (probe, block), so the self-join blow-up stays
    bounded per probe.  Over-populated blocks are excluded (skew guard,
    see ``cap_bucket_size``)."""
    n_probes = max(1, n_probes)
    if prefix_bits is None:
        # widest disjoint windows the probe count allows: 16 bits for
        # single-probe (the historical default), 63 // n_probes for
        # multi-probe — so callers asking for n_probes=4 get the 4x15
        # guaranteed-Hamming<=3 layout without computing bit budgets
        prefix_bits = 16 if n_probes == 1 else 63 // n_probes
    if not 1 <= prefix_bits <= 63:
        raise ValueError("prefix_bits must be in [1, 63]")
    if n_probes * prefix_bits > 63:
        raise ValueError(
            f"n_probes * prefix_bits = {n_probes * prefix_bits} exceeds the "
            "63 usable SimHash bits — windows would overlap and the "
            "Hamming-distance recall guarantee would not hold (use e.g. "
            "4 probes x 15 bits)"
        )
    mask = (1 << prefix_bits) - 1
    blocks = F.array(
        *[
            (
                F.shiftright(
                    F.col("simhash"), 63 - prefix_bits * (p + 1)
                ).bitwiseAND(F.lit(mask))
                + F.lit(p * (mask + 1))
            ).cast("long")
            for p in range(n_probes)
        ]
    )
    shifted = fp.withColumn("block", F.explode(blocks))
    if max_bucket_size is not None:
        shifted, _ = cap_bucket_size(shifted, ["block"], max_bucket_size)
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
                        emb_col: str = "embedding", id_col: str = "vec_id",
                        max_bucket_size: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """(a, b, cos) semantic near-dups: LSH-bucket candidates + exact
    cosine verify ≥ threshold.  The bucket join keeps the pair blow-up
    ~O(N·bucket_size) instead of O(N²); buckets above ``max_bucket_size``
    are excluded (skew guard).  Bucketing is pure Column math (double
    precision, JVM codegen) so it is SQL-oracle-checkable."""
    from bayesian_bm25_spark.operators.similarity import (
        hyperplane_lsh_buckets,
        lsh_candidate_pairs,
    )

    dim = len(embeddings.select(emb_col).first()[0])
    bucketed = hyperplane_lsh_buckets(embeddings, dim, n_bits=n_bits, seed=seed, emb_col=emb_col)
    pairs = lsh_candidate_pairs(bucketed, id_col=id_col, max_bucket_size=max_bucket_size)
    a_emb = embeddings.select(F.col(id_col).alias("a"), F.col(emb_col).alias("emb_a"))
    b_emb = embeddings.select(F.col(id_col).alias("b"), F.col(emb_col).alias("emb_b"))
    return (
        pairs.join(a_emb, "a")
        .join(b_emb, "b")
        .withColumn("cos", C.cosine_similarity(F.col("emb_a"), F.col("emb_b")))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) — resolve candidate/duplicate PAIRS into GROUPS:
    component = min doc_id reachable in the pair graph (the canonical
    representative), so keep-set = rows where node == component.

    Distributed min-label propagation: each round every node takes the
    min label over itself and its neighbors — one join + one aggregation
    per round, converging in O(graph diameter) rounds (dup clusters are
    near-cliques from bucket joins, so diameter is 2-3 in practice; the
    loop early-stops on a converged round and ``localCheckpoint`` cuts
    the lineage so plans don't grow with iterations).  At web scale the
    work is proportional to the EDGE table (candidate pairs), which the
    bucket caps already bound — never to the corpus.
    """
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    )
    edges = edges.union(
        pairs.select(F.col(b_col).cast("long").alias("src"), F.col(a_col).cast("long").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        neigh = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("neigh_min"))
        )
        # checkpoint the JOINED frame (old label + neighbor min side by
        # side) so the convergence probe doubles as the materialization:
        # the LAZY localCheckpoint is computed by the count job itself
        # (one job per round, not materialize + count), and later reads
        # (next round's join, the returned labels) hit the stored blocks
        joined = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                "node",
                "component",
                F.coalesce("neigh_min", F.col("component")).alias("neigh_min"),
            )
            .localCheckpoint(eager=False)
        )
        changed = joined.where(F.col("neigh_min") < F.col("component")).count()
        labels = joined.select(
            "node", F.least("component", "neigh_min").alias("component")
        )
        if changed == 0:
            converged = True
            break
    if not converged:
        # a chain longer than max_iterations would come back split —
        # keep/drop decisions on node == component would KEEP duplicates
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            "iterations; components may be split (raise max_iterations)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
