"""Similarity search over embedding columns: brute-force cosine top-k,
IVF (k-means cells) for the scale path, and random-hyperplane LSH
bucketing.

Reference analog: benchmarks/simple_ivf.py (seeded Lloyd k-means over
L2-normalized vectors, empty-cell refill, top-nprobe probing, exact
re-rank) — re-expressed for Spark:

- centroids are trained driver-side on a bounded sample (the per-vector
  k-means state is tiny; at 10^12 vectors you train on a few hundred
  thousand sampled rows), then broadcast;
- cell assignment is one vectorized pandas UDF pass (matrix multiply per
  Arrow batch);
- search prunes to the top-nprobe cells per query BEFORE the exact
  cosine — the IVF analog of partition pruning — and re-ranks exactly.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C


def l2_normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    embedding table; per-query window with pinned tie-break.

    This is the correctness baseline — O(Q·N) — and still the right plan
    when Q is small: one scan, no index."""
    sims = embeddings.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        C.cosine_similarity(F.col(emb_col), F.col(query_emb_col)).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def train_centroids(
    sample: np.ndarray,
    n_cells: int | None = None,
    max_iterations: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Seeded Lloyd k-means over L2-normalized vectors with empty-cell
    refill — the reference SimpleIVF recipe (simple_ivf.py:78-130)."""
    emb = l2_normalize_rows(np.asarray(sample, dtype=np.float32))
    n, dim = emb.shape
    if n == 0:
        raise ValueError("sample must contain at least one vector")
    if n_cells is None:
        n_cells = max(4, int(round(math.sqrt(n))))
    n_cells = max(1, min(int(n_cells), n))
    rng = np.random.default_rng(seed)
    centroids = emb[rng.choice(n, size=n_cells, replace=False)].copy()
    assignments = np.full(n, -1, dtype=np.int32)
    for _ in range(max_iterations):
        new_assign = np.argmax(emb @ centroids.T, axis=1).astype(np.int32)
        if np.array_equal(new_assign, assignments):
            break
        assignments = new_assign
        sums = np.zeros((n_cells, dim), dtype=np.float32)
        np.add.at(sums, assignments, emb)
        counts = np.bincount(assignments, minlength=n_cells)
        centroids = sums / np.maximum(counts, 1)[:, None].astype(np.float32)
        empty = counts == 0
        if np.any(empty):
            centroids[empty] = emb[rng.choice(n, size=int(np.sum(empty)), replace=False)]
        centroids = l2_normalize_rows(centroids)
    return centroids


def assign_cells(
    embeddings: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
) -> DataFrame:
    """+cell_id: argmax cosine against broadcast centroids (one matrix
    multiply per Arrow batch)."""
    from bayesian_bm25_spark.functions.pudfs import cell_assign_udf

    return embeddings.withColumn(
        "cell_id", cell_assign_udf(np.asarray(centroids, dtype=np.float32))(F.col(emb_col))
    )


def cell_stats(assigned: DataFrame) -> DataFrame:
    """(cell_id, population) — input to ivf_density_prior."""
    return assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("population"))


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_rows: list[tuple[int, np.ndarray]],
    k: int = 10,
    nprobe: int | None = None,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    rank_round: int | None = None,
) -> DataFrame:
    """Cell-pruned exact search: per query keep only its top-nprobe
    cells, then exact cosine + window top-k.  The candidate scan is
    ``nprobe/n_cells`` of the table (partition pruning on cell_id when
    the table is written partitioned by it).

    ``centroids`` must be L2-normalized (train_centroids returns them
    so); cell ranking is then argsort of raw dot products — cosine is
    scale-invariant, so neither the query nor the centroids need another
    normalization pass, and the float64 accumulation over float32 values
    matches an external SQL oracle with the centroids inlined as
    literals.  ``rank_round`` ranks by sim rounded to that many decimals
    (ties broken by vec_id) for cross-engine-stable ranks."""
    spark = assigned.sparkSession
    cent = np.asarray(centroids, dtype=np.float32).astype(np.float64)
    n_cells = cent.shape[0]
    if nprobe is None:
        nprobe = max(1, int(round(math.sqrt(n_cells))))
    pairs = []
    for qid, qv in query_rows:
        qv32 = np.asarray(qv, dtype=np.float32)
        # stable sort over 9-decimal-rounded dots: exact-tie AND 1-ulp
        # near-tie decisions resolve to the lower cell id on every
        # engine (numpy blocked summation vs an oracle's sequential
        # fold can differ in the last bit; rounding absorbs it —
        # mirrors the cell_assign_udf / vector_background_fit contract)
        top_cells = np.argsort(
            -np.round(cent @ qv32.astype(np.float64), 9), kind="stable"
        )[:nprobe]
        for c in top_cells:
            pairs.append((int(qid), int(c), [float(x) for x in qv32]))
    probe = spark.createDataFrame(
        pairs, "query_id long, cell_id int, q_emb array<float>"
    )
    cands = assigned.join(F.broadcast(probe), "cell_id")
    sims = cands.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        C.cosine_similarity(F.col(emb_col), F.col("q_emb")).alias("sim"),
    )
    order = F.round("sim", rank_round) if rank_round is not None else F.col("sim")
    w = Window.partitionBy("query_id").orderBy(F.desc(order), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def hyperplane_planes(dim: int, n_bits: int = 16, seed: int = 42) -> np.ndarray:
    """Seeded random hyperplanes (n_bits, dim) — shared by the Spark
    bucketing and any external oracle that inlines them as literals."""
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, size=(n_bits, dim))


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    emb_col: str = "embedding",
) -> DataFrame:
    """+lsh_bucket: sign pattern against ``n_bits`` seeded random
    hyperplanes — the fully-distributed ANN bucketing path (no trained
    state at all; candidates = same-bucket rows).

    Pure Column math (double precision): each bit is the sign of one
    array dot product, folded plane-0-is-MSB — whole-stage codegen, no
    Python in the path, and bit-reproducible by any double-math engine
    (``functions.pudfs.lsh_bucket_udf`` is the float32 Arrow-batch
    variant kept for parity/perf comparison)."""
    planes = hyperplane_planes(dim, n_bits, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(C.dot(F.col(emb_col), plane) > 0.0, F.lit(1)).otherwise(F.lit(0))
        bucket = F.shiftleft(bucket, 1) + bit.cast("long")
    return embeddings.withColumn("lsh_bucket", bucket)


def lsh_candidate_pairs(
    bucketed: DataFrame, id_col: str = "vec_id", max_bucket_size: int | None = None
) -> DataFrame:
    """Same-bucket candidate pairs (a < b) for near-dup screening.
    ``max_bucket_size`` excludes over-populated buckets (skew guard —
    see operators.dedup.cap_bucket_size)."""
    src = bucketed
    if max_bucket_size is not None:
        from bayesian_bm25_spark.operators.dedup import cap_bucket_size

        src, _ = cap_bucket_size(
            bucketed.select(F.col(id_col), "lsh_bucket"), ["lsh_bucket"], max_bucket_size
        )
    left = src.select(F.col(id_col).alias("a"), F.col("lsh_bucket"))
    right = src.select(F.col(id_col).alias("b"), F.col("lsh_bucket"))
    return (
        left.join(right, "lsh_bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
