"""Inverted-index build: tokenize → postings → stats → bounds → params.

Build DAG (each stage a parquet checkpoint with a lineage manifest, so
the build resumes from any boundary — north rule):

    pages(url, warc_ts, html, text, lang)
      └─ docs:      tokenize (Arrow p_udf-free: pure Column split/filter)
      └─ postings:  explode tokens → groupBy(term, doc_id) tf  [shuffle 1]
                    → join df per term [shuffle 2, AQE-broadcast when small]
                    → eager impact column (codegen) → laid out by
                    term_bucket = pmod(xxhash64(term), n_buckets)
      └─ posting_lists: map-side varbyte partials → ONE shuffle of
                    compressed bytes → term merge (one write;
                    checkpoint_segments=True restores the two-stage
                    layout)  [north rule storage tier; queries default
                    to flat postings].  The merge holds every term's
                    decoded arrays, so it also emits df/max/min impact,
                    the θ-pass prefix_cutoff and per-block maxima as
                    extra columns …
      └─ term_stats: column-pruned derivation of posting_lists (r7
                    fusion; payload bytes unread).  Standalone postings
                    scan kept for build_compressed=False / legacy
                    checkpoints (fused_term_artifacts=False)
      └─ block_max:  explode of the posting_lists block arrays (same)
      └─ params.json: seeded pseudo-query sampling → α/β/base-rate on
                    the driver (numpy-exact, mirrors reference protocol)

Skew: the Zipf head ("the"-like terms) is handled twice — the flat
postings shuffle relies on AQE skew-join splitting, and the compressed
build salts ``groupBy(term, salt)`` so no single task collects a hot
term's full list before the merge stage stitches segments.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.kernel.bm25 import estimate_alpha_beta, estimate_base_rate
from bayesian_bm25_spark.kernel.postings_codec import (
    decode_posting_list,
    encode_posting_list,
)
from bayesian_bm25_spark.kernel.transform import TransformParams
from bayesian_bm25_spark.plans import checkpoint as ckpt


@dataclass
class IndexConfig:
    k1: float = 1.2
    b: float = 0.75
    method: str = "lucene"  # robertson | lucene | atire
    stemmer: str | None = None  # None | "porter" | "porter2"/"snowball" (index AND queries)
    # None | "english" | explicit word list — removed on the UNSTEMMED
    # token (bm25s.tokenize order), applied at index AND query time
    stopwords: str | tuple | None = None
    alpha: float | None = None
    beta: float | None = None
    base_rate: float | str | None = None  # None | "auto" | float
    base_rate_method: str = "percentile"
    block_size: int = 128
    prefix_len: int = 128  # MaxScore θ-pass prefix depth
    n_buckets: int = 32  # term-hash layout buckets (partition pruning)
    n_salts: int = 8  # salt factor for the compressed posting-list build
    build_compressed: bool = True
    # encode varbyte partial posting lists map-side (per Arrow batch,
    # zero pre-shuffle) so the ONLY exchange of the posting-list build
    # carries compressed bytes; False restores the salted row-shuffle
    # (repartition by (term, salt) then encode) — see
    # _build_compressed_lists and the BENCH/BASELINE.md §6 A/B
    mapside_partials: bool = True
    # checkpoint the intermediate segments table (old two-write layout);
    # off = phase 1 streams into the merge through one shuffle and the
    # compressed artifact is written once (see _build_compressed_lists)
    checkpoint_segments: bool = False
    # derive term_stats and block_max from the posting-list merge (the
    # merge already holds every term's decoded doc/tf/impact arrays, so
    # df/max/min impact, the θ-pass prefix_cutoff and the per-block
    # maxima come out as extra columns for free) instead of re-scanning
    # the postings checkpoint once per stage — round-6's parallel group
    # ran THREE full postings scans (term_stats 10.9s, block_max 10.9s,
    # compressed_lists 11.5s at sf0.1; 39/34/55s at 1M docs).  False
    # (or env BB25_FUSED_ARTIFACTS=0) restores the standalone scans.
    fused_term_artifacts: bool = True
    pseudo_query_seed: int = 42
    pseudo_query_sample: int = 50
    # row-local tf counting (zero token-stream shuffle); False restores
    # the explode + groupBy(term, doc_id) plan
    local_tf: bool = True
    # broadcast the per-term df aggregate into the impact join when the
    # measured vocabulary is at most this many terms (0 = off).  OFF BY
    # DEFAULT — measured negative (BENCH/BASELINE.md r6 addendum §6):
    # the tf-by-term exchange this removes (992 MB at 1M docs, the
    # build's heaviest stage) is not waste, it is the CLUSTERING stage.
    # Its term-hash output partitioning aligns with term_bucket =
    # pmod(xxhash64(term), n_buckets), so each write task lands in ~1-2
    # bucket dirs with term-clustered, RLE-friendly files; the
    # broadcast path writes doc-ordered rows that scatter every term
    # across every write task's files — postings phase −10%, every
    # downstream postings scan (term_stats/block_max/posting-list
    # merge) ~3× slower.  Keep for corpora whose downstream stages
    # don't re-scan postings by term.
    broadcast_vocab_max: int = 0

    def to_dict(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


@dataclass
class BM25Index:
    """Handle over the built index artifacts."""

    spark: SparkSession
    path: str
    config: IndexConfig
    postings: DataFrame
    term_stats: DataFrame
    block_max: DataFrame
    doc_stats: DataFrame
    n_docs: int
    avgdl: float
    params: TransformParams
    posting_lists: DataFrame | None = None
    build_metrics: dict = field(default_factory=dict)


def assign_doc_ids(
    pages: DataFrame,
    order_col: str = "url",
    start_id: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed url-rank doc_id assignment — NO global window.

    Two-pass zipWithIndex over a range partitioning:

      1. ``repartitionByRange(p, url) + sortWithinPartitions(url)`` puts
         every partition's rows in global url order across partitions —
         each partition sorts locally, in parallel.
      2. one O(p)-row job counts rows per partition; the driver prefix-
         sums the counts into per-partition offsets (KB of state).
      3. a ``mapInPandas`` pass adds ``offset[pid] + local ordinal`` —
         streaming, no shuffle, no single-task funnel.

    The ids are identical to ``row_number() over (ORDER BY url)`` − 1
    (rank-identity pytest enforces it): the range exchange is given an
    explicit partition count (AQE never re-coalesces it) and the
    partitioned frame is localCheckpoint-ed before the count job, so
    the count job and the id job read the SAME materialized partitions
    even when the upstream relation is nondeterministic (json scans,
    joins, samples — e.g. the BEIR loader's output).

    TRADEOFF: localCheckpoint stores blocks on executors with lineage
    truncated — an executor lost between the count job and the id job
    fails the build (non-recomputable blocks), and the materialized
    corpus occupies executor memory/disk for the window between the two
    jobs.  That's the right default here: the window is one short job,
    and the failure mode is a clean retryable error, never silent id
    skew.  For very large builds on preemptible clusters, write the
    range-partitioned frame to the index work dir (a reliable
    checkpoint) instead — same two-job protocol, recoverable blocks —
    at the cost of a full corpus write+read.
    """
    import numpy as np
    import pandas as pd

    spark = pages.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism * 2
    if "doc_id" in pages.columns:  # reassigning: discard the old ids
        pages = pages.drop("doc_id")
    parted = (
        pages.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        # materialize the partitioning ONCE (the counts job below
        # triggers it; the id job re-reads the stored blocks).  Without
        # this the two jobs re-execute the range exchange independently
        # and a nondeterministic upstream (a json scan + join, a sample)
        # can land rows in different partitions between them — silently
        # duplicated/skipped ids.  For a deterministic parquet scan the
        # checkpoint is merely cheap insurance.
        .localCheckpoint(eager=False)
    )
    counts = (
        parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    )
    offsets, acc = {}, int(start_id)
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["_cnt"])

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields
        if f.name != "_pid"
    ) + ", doc_id long"

    def add_ids(batches):
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield out

    return parted.mapInPandas(add_ids, schema=out_schema)


def tokenize_pages(
    pages: DataFrame,
    stemmer: str | None = None,
    stopwords: str | tuple | None = None,
) -> DataFrame:
    """pages → docs(doc_id, url, tokens, doc_len).

    doc_id is taken from the input when present; otherwise assigned as
    the dense url rank via ``assign_doc_ids`` — a range-partitioned
    two-pass zipWithIndex, never a global un-partitioned window.

    ``stemmer`` (off by default) applies a pure-Python stemmer per token
    via an Arrow UDF: "porter" (classic 1980) or "porter2"/"snowball"
    (Snowball English — the stemmer behind the reference's published
    BEIR numbers, hybrid_beir.py:288-296).  ``stopwords`` ("english" or
    an explicit list) removes stopwords BEFORE stemming — the
    bm25s.tokenize order (hybrid_beir.py:293 passes
    ``stopwords="english"`` alongside the stemmer), via a JVM-side
    higher-order filter.  Queries must then be normalized with the same
    flags (the reference applies both on both sides)."""
    base = pages if "doc_id" in pages.columns else assign_doc_ids(pages)
    tokens = C.tokenize(F.col("text"))
    if stopwords is not None:
        from bayesian_bm25_spark.functions.stopwords import remove_stopwords

        tokens = remove_stopwords(tokens, stopwords)
    if stemmer is not None:
        from bayesian_bm25_spark.functions.stemmer import (
            resolve_stemmer,
            stem_tokens_udf,
        )

        resolve_stemmer(stemmer)  # validate the name eagerly
        tokens = stem_tokens_udf(stemmer)(tokens)
    return base.select(
        "doc_id",
        "url",
        tokens.alias("tokens"),
    ).withColumn("doc_len", F.size("tokens").cast("long"))


def _local_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, doc_len, term, tf) computed ROW-LOCALLY — zero shuffle.

    A doc's term frequencies are a function of its own tokens array, so
    the groupBy(term, doc_id) shuffle of the whole exploded token
    stream (≈ Σ doc_len rows serialized over the network at cluster
    scale) is unnecessary: one Arrow-batched pass counts tokens per row
    with vectorized pandas (flatten → groupby(row, term).size — C code,
    no per-token Python).  The only remaining build shuffle for the
    postings table is the per-term df aggregation, whose map-side
    partial reduces to ~|vocab| rows per partition.
    """
    import numpy as np
    import pandas as pd

    def count(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            toks = pdf["tokens"]
            lens = toks.map(len).to_numpy()
            if int(lens.sum()) == 0:
                continue
            row_idx = np.repeat(np.arange(len(pdf)), lens)
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            g = (
                pd.DataFrame({"i": row_idx, "term": flat})
                .groupby(["i", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[g["i"].to_numpy()],
                    "doc_len": pdf["doc_len"].to_numpy()[g["i"].to_numpy()],
                    "term": g["term"].to_numpy(),
                    "tf": g["tf"].to_numpy().astype("int64"),
                }
            )

    return docs.select("doc_id", "doc_len", "tokens").mapInPandas(
        count, schema="doc_id long, doc_len long, term string, tf long"
    )


def compute_postings(
    docs: DataFrame, n_docs: int, avgdl: float, cfg: IndexConfig | None = None,
    tf_source: DataFrame | None = None,
) -> DataFrame:
    """Lazy postings plan from docs(doc_id, tokens, doc_len).

    Default (``cfg.local_tf``): row-local tf via ``_local_tf`` (no
    token-stream shuffle) → per-term df agg (small) → join (AQE
    broadcasts small vocab; one shuffle of the tf rows otherwise) →
    eager impact column (pure codegen) → term-bucket layout column for
    partition pruning.  ``local_tf=False`` keeps the explode →
    groupBy(term, doc) plan (two full shuffles of the tf rows: the
    grouping and the df join).

    ``tf_source`` (doc_id, doc_len, term, tf) overrides the tf
    computation entirely — the incremental-append path passes the old
    index's tf facts unioned with the new docs' tf, so the old corpus's
    token arrays are never re-read (``add_documents(reuse_tf=True)``);
    df/impact are recomputed from the merged tf either way (they change
    globally with every append: n_docs, avgdl, df)."""
    cfg = cfg or IndexConfig()
    if tf_source is not None:
        tf = tf_source.select("doc_id", "doc_len", "term", "tf")
    elif getattr(cfg, "local_tf", True):
        tf = _local_tf(docs)
    else:
        tf = (
            docs.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
            .groupBy("term", "doc_id", "doc_len")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    df_per_term = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # The planner can't prove df_per_term small — it derives from the
    # Arrow tf source, which has no stats — so the join plans as an
    # exchange of EVERY tf row by term (round-6 event-log audit: 992 MB
    # shuffled, 620 MB remote, the heaviest stage of the whole build).
    # Materialize the aggregate (tiny output; one pass over tf, cached
    # in the build path) and broadcast it when the measured vocabulary
    # is under cfg.broadcast_vocab_max: the probe side then flows
    # narrowly from the tf cache into impact + write with no exchange.
    # Webscale vocabularies above the threshold keep the shuffle join.
    df_pt_cached = None
    bmax = int(getattr(cfg, "broadcast_vocab_max", 0) or 0)
    if bmax > 0:
        df_pt_cached = df_per_term.persist()
        n_terms = df_pt_cached.count()
        df_per_term = (
            F.broadcast(df_pt_cached) if n_terms <= bmax else df_pt_cached
        )
    out = (
        tf.join(df_per_term, "term")
        .withColumn(
            "impact",
            C.bm25_impact(
                F.col("tf"),
                F.col("doc_len"),
                F.col("df"),
                n_docs,
                avgdl,
                k1=cfg.k1,
                b=cfg.b,
                method=cfg.method,
            ),
        )
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_buckets)))
        .select("term_bucket", "term", "doc_id", "tf", "doc_len", "df", "impact")
    )
    # cleanup handle: the build unpersists this (tiny: one row per
    # term) after the stage write, alongside the tf cache
    out._bb25_df_pt = df_pt_cached
    return out


from contextlib import contextmanager


@contextmanager
def _read_split_cap(spark: SparkSession, cap: str = "16m"):
    """Build-scoped session tuning (restored afterwards).

    - ``spark.sql.files.maxPartitionBytes`` → 16m: tokenize/explode
      stages multiply input bytes ~10×; a 300 MB page table at the
      default 128 MB split size yields 3 input partitions and caps the
      whole build at 3 tasks no matter how many cores exist.
    - parquet compression → zstd: the build is WRITE-bound on shared
      disks (five checkpoint stages + shuffle); zstd cuts checkpoint
      bytes ~30-40% over snappy for token/posting data at negligible
      CPU here (measured: 6% faster 4-executor build at 200k docs,
      more at larger corpora).
    - file committer → v2 (task-parallel commit): safe for checkpoint
      dirs because the stage ``_manifest.json`` — written strictly
      after the parquet commit — is the completion marker, not the
      directory's existence.
    """
    keys = {
        "spark.sql.files.maxPartitionBytes": cap,
        # the postings checkpoint is term_bucket-partitioned into many
        # ~0.5-2 MB files; the default 4 MB per-file open cost charges
        # each one 4 MB against the 16m split cap (~3 files/split), so
        # every parallel-group scan of it explodes into ~1s-overhead
        # tasks (round-6 event-log audit: +100 tasks, +100s task-time
        # at 16 cores after the write widened).  1 MB packs ~8
        # files/split; the docs scan reads few 16 MB+ files and is
        # unaffected.
        "spark.sql.files.openCostInBytes": str(1 << 20),
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                # the key was unset before the build — restore that, or
                # the override (zstd codec, v2 committer, 16m splits)
                # leaks into every later query in the session
                spark.conf.unset(k)


def _dir_bytes(d: str) -> int:
    """Total bytes of the files directly under a checkpoint dir (the
    local-FS analog of a catalog's table-size stat — used to size write
    parallelism; on object storage swap in the listing API)."""
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _postings_write_tasks(docs_bytes: int, default_parallelism: int) -> int:
    """Task count for the postings stage's narrow coalesce.

    The cached-tf probe pins the write stage's task count, and that
    stage carries the post-cache compute (broadcast df join + impact +
    parquet encode), not just the file write — so under-sizing it idles
    cores, and over-sizing it multiplies files by the 32 term_bucket
    partition dirs.  Three regimes:

    - big corpus (bytes/32MB >= cluster width): byte-proportional —
      already at least one well-filled task per core;
    - mid corpus (within 4x of cluster width): fill the cluster — the
      event-log audit of the round-6 executor pair showed the 8-task
      floor running a 16-core cluster half-idle for 27.5s of a 122.8s
      build (BENCH/BASELINE.md r6 addendum 5), and filling the width
      here costs at most 4x the byte-sized file count;
    - tiny corpus: floor at min(8, width) so a 50k-doc corpus writes
      ~8x32 files instead of 1024 tiny ones.
    """
    by_bytes = -(-docs_bytes // (32 << 20))
    if by_bytes >= default_parallelism:
        return by_bytes
    if by_bytes * 4 >= default_parallelism:
        return default_parallelism
    return max(min(8, default_parallelism), by_bytes)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    config: IndexConfig | None = None,
    force: bool = False,
    tf_source: DataFrame | None = None,
) -> BM25Index:
    """Build (or resume building) the index at ``path``.

    ``tf_source``: precomputed (doc_id, doc_len, term, tf) facts that
    replace the tokenize-and-count pass — the incremental-append path
    (see ``add_documents(reuse_tf=True)``)."""
    with _read_split_cap(spark):
        return _build_index_impl(spark, pages, path, config, force, tf_source)


def _build_index_impl(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    config: IndexConfig | None = None,
    force: bool = False,
    tf_source: DataFrame | None = None,
) -> BM25Index:
    cfg = config or IndexConfig()
    os.makedirs(path, exist_ok=True)
    t_start = time.time()

    serial_phase: dict[str, float] = {}
    t_phase = time.time()

    docs_dir = os.path.join(path, "docs")
    docs = ckpt.run_stage(
        spark,
        docs_dir,
        lambda: tokenize_pages(pages, stemmer=cfg.stemmer, stopwords=cfg.stopwords),
        stage="docs",
        force=force,
    )
    serial_phase["docs"] = round(time.time() - t_phase, 2)
    t_phase = time.time()

    stats_file = os.path.join(path, "corpus_stats.json")
    if os.path.exists(stats_file) and not force:
        with open(stats_file) as f:
            stats = json.load(f)
    else:
        row = docs.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
        ).collect()[0]
        stats = {"n_docs": int(row["n_docs"]), "avgdl": float(row["avgdl"])}
        with open(stats_file, "w") as f:
            json.dump(stats, f)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    serial_phase["corpus_stats"] = round(time.time() - t_phase, 2)
    t_phase = time.time()

    postings_dir = os.path.join(path, "postings")
    # The postings plan consumes tf TWICE — once under the df agg, once
    # as the probe side of the (broadcast) df join — and Spark does not
    # dedupe common subplans, so without a persist the Arrow token-count
    # pass (and at cluster scale, the docs-checkpoint scan feeding it)
    # executes twice per build.  Persist tf across the two consumers for
    # the duration of the stage write; released right after.  Resume
    # path (checkpoint exists) never builds the plan, so nothing is
    # cached there.
    tf_cached = None
    df_pt_cached = None

    def build_postings() -> DataFrame:
        nonlocal tf_cached, df_pt_cached

        def _track(plan: DataFrame) -> DataFrame:
            # compute_postings may persist the per-term df aggregate
            # for the vocab-measured broadcast; keep the handle so the
            # post-write cleanup below releases it with the tf cache
            nonlocal df_pt_cached
            df_pt_cached = getattr(plan, "_bb25_df_pt", None)
            return plan

        src = tf_source
        if src is None and getattr(cfg, "local_tf", True):
            src = _local_tf(docs)
        if src is None:
            return _track(compute_postings(docs, n_docs, avgdl, cfg))
        if os.environ.get("BB25_TF_PERSIST", "1") == "0":
            # A/B kill-switch (BENCH/BASELINE.md r5 §1): revert to the
            # double-compute plan without the cache
            return _track(
                compute_postings(docs, n_docs, avgdl, cfg, tf_source=src)
            )
        # covers the append path too: its union's _local_tf(new docs)
        # leg would otherwise also execute twice
        tf_cached = src.persist()
        out = _track(
            compute_postings(docs, n_docs, avgdl, cfg, tf_source=tf_cached)
        )
        # The cached probe pins the write's task count to the cache
        # partition count (32 tasks × 32 bucket dirs = 1024 tiny files
        # at 50k docs — measured to double every downstream postings
        # scan via per-file open cost).  No exchange sits between cache
        # and write for AQE to right-size, so size it ourselves from
        # the docs checkpoint bytes: ~32 MB of docs per write task, a
        # NARROW coalesce (no shuffle) — small corpora get few
        # well-filled files, big corpora keep proportional parallelism.
        n_write = _postings_write_tasks(
            _dir_bytes(docs_dir), spark.sparkContext.defaultParallelism
        )
        return out.coalesce(int(n_write))

    postings = ckpt.run_stage(
        spark,
        postings_dir,
        build_postings,
        stage="postings",
        inputs=[docs_dir],
        partition_by=["term_bucket"],
        force=force,
        # the postings table is the QUERY-hot scan: snappy decodes ~3x
        # cheaper than zstd, and every retrieval pass reads it — the
        # zstd build default applies only to write-once checkpoints
        compression="snappy",
    )
    if tf_cached is not None:
        tf_cached.unpersist()
    if df_pt_cached is not None:
        df_pt_cached.unpersist()
    serial_phase["postings"] = round(time.time() - t_phase, 2)

    term_stats_dir = os.path.join(path, "term_stats")

    def build_term_stats() -> DataFrame:
        base = postings.groupBy("term").agg(
            F.first("term_bucket").alias("term_bucket"),
            F.first("df").alias("df"),
            F.max("impact").alias("max_impact"),
            # sign witness for the pruned query paths: MaxScore/threshold
            # bounds are only valid for non-negative impacts (robertson
            # idf goes negative for df > ~N/2) — query.py checks this
            F.min("impact").alias("min_impact"),
        )
        # MaxScore θ-pass cutoff: the B-th largest impact per term.  The
        # rank-≤-B window compiles to WindowGroupLimit (map-side top-B
        # before the shuffle), so the Zipf head never sorts in one task.
        w = Window.partitionBy("term").orderBy(F.desc("impact"), F.asc("doc_id"))
        cutoff = (
            postings.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= cfg.prefix_len)
            .groupBy("term")
            .agg(F.min("impact").alias("prefix_cutoff"))
        )
        return base.join(cutoff, "term", "left")

    block_max_dir = os.path.join(path, "block_max")

    def build_block_max() -> DataFrame:
        # blocks are doc-INDEX ranges (reference scorer.py:73: block b
        # covers doc indices [b·bs, (b+1)·bs)): block_id = doc_id // bs —
        # pure column math, no per-term sort, no Zipf-head straggler
        return (
            postings.withColumn(
                "block_id", (F.col("doc_id") / cfg.block_size).cast("long")
            )
            .groupBy("term", "block_id")
            .agg(F.max("impact").alias("block_max_impact"))
        )

    # everything past the postings checkpoint is INDEPENDENT (term_stats,
    # block_max, the compressed-list chain, and param estimation all read
    # only the postings/docs checkpoints) — submit them as concurrent
    # Spark jobs from driver threads.  Per-stage fixed costs (job
    # scheduling, AQE planning, parquet commit, driver math) overlap
    # instead of serializing, which is where the N→4N scaling efficiency
    # was going at small-to-mid corpus sizes; outputs land in separate
    # checkpoint dirs, so resumability is unchanged.
    #
    # FUSED default (cfg.fused_term_artifacts): the compressed-list
    # merge already decodes every term's full posting arrays, so
    # term_stats and block_max are derived from ITS checkpoint's extra
    # columns (a tiny column-pruned scan — the payload bytes are never
    # read) instead of each re-scanning the full postings checkpoint.
    # One bulk postings pass instead of three; the derivations land in
    # the same stage dirs, so resume/load_index are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    t_group0 = time.time()
    phase_sec: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        phase_sec[name] = round(time.time() - t0, 2)
        return out

    def submit_standalone(pool):
        return (
            pool.submit(
                timed, "term_stats",
                lambda: ckpt.run_stage(
                    spark, term_stats_dir, build_term_stats,
                    stage="term_stats", inputs=[postings_dir], force=force,
                ),
            ),
            pool.submit(
                timed, "block_max",
                lambda: ckpt.run_stage(
                    spark, block_max_dir, build_block_max,
                    stage="block_max", inputs=[postings_dir], force=force,
                ),
            ),
        )

    fused = (
        cfg.build_compressed
        and getattr(cfg, "fused_term_artifacts", True)
        and os.environ.get("BB25_FUSED_ARTIFACTS", "1") != "0"
    )
    with ThreadPoolExecutor(max_workers=5) as pool:
        # params first: its chain (score 50 pseudo-queries → cache →
        # several small percentile/agg jobs) has the longest tail of
        # sequential driver round-trips, so giving it first claim on the
        # FIFO scheduler lets that tail overlap the bulk stages
        f_params = pool.submit(
            timed, "params",
            lambda: _estimate_params(spark, docs, postings, cfg, n_docs),
        )
        if fused:
            list_dir = os.path.join(path, "posting_lists")

            def fused_chain():
                pl = timed(
                    "compressed_lists",
                    lambda: _build_compressed_lists(spark, postings, path, cfg, force),
                )
                if "max_impact" not in pl.columns:
                    # resumed pre-fusion checkpoint without the stats
                    # columns: fall back to the standalone scans
                    f_ts, f_bm = submit_standalone(pool)
                    return pl, f_ts.result(), f_bm.result()
                f_ts = pool.submit(
                    timed, "term_stats",
                    lambda: ckpt.run_stage(
                        spark, term_stats_dir,
                        lambda: _derive_term_stats(pl, cfg.n_buckets),
                        stage="term_stats", inputs=[list_dir], force=force,
                    ),
                )
                f_bm = pool.submit(
                    timed, "block_max",
                    lambda: ckpt.run_stage(
                        spark, block_max_dir,
                        lambda: _derive_block_max(pl),
                        stage="block_max", inputs=[list_dir], force=force,
                    ),
                )
                return pl, f_ts.result(), f_bm.result()

            f_chain = pool.submit(fused_chain)
            posting_lists, term_stats, block_max = f_chain.result()
        else:
            f_term_stats, f_block_max = submit_standalone(pool)
            f_compressed = (
                pool.submit(
                    timed, "compressed_lists",
                    lambda: _build_compressed_lists(spark, postings, path, cfg, force),
                )
                if cfg.build_compressed
                else None
            )
            term_stats = f_term_stats.result()
            block_max = f_block_max.result()
            posting_lists = f_compressed.result() if f_compressed else None
        params = f_params.result()
    phase_sec["parallel_group"] = round(time.time() - t_group0, 2)

    # doc_stats is a pure projection of the docs checkpoint — derived
    # lazily, no extra stage write
    doc_stats = docs.select("doc_id", "url", "doc_len")

    with open(os.path.join(path, "params.json"), "w") as f:
        json.dump({"params": params.to_dict(), "config": cfg.to_dict()}, f, indent=2)

    return BM25Index(
        spark=spark,
        path=path,
        config=cfg,
        postings=postings,
        term_stats=term_stats,
        block_max=block_max,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        params=params,
        posting_lists=posting_lists,
        build_metrics={
            "build_wall_sec": time.time() - t_start,
            # phase attribution for the scaling diagnosis: serial prefix
            # (docs -> corpus_stats -> postings) + the thread-parallel
            # group (per-member walls overlap; parallel_group is its
            # true wall)
            "phase_sec": {**serial_phase, **phase_sec},
        },
    )


_SEGMENT_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("salt", LongType(), False),
        StructField("df_partial", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("df_partial", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

_LIST_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("df", LongType(), False),
        StructField("payload", BinaryType(), False),
        # term_stats / block_max by-products of the merge (see
        # IndexConfig.fused_term_artifacts): the merge decodes every
        # term's full (doc_id, tf, impact) arrays anyway, so these are
        # O(1) extra numpy reductions per term.  Readers of the
        # compressed lists select (term, df, payload) and never pay for
        # them (parquet column pruning).
        StructField("max_impact", DoubleType(), False),
        StructField("min_impact", DoubleType(), False),
        StructField("prefix_cutoff", DoubleType(), False),
        StructField("block_ids", ArrayType(LongType(), False), False),
        StructField("block_maxes", ArrayType(DoubleType(), False), False),
    ]
)


def _run_grouped(batches, key_cols: list[str], flush):
    """Iterate Arrow batches of partition-sorted rows, yielding one output
    row per contiguous key-group via ``flush(group_slice_dict)``.

    The partition is sorted by ``key_cols``, so groups are contiguous; a
    pending tail (group possibly split across batch boundaries) is
    carried over and prepended to the next batch.  Group boundaries are
    found with numpy on the key columns and each group is handed to
    ``flush`` as a dict of numpy array slices — no per-group pandas
    machinery (a per-group applyInPandas pays ~1 ms interpreter overhead
    per term; this pays ~µs).
    """
    import numpy as np

    pending: pd.DataFrame | None = None
    for pdf in batches:
        if pending is not None:
            pdf = pd.concat([pending, pdf], ignore_index=True)
        n = len(pdf)
        if n == 0:
            pending = None
            continue
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in key_cols:
            kv = cols[k]
            change[1:] |= kv[1:] != kv[:-1]
        starts = np.nonzero(change)[0]
        # hold back the last group — it may continue in the next batch
        tail_start = starts[-1]
        pending = pdf.iloc[tail_start:]
        if tail_start > 0:
            bounds = list(starts[starts < tail_start]) + [tail_start]
            out = [
                flush({c: v[a:b] for c, v in cols.items()})
                for a, b in zip(bounds[:-1], bounds[1:])
            ]
            yield pd.DataFrame(out)
    if pending is not None and len(pending):
        cols = {c: pending[c].to_numpy() for c in pending.columns}
        yield pd.DataFrame([flush(cols)])


def _derive_term_stats(posting_lists: DataFrame, n_buckets: int) -> DataFrame:
    """term_stats from the fused posting-list checkpoint — value- and
    schema-identical to the standalone postings scan (term_bucket is a
    pure function of the term; the int cast matches the partition-dir
    type inference of the postings read-back).  Column pruning keeps the
    payload bytes unread."""
    return posting_lists.select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("term_bucket"),
        "df",
        "max_impact",
        "min_impact",
        "prefix_cutoff",
    )


def _derive_block_max(posting_lists: DataFrame) -> DataFrame:
    """block_max rows from the fused checkpoint's parallel block arrays."""
    z = posting_lists.select(
        "term", F.explode(F.arrays_zip("block_ids", "block_maxes")).alias("z")
    )
    return z.select(
        "term",
        F.col("z.block_ids").alias("block_id"),
        F.col("z.block_maxes").alias("block_max_impact"),
    )


def _build_compressed_lists(
    spark: SparkSession, postings: DataFrame, path: str, cfg: IndexConfig, force: bool
) -> DataFrame:
    """Compressed posting-list construction (north rule).

    Default (``cfg.mapside_partials``): encode varbyte partials MAP-SIDE
    — each Arrow batch of the postings scan is numpy-sorted by
    (term, doc_id) and every term-run encoded into a delta+varbyte
    partial with its partial df — then ONE shuffle by term carries only
    compressed bytes (~10.5 B/posting vs ~35-40 B/posting struct rows)
    into the merge, which decodes, argsort-stitches the doc-disjoint
    partials, and re-encodes the global list (byte-identical to every
    other path).  Skew needs no salt here: the Zipf head term arrives
    pre-chunked one partial per batch per split, and the map side is
    balanced by the scan's byte-sized splits.

    Legacy salted path (``mapside_partials=False`` or env
    ``BB25_MAPSIDE_PARTIALS=0`` for A/Bs): phase 1 repartitions raw rows
    by (term, salt(doc_id)) — the Zipf head split across ``n_salts``
    tasks — sorts within partitions, and encodes each contiguous
    (term, salt) run; phase 2 repartitions by term and stitches.  Both
    phases are Arrow-batched ``mapInPandas`` over partition-sorted runs:
    per-batch Python, per-group numpy.

    By default (``cfg.checkpoint_segments = False``) phase 1 STREAMS
    into phase 2 through one shuffle — the full compressed artifact is
    written once (posting_lists), not twice.  The intermediate segments
    parquet bought little resumability (it is one pass from the
    checkpointed postings table, which remains the recovery point) and
    cost a full write + a full MB-row scan whose 4096-row columnar
    batches needed a session-cloned reader-batch cap to avoid executor
    OOM.  Per-partition shuffle volume in the streamed path is
    ~total_compressed/n_part (a few MB) and per-row size is bounded by
    the salt split, so the merge's Arrow batches stay small without any
    cap.  Set ``checkpoint_segments=True`` to restore the old
    stage-per-phase layout (e.g. to inspect segments)."""
    seg_dir = os.path.join(path, "segments")
    list_dir = os.path.join(path, "posting_lists")
    postings_dir = os.path.join(path, "postings")
    # over-partition the python encode stages 4× so uneven (term, salt)
    # run lengths don't leave cores idle behind stragglers
    n_part = max(spark.sparkContext.defaultParallelism * 4, 8)

    def encode_runs(batches):
        def flush(g: dict) -> dict:
            # rows arrive sorted by (term, salt, doc_id) already
            payload = encode_posting_list(g["doc_id"], g["tf"], g["impact"])
            return {
                "term": g["term"][0],
                "salt": int(g["salt"][0]),
                "df_partial": len(g["doc_id"]),
                "payload": payload,
            }

        yield from _run_grouped(batches, ["term", "salt"], flush)

    def build_segments() -> DataFrame:
        return (
            postings.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(cfg.n_salts)))
            .repartition(n_part, "term", "salt")
            .sortWithinPartitions("term", "salt", "doc_id")
            .mapInPandas(encode_runs, schema=_SEGMENT_SCHEMA)
        )

    def encode_partials(batches):
        # Map-side partial encode: sort each Arrow batch by
        # (term, doc_id) with numpy, encode every term-run into a
        # varbyte partial.  No pre-shuffle, no partition-wide sort —
        # (term, doc) rows are globally unique, so batch-local runs are
        # doc-disjoint across batches and the merge's argsort stitches
        # them exactly (byte-identical final lists).
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            term = pdf["term"].to_numpy()
            order = np.lexsort((pdf["doc_id"].to_numpy(), term))
            term = term[order]
            doc = pdf["doc_id"].to_numpy()[order]
            tf = pdf["tf"].to_numpy()[order]
            imp = pdf["impact"].to_numpy()[order]
            change = np.ones(n, dtype=bool)
            change[1:] = term[1:] != term[:-1]
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], n)
            yield pd.DataFrame(
                {
                    "term": term[starts],
                    "df_partial": (ends - starts).astype("int64"),
                    "payload": [
                        encode_posting_list(doc[a:b], tf[a:b], imp[a:b])
                        for a, b in zip(starts, ends)
                    ],
                }
            )

    def build_partials() -> DataFrame:
        # The encode is a pure map — its parallelism is the read split
        # count.  The postings checkpoint is ~32 MB/file, so at the
        # build-wide 16m cap a small corpus reads in a handful of
        # splits; clone a session with a byte-sized split cap
        # (~bytes/(4·parallelism), floored at 2m) so every core encodes.
        cap = max(
            2 << 20,
            _dir_bytes(postings_dir)
            // max(4 * spark.sparkContext.defaultParallelism, 8),
        )
        enc_spark = spark.newSession()
        enc_spark.conf.set("spark.sql.files.maxPartitionBytes", str(cap))
        # openCostInBytes must ride along (ADVICE r6): the clone reverts
        # to the 4 MiB default otherwise, which exceeds the 2 MiB cap
        # floor and turns every small postings file into its own task
        for k in ("spark.sql.shuffle.partitions",
                  "spark.sql.files.openCostInBytes",
                  "spark.sql.parquet.compression.codec",
                  "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"):
            v = spark.conf.get(k, None)
            if v is not None:
                enc_spark.conf.set(k, v)
        src = enc_spark.read.parquet(postings_dir).select(
            "term", "doc_id", "tf", "impact"
        )
        return src.mapInPandas(encode_partials, schema=_PARTIAL_SCHEMA)

    def merge_runs(batches):
        # Merge + stats in one pass: identical bytes to
        # merge_posting_lists (same decode → stable argsort → encode),
        # plus the term_stats / block_max columns computed from the
        # arrays the merge has already decoded — the reason the build
        # no longer re-scans the postings checkpoint for those stages.
        import numpy as np

        prefix_len, block_size = cfg.prefix_len, cfg.block_size

        def flush(g: dict) -> dict:
            parts = [
                decode_posting_list(bytes(x)) for x in g["payload"] if x
            ] or [decode_posting_list(encode_posting_list([], [], []))]
            doc_ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            impacts = np.concatenate([p[2] for p in parts])
            order = np.argsort(doc_ids, kind="stable")
            doc_ids, tfs, impacts = doc_ids[order], tfs[order], impacts[order]
            n = len(doc_ids)
            payload = encode_posting_list(doc_ids, tfs, impacts)
            if n == 0:  # defensive: runs are never empty in practice
                return {
                    "term": g["term"][0], "df": 0, "payload": payload,
                    "max_impact": 0.0, "min_impact": 0.0,
                    "prefix_cutoff": 0.0,
                    "block_ids": np.zeros(0, dtype=np.int64),
                    "block_maxes": np.zeros(0, dtype=np.float64),
                }
            # prefix_cutoff = the B-th largest impact (min over the
            # row_number()<=B window of the standalone builder; ties at
            # the boundary share the same value, so sorting by impact
            # alone is exact)
            imp_desc = np.sort(impacts)[::-1]
            bids = doc_ids // block_size
            starts = np.nonzero(np.r_[True, bids[1:] != bids[:-1]])[0]
            return {
                "term": g["term"][0],
                "df": int(g["df_partial"].sum()),
                "payload": payload,
                "max_impact": float(imp_desc[0]),
                "min_impact": float(imp_desc[-1]),
                "prefix_cutoff": float(imp_desc[min(prefix_len, n) - 1]),
                "block_ids": bids[starts],
                "block_maxes": np.maximum.reduceat(impacts, starts),
            }

        yield from _run_grouped(batches, ["term"], flush)

    def merge_of(segments: DataFrame, order_cols=("term", "salt")) -> DataFrame:
        return (
            segments.repartition(n_part, "term")
            .sortWithinPartitions(*order_cols)
            .mapInPandas(merge_runs, schema=_LIST_SCHEMA)
        )

    if not cfg.checkpoint_segments:
        mapside = getattr(cfg, "mapside_partials", True) and (
            os.environ.get("BB25_MAPSIDE_PARTIALS", "1") != "0"
        )
        if mapside:
            # map-side partial encode → ONE shuffle of compressed bytes
            # → merge: the exchange payload is varbyte partials (~10.5
            # B/posting: 8 B raw impact + ~1.5 B doc gap + ~1 B tf)
            # instead of struct rows (~35-40 B/posting), and the old
            # row-level (term, salt) exchange disappears entirely.  The
            # salted split's skew job is done by the batch granularity:
            # the Zipf head term arrives pre-chunked, one partial per
            # 10k-row Arrow batch per read split.
            ckpt.run_stage(
                spark,
                list_dir,
                lambda: merge_of(build_partials(), order_cols=("term",)),
                stage="posting_lists",
                inputs=[postings_dir],
                force=force,
            )
            # hand the checkpoint back on the caller's session so
            # downstream lineage never references the split-cap clone
            return spark.read.parquet(list_dir)
        # salted streamed path: row shuffle → encode → shuffle by term
        # → merge, one write
        return ckpt.run_stage(
            spark,
            list_dir,
            lambda: merge_of(build_segments()),
            stage="posting_lists",
            inputs=[postings_dir],
            force=force,
        )

    ckpt.run_stage(
        spark,
        seg_dir,
        build_segments,
        stage="segments",
        inputs=[os.path.join(path, "postings")],
        force=force,
    )

    # the segments table has MB-sized BINARY payload rows (a hot term's
    # compressed list); the vectorized parquet reader's default 4096-row
    # columnar batch then materializes GBs on heap and OOMs executors.
    # Cap the batch size for the merge stage's scan — rows are huge, so
    # small batches lose nothing.  The cap lives in a CLONED session
    # (own SQLConf over the shared SparkContext): batch size is SQLConf-
    # only (no per-scan parquet option), and setting it on the shared
    # session would (a) race with the sibling term_stats/block_max jobs
    # planned concurrently by the build thread pool and (b) leak the
    # 64-row batch to every later scan when the key was unset before.
    merge_spark = spark.newSession()
    # newSession() starts from the context conf, not the runtime conf —
    # carry over the build-scoped write tuning so the merge stage writes
    # like every other checkpoint stage
    for k in (
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes",
        "spark.sql.parquet.compression.codec",
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        "spark.sql.shuffle.partitions",
    ):
        v = spark.conf.get(k, None)
        if v is not None:
            merge_spark.conf.set(k, v)
    merge_spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "64")
    ckpt.run_stage(
        merge_spark,
        list_dir,
        lambda: merge_of(merge_spark.read.parquet(seg_dir)),
        stage="posting_lists",
        inputs=[seg_dir],
        force=force,
    )
    # hand the checkpoint back on the caller's session so downstream
    # lineage never references the clone
    return spark.read.parquet(list_dir)


def _estimate_params(
    spark: SparkSession, docs: DataFrame, postings: DataFrame, cfg: IndexConfig, n_docs: int
) -> TransformParams:
    """Seeded pseudo-query sampling → α/β/base-rate, mirroring the
    reference protocol exactly (reference scorer.py:287-337).

    The RNG runs on the driver over the ordered doc_id range
    (``default_rng(seed).choice(n, 50, replace=False)``); the 50 pseudo
    queries are scored in ONE distributed batch; the nonzero score arrays
    come back to the driver for exact median/std/percentile math.
    """
    import numpy as np

    from bayesian_bm25_spark.operators import query as Q

    if cfg.alpha is not None and cfg.beta is not None and not isinstance(cfg.base_rate, str):
        return TransformParams(alpha=cfg.alpha, beta=cfg.beta, base_rate=cfg.base_rate)

    rng = np.random.default_rng(cfg.pseudo_query_seed)
    sample_ids = [int(i) for i in rng.choice(n_docs, size=min(n_docs, cfg.pseudo_query_sample), replace=False)]
    sampled = (
        docs.where(F.col("doc_id").isin(sample_ids))
        .select("doc_id", F.slice("tokens", 1, 5).alias("terms"))
        .collect()
    )
    tokens_by_id = {int(r["doc_id"]): list(r["terms"]) for r in sampled}
    queries = [
        (qid, tokens_by_id[did])
        for qid, did in enumerate(sample_ids)
        if tokens_by_id.get(did)
    ]
    if not queries:
        return TransformParams(alpha=cfg.alpha or 1.0, beta=cfg.beta or 0.0)
    qdf = spark.createDataFrame(queries, schema="query_id long, terms array<string>")
    # co_partition=False is deliberate: the default query plan repartitions
    # the WHOLE postings table by doc_id before the broadcast join — right
    # for large query batches (moves |postings| once instead of the joined
    # blow-up), wrong here where only ~250 pseudo-query terms match.  A
    # plain broadcast join touches just the matched rows, so the params
    # phase costs O(Σ df over query terms) instead of a full-corpus
    # shuffle — this was the critical-path phase of the entire build at
    # 1M docs (183s of a 183s parallel-group wall).
    scored = Q.score_queries(
        postings, qdf, n_buckets=cfg.n_buckets, co_partition=False,
        driver_terms=sorted({t for _, ts in queries for t in ts}),
        # α/β/base-rate read only the score column — skip the
        # tf_match/doc_len aggregates (identical scores, ~40% less agg
        # state; params is the 1M build's critical-path phase)
        score_only=True,
    ).where(F.col("score") > 0)

    collect_max = int(os.environ.get("BB25_PARAMS_COLLECT_MAX", "500000"))
    if (cfg.base_rate_method == "percentile" or cfg.base_rate != "auto") and (
        n_docs < collect_max and os.environ.get("BB25_PARAMS_COLLECT", "1") != "0"
    ):
        # small-corpus fast path: ONE Arrow collect of the (query_id,
        # score) sample replaces the distributed chain's ~5 sequential
        # jobs (cache materialize + stddev agg + 3-job exact percentile
        # + window base-rate).  Inside the build's parallel group each
        # of those jobs queued behind the bulk stages' tasks, so the
        # params phase paid ~2-3× its standalone wall in scheduling
        # latency alone.  The driver math IS the reference protocol
        # (scorer.py:313-337) — the same kernel estimators the
        # mixture/elbow branch already collects for — and the sample is
        # bounded by the 50 pseudo-queries' nonzero scores.  Above the
        # cutoff the fully distributed path below is unchanged.
        pdf = scored.select("query_id", "score").toPandas()
        if len(pdf) == 0:
            return TransformParams(alpha=cfg.alpha or 1.0, beta=cfg.beta or 0.0)
        per_query_scores = [
            g.to_numpy(dtype=np.float64)
            for _, g in pdf.groupby("query_id", sort=True)["score"]
        ]
        alpha, beta = estimate_alpha_beta(per_query_scores, cfg.alpha, cfg.beta)
        if cfg.base_rate == "auto":
            base_rate = estimate_base_rate(per_query_scores, n_docs, "percentile")
        elif isinstance(cfg.base_rate, (int, float)):
            base_rate = float(cfg.base_rate)
        else:
            base_rate = None
        return TransformParams(alpha=alpha, beta=beta, base_rate=base_rate)

    if cfg.base_rate_method == "percentile" or cfg.base_rate != "auto":
        # fully distributed path: β = exact median, α = 1/std_pop of the
        # pooled nonzero sample; base-rate = mean over queries of
        # frac(scores ≥ per-query exact 95th pct)/n_docs.  Spark's exact
        # ``percentile`` uses the same linear interpolation as numpy, so
        # the values equal the reference's driver math — without ever
        # collecting the O(n_docs)-sized score sample.
        from bayesian_bm25_spark.operators.stats import exact_percentile

        scored = scored.cache()
        try:
            # job 1 materializes the cache; the exact-median chain and
            # the base-rate chain then read ONLY cached blocks and are
            # independent — run them concurrently so their per-job fixed
            # costs overlap (params is the longest member of the build's
            # parallel group; every serial job here is on the critical
            # path)
            row = scored.agg(
                F.stddev_pop("score").alias("std"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            if int(row["n"]) == 0:
                return TransformParams(alpha=cfg.alpha or 1.0, beta=cfg.beta or 0.0)
            from concurrent.futures import ThreadPoolExecutor as _TPE

            def _base_rate() -> float | None:
                if cfg.base_rate == "auto":
                    # per-query p95 as a WINDOW aggregate: one shuffle
                    # by query_id, then the filter, per-query ratio and
                    # global mean all run map-side on that partitioning
                    # (the old groupBy + self-join shuffled the scored
                    # frame by query_id twice)
                    wq = Window.partitionBy("query_id")
                    ratios = (
                        scored.withColumn(
                            "thr", F.expr("percentile(score, 0.95)").over(wq)
                        )
                        .where(F.col("score") >= F.col("thr"))
                        .groupBy("query_id")
                        .agg((F.count(F.lit(1)) / F.lit(float(n_docs))).alias("ratio"))
                    )
                    return float(
                        np.clip(float(ratios.agg(F.avg("ratio")).collect()[0][0]), 1e-6, 0.5)
                    )
                if isinstance(cfg.base_rate, (int, float)):
                    return float(cfg.base_rate)
                return None

            with _TPE(max_workers=2) as pool:
                f_med = pool.submit(
                    exact_percentile, scored, "score", 0.5, n=int(row["n"])
                )
                f_br = pool.submit(_base_rate)
                est_beta = f_med.result()
                base_rate = f_br.result()
            std = float(row["std"])
            est_alpha = 1.0 / std if std > 0 else 1.0
            alpha = cfg.alpha if cfg.alpha is not None else est_alpha
            beta = cfg.beta if cfg.beta is not None else est_beta
            return TransformParams(alpha=alpha, beta=beta, base_rate=base_rate)
        finally:
            scored.unpersist()

    # mixture/elbow estimators are inherently whole-sample iterative —
    # Arrow-collect the per-query nonzero scores (reference protocol;
    # fine for the sampled 50 queries, heavy only at extreme corpus
    # sizes where "percentile" is the method to use)
    pdf = scored.select("query_id", "score").toPandas()
    per_query_scores = [
        g.to_numpy(dtype=np.float64)
        for _, g in pdf.groupby("query_id", sort=True)["score"]
    ]
    alpha, beta = estimate_alpha_beta(per_query_scores, cfg.alpha, cfg.beta)
    base_rate = None
    if cfg.base_rate == "auto":
        base_rate = estimate_base_rate(per_query_scores, n_docs, cfg.base_rate_method)
    elif isinstance(cfg.base_rate, (int, float)):
        base_rate = float(cfg.base_rate)
    return TransformParams(alpha=alpha, beta=beta, base_rate=base_rate)


def add_documents(
    index: BM25Index, new_pages: DataFrame, new_path: str,
    reuse_tf: bool = False,
) -> BM25Index:
    """Incremental append with full statistics rebuild.

    IDF/avgdl change with every append, so — like the reference
    (scorer.py:469-492 'rebuilds the full index') — the combined corpus
    is re-indexed and α/β/base-rate re-estimated.  In Spark the rebuild
    is the same checkpointed DAG over `old docs ∪ new docs`; the old
    tokenization is reused (never recomputed), and df/avgdl/impact are
    plain re-aggregations.  New doc_ids continue after the old range.

    ``reuse_tf=True``: tf rows are append-only FACTS — (doc_id, term,
    tf, doc_len) never change once a doc is indexed — so the old
    index's postings checkpoint (which carries exactly those columns)
    seeds the merged tf and only the NEW docs' token arrays are ever
    counted.  df/avgdl/impact still recompute over the merged tf (they
    change globally: pure column math + one small agg), but the
    token-stream pass scales with the DELTA, not the corpus — at
    10^12 docs the difference between an append job and a full
    re-tokenize.  Postings are content-identical to a full rebuild
    (pytest-enforced, including compressed posting-list payload bytes).
    """
    spark = index.spark
    if "doc_id" in new_pages.columns:
        # preserve caller-supplied ids (reference append-order semantics);
        # validate they don't collide with the existing range
        new_docs = tokenize_pages(new_pages, stemmer=index.config.stemmer, stopwords=index.config.stopwords)
        mn = new_docs.agg(F.min("doc_id")).collect()[0][0]
        if mn is not None and int(mn) < index.n_docs:
            raise ValueError(
                f"appended doc_id {mn} overlaps the existing range "
                f"[0, {index.n_docs}); supply ids >= n_docs or drop the column"
            )
    else:
        # assign continuing ids starting at n_docs (url rank within the
        # appended batch, distributed — see assign_doc_ids)
        new_docs = tokenize_pages(
            assign_doc_ids(new_pages, start_id=index.n_docs),
            stemmer=index.config.stemmer,
            stopwords=index.config.stopwords,
        )
    combined = index.spark.read.parquet(os.path.join(index.path, "docs")).unionByName(new_docs)
    os.makedirs(new_path, exist_ok=True)
    ckpt.write_stage(
        combined,
        os.path.join(new_path, "docs"),
        stage="docs",
        inputs=[os.path.join(index.path, "docs")],
    )
    tf_source = None
    if reuse_tf:
        # the old postings checkpoint IS the tf fact store; re-reading
        # it costs a columnar scan of 4 fixed-width columns, not a
        # re-count of every token array.  New docs come off the docs
        # checkpoint just written (doc_id >= old n_docs) so the tf pass
        # reads the already-tokenized rows, not the raw pages.
        appended = spark.read.parquet(os.path.join(new_path, "docs")).where(
            F.col("doc_id") >= index.n_docs
        )
        tf_source = index.postings.select(
            "doc_id", "doc_len", "term", "tf"
        ).unionByName(_local_tf(appended).select("doc_id", "doc_len", "term", "tf"))
    # remaining stages rebuild from the docs checkpoint (pages unused)
    return build_index(spark, combined.limit(0), new_path, index.config,
                       tf_source=tf_source)


def load_index(spark: SparkSession, path: str) -> BM25Index:
    """Re-open a built index from its checkpoints (no recompute)."""
    with open(os.path.join(path, "params.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "corpus_stats.json")) as f:
        stats = json.load(f)
    cfg = IndexConfig.from_dict(meta["config"])
    pl_dir = os.path.join(path, "posting_lists")
    docs = spark.read.parquet(os.path.join(path, "docs"))
    return BM25Index(
        spark=spark,
        path=path,
        config=cfg,
        postings=spark.read.parquet(os.path.join(path, "postings")),
        term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
        block_max=spark.read.parquet(os.path.join(path, "block_max")),
        doc_stats=docs.select("doc_id", "url", "doc_len"),
        n_docs=stats["n_docs"],
        avgdl=stats["avgdl"],
        params=TransformParams.from_dict(meta["params"]),
        posting_lists=spark.read.parquet(pl_dir) if ckpt.is_complete(pl_dir) else None,
    )
