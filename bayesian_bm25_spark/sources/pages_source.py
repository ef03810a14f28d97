"""Page-table source: Iceberg catalog tables or parquet paths.

The north-rule input is an Iceberg table of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.  Iceberg is a TABLE FORMAT on top
of parquet — the engine's build DAG is identical either way; what
Iceberg adds at 10^12 docs is snapshot isolation for the resumable
build's re-reads, partition/file pruning from its metadata tree, and
incremental-append scans for ``add_documents``.

This container has no Iceberg catalog jars, so the Iceberg branch is
exercised only when the session is configured with one
(``spark.sql.catalog.<name>`` + iceberg-spark-runtime on the
classpath); the dispatch logic and the parquet branch are tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def is_table_identifier(source: str) -> bool:
    """Catalog identifiers look like ``catalog.db.table`` — no slashes,
    no file-ish suffix; paths have separators or a scheme."""
    if "/" in source or "\\" in source or source.startswith(("s3:", "hdfs:", "file:")):
        return False
    return "." in source and not source.endswith((".parquet", ".json", ".csv"))


def read_pages(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Load the pages relation from an Iceberg table or a parquet path.

    - ``fmt="iceberg"`` (or a catalog identifier): ``spark.read.format(
      "iceberg")`` — time-travel via ``snapshot_id`` pins the build to
      one snapshot, which is what makes checkpointed resume re-reads
      consistent under concurrent appends.
    - otherwise: plain parquet directory (what the tests/bench use).

    Either way, only the page columns are selected — column pruning
    reaches the scan (Iceberg prunes via its manifest stats, parquet via
    footer projection).
    """
    if fmt == "iceberg" or (fmt is None and is_table_identifier(source)):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(source)
    else:
        df = spark.read.parquet(source)
    keep = [c for c in PAGE_COLUMNS if c in df.columns]
    if "url" not in keep or "text" not in keep:
        raise ValueError(
            f"pages source {source!r} must carry url+text; found {df.columns}"
        )
    extra = [c for c in ("doc_id",) if c in df.columns]
    return df.select(*(extra + keep))
