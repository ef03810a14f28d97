"""Local BEIR-format IR dataset loader — the front door for real IR users.

Reads the standard on-disk BEIR layout (what ``ir_datasets``/the BEIR
toolkit download produces) with plain Spark readers — no network, no
extra dependency:

    <dir>/corpus.jsonl        {"_id": ..., "title": ..., "text": ...}
    <dir>/queries.jsonl       {"_id": ..., "text": ...}
    <dir>/qrels/<split>.tsv   query-id \t corpus-id \t score   (header row)

Semantics mirror the reference loader (benchmarks/utils.py:28-68):
title and text are concatenated ("title text") when a non-empty title
exists, tokenization is lower().split(), and queries without qrels are
dropped.  External string ids are mapped to the engine's dense long
doc_ids via the distributed rank assignment (no global window).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.operators.index_build import assign_doc_ids


@dataclass
class IRDatasetFrames:
    """Spark-side container for an IR evaluation dataset.

    ``pages`` feeds ``build_index`` directly; ``doc_ids`` maps the
    engine's long ids back to the dataset's external string ids;
    ``queries``/``qrels`` are keyed by long query_id with ``query_ids``
    holding the reverse map.
    """

    name: str
    pages: DataFrame       # doc_id long, url string (= ext id), text, lang
    doc_ids: DataFrame     # doc_id long, ext_doc_id string
    queries: DataFrame     # query_id long, terms array<string>
    query_ids: DataFrame   # query_id long, ext_query_id string
    qrels: DataFrame       # query_id long, doc_id long, relevance int


def load_ir_dataset(
    spark: SparkSession, data_dir: str, split: str = "test", name: str | None = None
) -> IRDatasetFrames:
    """Load a BEIR-format directory into engine-ready DataFrames."""
    corpus = spark.read.json(os.path.join(data_dir, "corpus.jsonl"))
    title = (
        F.col("title")
        if "title" in corpus.columns
        else F.lit(None).cast("string")
    )
    # reference semantics: "title + ' ' + text" when title is non-empty
    full_text = F.when(
        title.isNotNull() & (F.length(title) > 0),
        F.concat_ws(" ", title, F.col("text")),
    ).otherwise(F.col("text"))
    docs_ext = corpus.select(
        F.col("_id").cast("string").alias("ext_doc_id"),
        full_text.alias("text"),
    )
    # dense long ids via the distributed two-pass rank (ids follow the
    # external-id lexicographic order — deterministic and join-stable)
    pages = assign_doc_ids(docs_ext, order_col="ext_doc_id").select(
        "doc_id",
        F.col("ext_doc_id").alias("url"),
        "text",
        F.lit("und").alias("lang"),
    )
    doc_ids = pages.select("doc_id", F.col("url").alias("ext_doc_id"))

    qrels_path = os.path.join(data_dir, "qrels", f"{split}.tsv")
    qrels_ext = (
        spark.read.option("sep", "\t").option("header", True).csv(qrels_path)
        .select(
            F.col("query-id").cast("string").alias("ext_query_id"),
            F.col("corpus-id").cast("string").alias("ext_doc_id"),
            F.col("score").cast("int").alias("relevance"),
        )
    )

    queries_raw = spark.read.json(os.path.join(data_dir, "queries.jsonl")).select(
        F.col("_id").cast("string").alias("ext_query_id"),
        F.col("text").alias("qtext"),
    )
    # reference: drop queries that have no qrels for the split
    judged = qrels_ext.select("ext_query_id").distinct()
    queries_ext = assign_doc_ids(
        queries_raw.join(judged, "ext_query_id"), order_col="ext_query_id"
    ).withColumnRenamed("doc_id", "query_id")
    queries = queries_ext.select(
        "query_id", C.tokenize(F.col("qtext")).alias("terms")
    )
    query_ids = queries_ext.select("query_id", "ext_query_id")

    qrels = (
        qrels_ext.join(F.broadcast(query_ids), "ext_query_id")
        .join(doc_ids, "ext_doc_id")
        .select("query_id", "doc_id", "relevance")
    )
    return IRDatasetFrames(
        name=name or os.path.basename(os.path.normpath(data_dir)),
        pages=pages,
        doc_ids=doc_ids,
        queries=queries,
        query_ids=query_ids,
        qrels=qrels,
    )
