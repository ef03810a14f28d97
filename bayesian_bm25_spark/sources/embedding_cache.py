"""Content-addressed embedding cache — the reference's embedding-cache
stage re-expressed for scale.

The reference caches whole encoded arrays in an ``.npz`` keyed by row
COUNT (hybrid_beir.py:303-373: "a cache hit requires ... the row count
to match") — any append invalidates everything.  The Spark-native
design is content-addressed: cache rows are ``(model_tag, text_md5,
embedding)`` parquet partitioned by ``model_tag``; lookups are an md5
join, so appended corpora reuse every previously-encoded text and only
the MISSES run the encoder (Arrow-batched ``mapInPandas`` over DISTINCT
texts — duplicate documents encode once).  At 100 TB the cache is just
another co-partitionable table; nothing is positional.

The actual neural encoder is not in this container (no
sentence-transformers / torch) — ``stub_encoder`` provides the
deterministic stand-in (md5-seeded unit vectors) so the cache plumbing
(keying, anti-join, append, reuse) is real and tested; swap
``encode_fn`` for a model-backed batch function in production.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CACHE_SCHEMA = "model_tag string, text_md5 string, embedding array<float>"


def stub_encoder(dim: int = 32) -> Callable[[pd.Series], np.ndarray]:
    """Deterministic pseudo-encoder: md5(text)-seeded unit vectors.
    A documented container-limitation stub (like the multimodal decode
    stubs) — the cache logic around it is real."""
    import hashlib

    def encode(texts: pd.Series) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "little"
            )
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            out[i] = (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)
        return out

    return encode


def cached_embeddings(
    spark: SparkSession,
    docs: DataFrame,
    cache_dir: str,
    encode_fn: Callable[[pd.Series], np.ndarray],
    model_tag: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_rows: int = 256,
) -> DataFrame:
    """(id_col, embedding) for every doc, encoding only cache misses.

    1. key every doc by md5(text);
    2. anti-join DISTINCT keys against the cache partition for
       ``model_tag`` (partition-pruned scan);
    3. encode the misses batch-wise with ``encode_fn`` (rows → (n, dim)
       float32) and APPEND them to the cache;
    4. return docs joined to the (now complete) cache.

    The join is by content hash, never position — append-safe by
    construction, and duplicate texts across docs encode exactly once.
    """
    keys = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"), F.col(text_col)
    )
    tag_dir = os.path.join(cache_dir, f"model_tag={model_tag}")
    have_cache = os.path.isdir(tag_dir) and any(
        f.endswith(".parquet") for f in os.listdir(tag_dir)
    )
    if have_cache:
        cache = (
            spark.read.parquet(cache_dir)
            .where(F.col("model_tag") == model_tag)
            .select("text_md5", "embedding")
        )
        misses = (
            keys.select("text_md5", text_col)
            .dropDuplicates(["text_md5"])
            .join(cache.select("text_md5"), "text_md5", "left_anti")
        )
    else:
        cache = None
        misses = keys.select("text_md5", text_col).dropDuplicates(["text_md5"])

    def encode_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                emb = np.asarray(encode_fn(chunk[text_col]), dtype=np.float32)
                yield pd.DataFrame(
                    {
                        "model_tag": model_tag,
                        "text_md5": chunk["text_md5"].to_numpy(),
                        "embedding": [e for e in emb],
                    }
                )

    new_rows = misses.mapInPandas(encode_batches, schema=CACHE_SCHEMA)
    new_rows.write.mode("append").partitionBy("model_tag").parquet(cache_dir)

    full = (
        spark.read.parquet(cache_dir)
        .where(F.col("model_tag") == model_tag)
        .select("text_md5", "embedding")
        # a failed/retried append or two concurrent writers can leave
        # duplicate (model_tag, text_md5) rows in the cache; dedup on
        # read (deterministic pick — embeddings for equal text under one
        # model_tag are identical by construction) so duplicates can
        # never fan out through the final join
        .dropDuplicates(["text_md5"])
    )
    return keys.select(id_col, "text_md5").join(full, "text_md5").select(
        id_col, "embedding"
    )
