"""End-to-end retrieval-quality harness: the fusion method matrix
evaluated with NDCG@k / MAP@k over a BEIR-format dataset.

Mirrors the reference's quality story (README.md:410-433 reports hybrid
fusion vs BM25 as NDCG@10/MAP@10 tables produced by
benchmarks/hybrid_beir.py): retrieve both signals, union candidates,
fuse with each method, rank, score against qrels.  Everything runs as
DataFrame plans — the harness works unchanged on a fixture or a real
BEIR dump.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C
from bayesian_bm25_spark.operators import fusion_ops as FO
from bayesian_bm25_spark.operators import query as Q
from bayesian_bm25_spark.operators.ir_metrics import (
    average_precision,
    mean_metric,
    ndcg_at_k,
    precision_at_k,
)


def _load_npz_embeddings(spark: SparkSession, fixture_dir: str):
    """embeddings.npz (ext-id keyed) → two small DataFrames."""
    z = np.load(os.path.join(fixture_dir, "embeddings.npz"))
    docs = spark.createDataFrame(
        [
            (str(i), [float(x) for x in e])
            for i, e in zip(z["doc_ids"], z["doc_embs"])
        ],
        "ext_doc_id string, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [
            (str(i), [float(x) for x in e])
            for i, e in zip(z["query_ids"], z["query_embs"])
        ],
        "ext_query_id string, q_emb array<float>",
    )
    return docs, queries


def evaluate_fusion_matrix(
    spark: SparkSession,
    fixture_dir: str,
    work_dir: str,
    k: int = 10,
) -> dict[str, dict[str, float]]:
    """{method: {"ndcg": NDCG@k, "map": MAP}} for the fusion matrix
    (bm25, dense, convex, rrf, balanced, log-odds local, log-odds
    posterior assembly) on a BEIR-format directory with an
    ``embeddings.npz`` sidecar (sources.synthetic_beir layout)."""
    from bayesian_bm25_spark.operators.index_build import IndexConfig, build_index
    from bayesian_bm25_spark.sources.beir_local import load_ir_dataset

    ds = load_ir_dataset(spark, fixture_dir)
    idx = build_index(
        spark,
        ds.pages,
        os.path.join(work_dir, "quality_idx"),
        IndexConfig(base_rate="auto", build_compressed=False),
    )

    scored = Q.score_queries(idx.postings, ds.queries, prune_buckets=False)
    sparse = Q.with_probability(scored, idx.params, idx.avgdl).select(
        "query_id", "doc_id", "score", "probability"
    )

    emb_docs, emb_queries = _load_npz_embeddings(spark, fixture_dir)
    doc_emb = emb_docs.join(ds.doc_ids, "ext_doc_id").select("doc_id", "embedding")
    q_emb = emb_queries.join(F.broadcast(ds.query_ids), "ext_query_id").select(
        "query_id", "q_emb"
    )
    dense = (
        doc_emb.crossJoin(F.broadcast(q_emb))
        .select(
            "query_id",
            "doc_id",
            C.cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("sim"),
        )
        .where(F.col("sim") > 0)
    )

    cands = (
        sparse.join(dense, ["query_id", "doc_id"], "full_outer")
        .withColumn("score", F.coalesce("score", F.lit(0.0)))
        .withColumn("p_sparse", F.coalesce("probability", F.lit(0.0)))
        .withColumn("cos_dense", F.coalesce("sim", F.lit(0.0)))
        .select("query_id", "doc_id", "score", "p_sparse", "cos_dense")
        .localCheckpoint(eager=False)
    )

    rankings: dict[str, DataFrame] = {
        "bm25": FO.topk_fused(
            cands.withColumn("fused", F.col("score")), k=k
        ),
        "dense": FO.topk_fused(
            cands.withColumn("fused", F.col("cos_dense")), k=k
        ),
        "convex": FO.topk_fused(FO.convex_fusion(cands), k=k),
        "rrf": FO.topk_fused(
            FO.rrf_fusion(
                sparse, dense, sparse_col="probability", dense_col="sim"
            ),
            k=k,
        ),
        "balanced": FO.topk_fused(FO.balanced_fusion(cands), k=k),
        "logodds_local": FO.topk_fused(FO.logodds_local_fusion(cands), k=k),
        "vpt_balanced": FO.topk_fused(
            FO.vpt_balanced_fusion(
                FO.kappa_calibrate(
                    cands.withColumn("distance", 1.0 - F.col("cos_dense"))
                )
            ),
            k=k,
        ),
        "arctan_or": FO.topk_fused(
            cands.withColumn(
                "p_dense",
                FO.arctan_normalize(F.greatest(F.col("cos_dense"), F.lit(0.0))),
            ).withColumn(
                "fused",
                1.0 - (1.0 - F.col("p_sparse")) * (1.0 - F.col("p_dense")),
            ),
            k=k,
        ),
    }

    out: dict[str, dict[str, float]] = {}
    for name, ranking in rankings.items():
        r = ranking.select("query_id", "rank", "doc_id")
        out[name] = {
            "ndcg": mean_metric(ndcg_at_k(r, ds.qrels, k=k), "ndcg"),
            "map": mean_metric(average_precision(r, ds.qrels), "ap"),
            "p": mean_metric(precision_at_k(r, ds.qrels, k=k), "precision"),
        }
    return out


def format_quality_table(results: dict[str, dict[str, float]], k: int = 10) -> str:
    """Markdown table mirroring the reference README's quality layout.
    MAP follows the reference's own AP (benchmarks/metrics.py:62-74:
    mean precision over the relevant docs FOUND in the list — not
    normalized by total relevants, so a precise-but-shallow ranker can
    reach 1.0); NDCG@k is the headline."""
    lines = [
        f"| method | NDCG@{k} | MAP | P@{k} |",
        "|---|---|---|---|",
    ]
    for name, m in sorted(results.items(), key=lambda kv: -kv[1]["ndcg"]):
        lines.append(
            f"| {name} | {m['ndcg']:.4f} | {m['map']:.4f} | {m['p']:.4f} |"
        )
    return "\n".join(lines)
