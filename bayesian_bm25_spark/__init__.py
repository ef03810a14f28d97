"""bayesian_bm25_spark — a PySpark-native inverted-index + Bayesian-BM25
query engine.

A brand-new engine with the query and data-processing capabilities of
cognica-io/bayesian-bm25, re-expressed Spark-first: DataFrame/SQL logical
plans optimized by Catalyst, Arrow-batched pandas UDFs where built-in
column math cannot express the semantics, explicit partitioning / salted
shuffles for web-scale (10^12-doc) index builds, and per-stage parquet
checkpoints with lineage manifests.

Layout:
- ``kernel``     exact numpy math (runs in UDFs *and* as the pytest oracle)
- ``functions``  Spark Column builders mirroring the kernel
- ``sources``    corpus generators / loaders (web-page table, testdata)
- ``operators``  index build, query path, fusion, dedup, ANN, text analysis
- ``plans``      checkpoint manifests + resumable stage runner
- ``streaming``  online-learning feedback loop (foreachBatch)
"""

__version__ = "0.1.0"
