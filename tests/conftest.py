from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    """The reference's pure-numpy modules double as an extra test oracle
    when present (probability/fusion/calibration/metrics import cleanly;
    scorer.py needs the unavailable bm25s and is NOT imported)."""
    return os.path.isdir(os.path.join(REFERENCE_PATH, "bayesian_bm25"))


@pytest.fixture(scope="session")
def ref():
    if not reference_available():
        pytest.skip("reference repo not available")
    # Register a stub package pointing at the reference sources so the
    # submodules import without executing the real __init__.py (which
    # requires installed package metadata).
    import types

    if "bayesian_bm25" not in sys.modules:
        pkg = types.ModuleType("bayesian_bm25")
        pkg.__path__ = [os.path.join(REFERENCE_PATH, "bayesian_bm25")]
        sys.modules["bayesian_bm25"] = pkg
    import bayesian_bm25
    import bayesian_bm25.calibration
    import bayesian_bm25.fusion
    import bayesian_bm25.metrics
    import bayesian_bm25.probability

    return bayesian_bm25


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bb25spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


# Six-document fixture corpus (FIXTURES.md F2, from reference
# tests/test_scorer.py:16-25).
SIX_DOCS = [
    "the cat sat on the mat",
    "the dog chased the cat",
    "a quick brown fox jumps over the lazy dog",
    "hello world",
    "machine learning is a subset of artificial intelligence",
    "the cat and the dog are friends",
]

SIX_DOC_QUERIES = [
    ["cat"],
    ["dog"],
    ["machine", "learning"],
    [],
    ["xyznonexistent"],
]
