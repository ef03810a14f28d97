"""Distributed exact order statistics.

``exact_percentile``: numpy-`linear`-interpolation percentile computed
exactly without gathering the column to one task.  Spark's built-in
``percentile`` is exact but *global* aggregation funnels every value
through a single reducer — at 10^7+ rows that serializes the whole job.
Here: (1) bracket the target positions with ``approx_percentile``,
(2) count rows below the bracket, (3) collect ONLY the bracket slice
(~ε·n rows) and index into it.  Widens the bracket and retries in the
rare case the sketch misses.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentile(
    df: DataFrame, col: str, q: float, accuracy: int = 10000,
    n: int | None = None,
) -> float:
    """Exact q-percentile (numpy 'linear') of df[col], distributed.

    Pass ``n`` (the row count) when the caller already knows it — saves
    the count job."""
    if n is None:
        n = df.count()
    if n == 0:
        raise ValueError("empty column")
    if n == 1:
        return float(df.collect()[0][0])
    pos = (n - 1) * q
    k0, k1 = int(math.floor(pos)), int(math.ceil(pos))

    eps = 0.01
    for _ in range(8):
        lo_q, hi_q = max(0.0, q - eps), min(1.0, q + eps)
        row = df.agg(
            F.expr(f"approx_percentile({col}, {lo_q}, {accuracy})").alias("lo"),
            F.expr(f"approx_percentile({col}, {hi_q}, {accuracy})").alias("hi"),
        ).collect()[0]
        lo, hi = float(row["lo"]), float(row["hi"])
        below = df.where(F.col(col) < lo).count()
        inside = (
            df.where((F.col(col) >= lo) & (F.col(col) <= hi))
            .select(col)
            .toPandas()[col]
            .to_numpy()
        )
        if below <= k0 and k1 < below + len(inside):
            inside.sort()
            v0 = float(inside[k0 - below])
            v1 = float(inside[k1 - below])
            return v0 + (v1 - v0) * (pos - k0)
        eps *= 4  # sketch missed the positions — widen and retry
    # last resort: exact single-reducer percentile
    return float(
        df.agg(F.expr(f"percentile({col}, {q})")).collect()[0][0]
    )
