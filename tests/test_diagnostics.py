"""Search diagnostics: kernel vs reference, Spark op vs kernel."""

from __future__ import annotations

import numpy as np
import pytest

from bayesian_bm25_spark.kernel.diagnostics import (
    SearchDiagnostics,
    exact_search_diagnostics,
    separability_gate,
)
from bayesian_bm25_spark.operators.diagnostics_ops import (
    ranked_cosines,
    separability_gates,
)


class TestKernel:
    def test_reference_parity(self, ref):
        import importlib
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            rsd = importlib.import_module("benchmarks.search_diagnostics")
        except Exception:
            pytest.skip("reference benchmarks package not importable")
        rng = np.random.default_rng(42)
        scores = np.sort(rng.uniform(0, 1, 30))[::-1]
        theirs = rsd.build_exact_search_diagnostics(scores, local_k=10, shell_k=10)
        ours = exact_search_diagnostics(scores, local_k=10, shell_k=10)
        assert ours.cohesion == theirs.cohesion
        assert ours.separation == theirs.separation
        assert separability_gate(ours) == rsd.separability_gate(theirs)

    def test_gate_bounds(self):
        d = SearchDiagnostics([0.1, 0.1], [0.9, 0.9])
        assert 0.02 <= separability_gate(d) <= 0.98
        assert separability_gate(SearchDiagnostics([], [])) == 0.02
        # tight neighborhood, far shell → high gate
        assert separability_gate(d) > 0.8
        # no contrast shell → separation = cohesion → gate at floor
        assert separability_gate(SearchDiagnostics([0.3], [])) == 0.02


class TestSparkOp:
    def test_matches_kernel(self, spark):
        rng = np.random.default_rng(7)
        rows = []
        for q in range(3):
            sims = np.sort(rng.uniform(-1, 1, 25))[::-1]
            for i, s in enumerate(sims):
                rows.append((q, i, float(s)))
        df = spark.createDataFrame(rows, "query_id long, vec_id long, sim double")
        ranked = ranked_cosines(df, max_rank=20)
        got = {r["query_id"]: r for r in separability_gates(ranked).collect()}
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])
        for q, g in pdf.groupby("query_id"):
            scores = g.sort_values(["sim", "vec_id"], ascending=[False, True])["sim"].to_numpy()
            expect = exact_search_diagnostics(scores, local_k=10, shell_k=10)
            assert got[q]["cohesion"] == pytest.approx(expect.cohesion, rel=1e-12)
            assert got[q]["separation"] == pytest.approx(expect.separation, rel=1e-12)
            assert got[q]["gate"] == pytest.approx(separability_gate(expect), rel=1e-9)
