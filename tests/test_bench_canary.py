"""VM-health canary probe contract (no Spark needed).

The canary guards the comparability of every BENCH_r*.json row; its
JSON shape is part of the bench record contract, so pin it."""

from __future__ import annotations

from bayesian_bm25_spark.bench_canary import _wide_probe, run_canary


def test_run_canary_shape_and_bands():
    c = run_canary(repeats=1, wide=False)
    assert set(c) == {"sha_ms", "membw_gbps", "sha_band", "membw_band", "ok"}
    assert c["sha_ms"] > 0 and c["membw_gbps"] > 0
    assert c["sha_band"][0] < c["sha_band"][1]
    assert c["membw_band"][0] < c["membw_band"][1]
    assert isinstance(c["ok"], bool)


def test_wide_probe_reports_aggregates():
    # 2 threads keeps the unit test cheap; fields are report-only
    # (bands calibrate in a known-healthy window, see module docstring)
    w = _wide_probe(n_threads=2)
    assert set(w) == {"sha16_mbps", "membw16_gbps"}
    assert w["sha16_mbps"] > 0 and w["membw16_gbps"] > 0


def test_run_canary_includes_wide_fields():
    c = run_canary(repeats=1, wide=True)
    assert "sha16_mbps" in c and "membw16_gbps" in c
