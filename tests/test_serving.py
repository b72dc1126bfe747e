"""Dashboard serving layer: TTL cache semantics + statement timeout
(reference `server/dashboard.py:41-56` re-expressed over Spark)."""

from __future__ import annotations

import pytest

from transcript_analysis_spark.serving.dashboard import (DashboardService,
                                                         QueryTimeout)

SF_DIR = "/root/testdata/sf0.001"


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self) -> float:
        return self.t


def test_ttl_cache_hit_then_expiry(spark):
    clock = FakeClock()
    svc = DashboardService(spark, SF_DIR, ttl_sec=60, clock=clock)
    rows1, hit1 = svc.run("status_histogram")
    assert not hit1 and rows1
    clock.t = 30.0
    rows2, hit2 = svc.run("status_histogram")
    assert hit2 and rows2 == rows1
    clock.t = 61.0  # past TTL -> recompute
    rows3, hit3 = svc.run("status_histogram")
    assert not hit3 and sorted(map(tuple, rows3)) == sorted(map(tuple, rows1))


def test_force_refresh_and_invalidate(spark):
    clock = FakeClock()
    svc = DashboardService(spark, SF_DIR, ttl_sec=60, clock=clock)
    svc.run("corpus_counts")
    _, hit = svc.run("corpus_counts", force_refresh=True)
    assert not hit
    svc.run("corpus_counts")
    svc.invalidate("corpus_counts")
    _, hit = svc.run("corpus_counts")
    assert not hit


def test_statement_timeout_cancels_job(spark):
    svc = DashboardService(spark, SF_DIR, ttl_sec=60)
    # a deliberately huge cartesian product: lineitem x lineitem x lineitem
    from transcript_analysis_spark.plans import registry

    def runaway(s, sf_dir):
        li = s.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (li.crossJoin(li.selectExpr("l_orderkey as r1"))
                .crossJoin(li.selectExpr("l_orderkey as r2"))
                .selectExpr("count(*) as n"))

    registry._REGISTRY["__runaway__"] = registry.Query(
        name="__runaway__", fn=runaway, doc="timeout test fixture")
    try:
        with pytest.raises(QueryTimeout):
            svc.run("__runaway__", timeout_sec=1.0)
    finally:
        registry._REGISTRY.pop("__runaway__", None)


def test_timeout_not_raised_for_fast_query(spark):
    svc = DashboardService(spark, SF_DIR, ttl_sec=60)
    rows, _ = svc.run("corpus_counts", timeout_sec=120.0)
    assert rows
