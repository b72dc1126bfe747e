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


# --- HTTP shell (stdlib http.server over DashboardService) --------------

def test_http_shell_routes_and_cache(spark):
    """The serving endpoint the reference ships (server/dashboard.py)
    as a stdlib shell: health, query listing, rows-with-cache-flag,
    404 on unknown names — all JSON."""
    import json
    import urllib.request

    from transcript_analysis_spark.serving.http_shell import \
        DashboardHTTPServer

    svc = DashboardService(spark, SF_DIR, ttl_sec=300)
    srv = DashboardHTTPServer(svc).start()
    base = f"http://127.0.0.1:{srv.port}"

    def get(path):
        try:
            with urllib.request.urlopen(f"{base}{path}", timeout=60) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        assert get("/health") == (200, {"ok": True})
        code, listing = get("/queries")
        names = {q["name"] for q in listing["queries"]}
        assert code == 200 and "status_histogram" in names \
            and len(names) >= 160
        code, out = get("/query/status_histogram")
        assert code == 200 and not out["cached"] and out["n_rows"] >= 1
        assert out["rows"] and isinstance(out["rows"][0], dict)
        code, out2 = get("/query/status_histogram")
        assert code == 200 and out2["cached"] and out2["rows"] == out["rows"]
        code, out3 = get("/query/status_histogram?refresh=1")
        assert code == 200 and not out3["cached"]
        code, err = get("/query/nope_not_registered")
        assert code == 404 and "unknown" in err["error"]
        code, err = get("/query/status_histogram?timeout=abc")
        assert code == 400 and "bad timeout" in err["error"]
        code, err = get("/not/a/route")
        assert code == 404
    finally:
        srv.shutdown()
