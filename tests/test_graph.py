"""Invariants for plans/graph.py (oracle parity is in the
test_oracle_parity sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from transcript_analysis_spark.plans import graph


def test_pagerank_mass_conserved_and_positive(spark):
    """Fixed-point PageRank redistributes the 10^12 mass: integer
    truncation only ever LOSES mass (never creates it), and every
    node keeps at least the undamped base share."""
    out = graph.pagerank_purchase_graph(spark, SF_SMOKE)
    row = out.agg(F.sum("pagerank_fp").alias("s"),
                  F.min("pagerank_fp").alias("lo"),
                  F.count("*").alias("n")).collect()[0]
    assert row.s <= graph.PR_MASS
    assert row.s > 0.9 * graph.PR_MASS
    base = graph.PR_MASS // row.n
    assert row.lo >= (graph.PR_D_DEN - graph.PR_D_NUM) * base \
        // graph.PR_D_DEN


def test_hub_outranks_leaf(spark):
    """A maximum-degree node must outrank a minimum-degree node —
    the point of running PageRank at all."""
    edges, deg = graph._spark_graph(spark, SF_SMOKE)
    top = deg.orderBy(F.desc("deg"), "src").first()
    bottom = deg.orderBy("deg", "src").first()
    pr = {r.node_id: r.pagerank_fp
          for r in graph.pagerank_purchase_graph(spark, SF_SMOKE).collect()}
    assert pr[top.src] > pr[bottom.src]


def test_sectioned_oracle_equals_straight_replay(spark, tmp_path):
    """The 64x escape hatch, proven at a small multiple: for a corpus
    of k disjoint key-shifted graph copies, the sectioned oracle (one
    base-section replay under the global node count, copies derived by
    the node-id shift isomorphism) must produce EXACTLY the straight
    full-corpus oracle's rows — and the Spark plan on the scaled
    corpus must match both."""
    import importlib.util
    import os

    import duckdb

    _spec = importlib.util.spec_from_file_location(
        "scale_probe",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "scale_probe.py"))
    scale_probe = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(scale_probe)

    k = 3
    d = scale_probe.build_scaled_dir(spark, SF_SMOKE, k, scale_orders=True)
    try:
        def views(con, base):
            for t in ("orders", "lineitem"):
                path = f"{base}/{t}.parquet"
                pat = f"{path}/*.parquet" if os.path.isdir(path) else path
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{pat}')")
            return con

        straight = views(duckdb.connect(), d).execute(
            graph._pr_oracle()).fetchall()
        sectioned = views(duckdb.connect(), SF_SMOKE).execute(
            graph.pr_sectioned_oracle(k, scale_probe.KEY_SHIFT)).fetchall()
        assert sorted(straight) == sorted(sectioned)
        assert len(straight) > 0
        spark_rows = [(r.node_id, r.pagerank_fp) for r in
                      graph.pagerank_purchase_graph(spark, d).collect()]
        assert sorted(spark_rows) == sorted(straight)
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)
