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
