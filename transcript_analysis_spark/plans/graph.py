"""Graph analytics over the purchase graph: fixed-point PageRank and
degree distribution.

The graph is deterministic from the data: an undirected edge links a
customer and a supplier whenever some order connects them (distinct
(o_custkey, l_suppkey) pairs through orders x lineitem). Node ids are
disjoint by parity: customer k -> 2k, supplier s -> 2s+1.

``pagerank_purchase_graph`` runs Lloyd-style EXACT arithmetic: ranks
are int64 fixed-point (10^12 total mass), per-edge contributions use
integer division (truncation identical in Spark `div` and DuckDB `//`
for non-negatives), and the damping split is integer 85/100 — so the
entire T-round trajectory is deterministic and the DuckDB oracle
replays it verbatim (the kmeans_centroids discipline applied to a
graph algorithm; connected components in operators/components.py is
the third of the family).

Scale notes: each round is one join (edges x ranks, both partitioned
by src — co-partitioned at scale, e.g. bucketed edge tables) plus one
dst-keyed aggregate with map-side partials; T rounds = T scans of the
edge list, the Pregel cost model. Degree tables and node lists are
O(nodes) and reused across rounds. For 100 TB graphs swap the
round loop for GraphX/Pregel or the large-star trick — the per-round
plan is the same join+agg either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.data_pipeline import _t
from transcript_analysis_spark.plans.registry import register

PR_MASS = 1_000_000_000_000   # total fixed-point rank mass (10^12)
PR_T = 3                      # power-iteration rounds
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact integer split


_DUCK_GRAPH = """
    base_edges AS (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM base_edges
      UNION ALL
      SELECT b AS src, a AS dst FROM base_edges
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
"""


def _pr_oracle(n_scale: int = 1) -> str:
    """The unrolled fixed-point PageRank replay. With ``n_scale`` > 1
    the node-count term becomes COUNT(*) * n_scale — the hook for the
    SECTIONED replay of a corpus made of n_scale disjoint key-shifted
    copies of the graph (see ``pr_sectioned_oracle``): within one
    copy the trajectory only sees its own edges plus the GLOBAL node
    count, so replaying one section under the scaled count reproduces
    every section's values exactly."""
    nn_expr = ("COUNT(*)" if n_scale == 1
               else f"COUNT(*) * {n_scale}")
    parts = [f"""
    WITH {_DUCK_GRAPH},
    nn AS (SELECT {nn_expr} AS n FROM deg),
    r0 AS (
      SELECT d.src AS node, CAST({PR_MASS} // nn.n AS BIGINT) AS pr
      FROM deg d CROSS JOIN nn
    )"""]
    for t in range(PR_T):
        parts.append(f""",
    i{t} AS (
      SELECT e.dst AS node, SUM(r.pr // d.deg) AS inflow
      FROM edges e
      JOIN r{t} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{t + 1} AS (
      SELECT n.src AS node,
             CAST(({PR_D_DEN - PR_D_NUM} * ({PR_MASS} // nn.n))
                    // {PR_D_DEN}
                  + ({PR_D_NUM} * COALESCE(i.inflow, 0)) // {PR_D_DEN}
                  AS BIGINT) AS pr
      FROM deg n CROSS JOIN nn LEFT JOIN i{t} i ON i.node = n.src
    )""")
    parts.append(f"""
    SELECT node AS node_id, pr AS pagerank_fp FROM r{PR_T}""")
    return "".join(parts)


def pr_sectioned_oracle(k: int, key_shift: int) -> str:
    """Sectioned PageRank replay for a corpus of ``k`` disjoint copies
    of the base purchase graph, copy i's cust/supp keys shifted by
    i * key_shift (the shape ``tools/scale_probe.build_scaled_dir``
    writes). Runs against the BASE tables only: one section is
    replayed under the global node count (k * n), then every copy's
    rows are derived by the key isomorphism — custkey+s -> node+2s,
    suppkey+s -> node+2s — so node ids shift by 2*i*key_shift and the
    fixed-point values repeat verbatim. Equivalence to the straight
    full-corpus replay is pinned by a test at small k
    (tests/test_graph.py); at 64x the straight replay is a >79 GB
    DuckDB spill while this is one base-sized pass."""
    return f"""
    WITH sec AS ({_pr_oracle(n_scale=k)})
    SELECT sec.node_id + 2 * {key_shift} * c.i AS node_id,
           sec.pagerank_fp
    FROM sec
    CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i) c
    """


def _spark_graph(spark: SparkSession, sf_dir: str,
                 materialize_base: bool = False):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    base = (o.join(li, o.o_orderkey == li.l_orderkey)
            .select((F.col("o_custkey") * 2).alias("a"),
                    (F.col("l_suppkey") * 2 + 1).alias("b"))
            .distinct())
    if materialize_base:
        # One eager materialization of the distinct pair set — the
        # narrowest frame every downstream subplan (both union
        # directions x T+1 round references) re-derives otherwise.
        # Measured at sf0.1 (r8): 3.2-3.7s -> 2.6-2.8s for the 3-round
        # pagerank vs relying on ReusedExchange alone; checkpointing
        # the WIDER ed/deg frames instead was worth far less. At
        # cluster scale base is O(distinct pairs) — the smallest thing
        # worth pinning, and exactly what GraphX would materialize.
        base = base.localCheckpoint(eager=True)
    edges = (base.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionAll(base.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return edges, deg


@register(
    "pagerank_purchase_graph",
    oracle=_pr_oracle(),
    headline=True,
    tags=("graph", "iterative"),
)
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer-supplier purchase graph in int64
    fixed-point (see module docstring): damping 0.85, three power-
    iteration rounds, integer-truncated division throughout, so the
    exact trajectory hash-matches DuckDB's unrolled replay. The
    undirected edge construction leaves no dangling nodes (every node
    appearing in the graph has out-degree >= 1)."""
    edges, deg = _spark_graph(spark, sf_dir, materialize_base=True)
    # The T-round loop builds ONE plan; Catalyst's ReusedExchange
    # dedupes the repeated edges/deg subplans past the pinned base.
    # Materialization history: an eager localCheckpoint of the WIDE
    # (src, dst, deg) frame was a net loss (r5 measurement) — but
    # pinning just the narrow distinct pair set wins ~18% (r8
    # re-measurement per the r7 verdict; see _spark_graph).
    nn = deg.agg(F.count("*").alias("n"))
    base_pr = F.expr(f"{PR_MASS} div n")
    r = (deg.join(F.broadcast(nn))
         .select(F.col("src").alias("node"),
                 base_pr.cast("bigint").alias("pr")))
    ed = edges.join(deg, "src")  # (src, dst, deg)
    for _ in range(PR_T):
        inflow = (ed.join(r, ed.src == r.node)
                  .select("dst", F.expr("pr div deg").alias("c"))
                  .groupBy("dst").agg(F.sum("c").alias("inflow")))
        r = (deg.join(F.broadcast(nn))
             .join(inflow, deg.src == inflow.dst, "left")
             .select(
                 F.col("src").alias("node"),
                 (F.expr(f"({PR_D_DEN - PR_D_NUM} * ({PR_MASS} div n))"
                         f" div {PR_D_DEN}")
                  + F.expr(f"({PR_D_NUM} * coalesce(inflow, 0))"
                           f" div {PR_D_DEN}")).cast("bigint").alias("pr")))
    return r.select(F.col("node").alias("node_id"),
                    F.col("pr").alias("pagerank_fp"))


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_DUCK_GRAPH}
    SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           deg, COUNT(*) AS n_nodes
    FROM deg GROUP BY 1, 2
    """,
    tags=("graph",),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the purchase graph split by node side — the
    profiling query run before choosing a graph partitioning (degree
    skew decides salting for the high-degree hubs). Two hash
    aggregates, both map-side combined."""
    _, deg = _spark_graph(spark, sf_dir)
    return (deg.select(
        F.when(F.col("src") % 2 == 0, F.lit("customer"))
         .otherwise(F.lit("supplier")).alias("node_type"), "deg")
        .groupBy("node_type", "deg").agg(F.count("*").alias("n_nodes")))
