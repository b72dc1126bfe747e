"""Connected components via alternating large-star/small-star — the
O(log n)-round MapReduce CC algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14), expressed as DataFrame
joins/aggregations.

Replaces plain min-label propagation for the near-dup clustering path
(reference semantics: one canonical doc per duplicate CLUSTER). Label
propagation needs O(diameter) rounds — a chain-shaped duplicate
cluster (docs A~B~C~... from incremental edits) has diameter O(n) and
would blow any fixed iteration budget. Star contraction needs
O(log n) rounds REGARDLESS of diameter: each round hangs every node
directly off the smallest node it can currently see, halving the
effective depth.

Each round is two join+groupBy stages over the (shrinking) edge set;
`localCheckpoint(eager=True)` truncates lineage so plan depth stays
O(1) across rounds (the same discipline the propagation loop used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonicalize(edges: DataFrame) -> DataFrame:
    """Undirected input -> high->low directed unique edges, no loops."""
    return (edges
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every STRICTLY-LARGER neighbor of u to the minimum of
    u's neighborhood (including u). Output stays high->low."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    the minimum of that neighborhood. Input/output high->low."""
    mins = edges.groupBy("u").agg(F.min("v").alias("mv"))
    moved = (edges.join(mins, "u")
             .filter(F.col("v") != F.col("mv"))
             .select(F.col("v").alias("u"), F.col("mv").alias("v")))
    kept = mins.select("u", F.col("mv").alias("v"))
    return moved.unionByName(kept).distinct()


def _edge_fingerprint(edges: DataFrame) -> tuple:
    """(count, order-independent hash) — one aggregate, no collect of
    row data; drives the fixed-point check."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # XOR, not SUM: order-independent AND overflow-free under ANSI
        # mode; edges are distinct so XOR cannot self-cancel a dup
        F.expr("bit_xor(xxhash64(u, v))").alias("h")).first()
    return (row.n, row.h)


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """`edges(u, v)` undirected -> `(n, label)` where `label` is the
    smallest node id in n's component. Nodes with no edges are the
    caller's concern (they are their own components by definition).

    Converges when a large-star + small-star round is a no-op: at the
    fixed point every edge points directly at its component's minimum
    (a star), which large-star and small-star both map to itself.
    `max_rounds` is a pure safety net — 50 rounds covers graphs
    astronomically beyond any real corpus (rounds grow ~log n)."""
    edges = _canonicalize(edges).localCheckpoint(eager=True)
    prev = _edge_fingerprint(edges)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_fingerprint(nxt)
        del edges  # release the superseded generation's checkpoint
        edges = nxt
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components: no fixed point in {max_rounds} "
            f"large-star/small-star rounds — input is pathological")
    # Fixed point is a star forest: every non-root has exactly one
    # out-edge to its root; roots appear only as targets.
    non_roots = edges.select(F.col("u").alias("n"),
                             F.col("v").alias("label"))
    roots = (edges.select(F.col("v").alias("n")).distinct()
             .join(edges.select(F.col("u").alias("n")).distinct(),
                   "n", "left_anti")
             .withColumn("label", F.col("n")))
    return non_roots.unionByName(roots)
