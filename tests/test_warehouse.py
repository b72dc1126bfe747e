"""Invariants for plans/warehouse.py (oracle parity is covered by the
parametrized sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from transcript_analysis_spark.plans import warehouse


def test_rollup_levels_reconcile(spark):
    """Grand total == sum of per-nation subtotals == sum of leaves —
    the defining property of a rollup."""
    rows = warehouse.sales_rollup_cube(spark, SF_SMOKE).collect()
    leaves = sum(r.n_orders for r in rows if r.gid == 0)
    nation_subs = sum(r.n_orders for r in rows if r.gid == 1)
    grand = [r.n_orders for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0] == leaves == nation_subs


def test_snapshot_diff_matches_construction(spark):
    """Every orderkey classified exactly per the deterministic
    old/new derivation moduli (101 added, 107 removed, 103 changed),
    and no unchanged rows leak through."""
    rows = warehouse.orders_snapshot_diff(spark, SF_SMOKE).collect()
    for r in rows:
        k = r.o_orderkey
        if r.change_type == "added":
            assert k % 101 == 0 and k % 107 != 0
        elif r.change_type == "removed":
            assert k % 107 == 0 and k % 101 != 0
        else:
            assert r.change_type == "changed"
            assert k % 103 == 0 and r.new_price != r.old_price


def test_scd2_intervals_partition_time(spark):
    """Per user: intervals are disjoint, ordered, and cover every
    event (n_events sums to the user's event count); exactly one open
    interval (valid_to NULL = current state)."""
    out = warehouse.scd2_user_state(spark, SF_SMOKE)
    per_user = (out.groupBy("user_id")
                .agg(F.sum("n_events").alias("total"),
                     F.count(F.when(F.col("valid_to_us").isNull(), 1))
                     .alias("open")).collect())
    ev = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
          .groupBy("user_id").count().collect())
    counts = {r.user_id: r["count"] for r in ev}
    for r in per_user:
        assert r.total == counts[r.user_id]
        assert r.open == 1
    bad = (out.filter(F.col("valid_to_us").isNotNull()
                      & (F.col("valid_to_us") <= F.col("valid_from_us")))
           .count())
    assert bad == 0


def test_equi_depth_buckets_are_balanced(spark):
    """Ten buckets; with near-unique prices, each holds ~n/10 rows
    (interpolated cut points guarantee +-1 around exact deciles)."""
    rows = warehouse.equi_depth_price_histogram(spark, SF_SMOKE).collect()
    assert sorted(r.bucket for r in rows) == list(range(1, 11))
    n = sum(r.n_orders for r in rows)
    for r in rows:
        assert abs(r.n_orders - n / 10) <= max(2, 0.02 * n)
        assert r.lo <= r.hi


def test_conversion_funnel_bounds(spark):
    r = warehouse.conversion_within_24h(spark, SF_SMOKE).collect()[0]
    assert 0 <= r.n_converted <= r.n_viewed
    assert 0.0 <= r.conversion_pct <= 100.0
    if r.n_converted:
        assert 0 < r.min_lag_us <= r.max_lag_us <= warehouse.CONV_WINDOW_US


def test_quantile_rank_normalize_bounds(spark):
    """pct_rank spans [0, 1] within every multi-member group, rank 1
    exists per group, ties share a normalized value."""
    from transcript_analysis_spark.plans.warehouse import (
        quantile_rank_normalize,
    )
    rows = quantile_rank_normalize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.c_nationkey, []).append(r)
    for g in by_group.values():
        assert min(r.rk for r in g) == 1
        assert all(0.0 <= r.pct_rank <= 1.0 for r in g)
        if len(g) > 1:
            assert max(r.pct_rank for r in g) == 1.0
            assert min(r.pct_rank for r in g) == 0.0
        vals: dict[float, float] = {}
        for r in g:
            if r.acctbal in vals:
                assert vals[r.acctbal] == r.pct_rank
            vals[r.acctbal] = r.pct_rank
