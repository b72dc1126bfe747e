"""Warehouse / lakehouse operators: multi-level rollups, snapshot
diffing (CDC), slowly-changing-dimension history, equi-depth
histograms, and join-key skew diagnosis.

These round out the OLAP surface a reference user would expect from a
general analytics engine (reference dashboard queries live in
``server/dashboard.py``; the reference has no rollup/CDC layer — this
is the "beyond the reference" warehouse tier).

Scale notes:

- ``sales_rollup_cube``: Spark's ``rollup`` computes every grouping
  level in ONE pass (Expand + single hash aggregate with map-side
  partials) — no per-level re-scan. At 100 TB the expand factor is the
  number of levels (3), not the cube of cardinalities.
- ``orders_snapshot_diff``: the CDC shape — full outer join of two
  snapshots on the primary key. Both sides shuffle ONCE on the key; on
  a cluster the snapshots are bucketed by key so the diff is a
  zero-shuffle sort-merge. Unchanged rows are filtered out BEFORE the
  result materializes, so output is O(churn), not O(table).
- ``scd2_user_state``: slowly-changing-dimension type-2 intervals from
  an event log. All windows are partitioned by user_id — parallelism
  scales with the user population, never a single-task global window.
- ``equi_depth_price_histogram``: equi-depth bucketing WITHOUT a
  global sort: decile cut points come from one ``percentile``
  aggregate (t-digest ``approx_percentile`` is the drop-in at 100 TB),
  are broadcast as one row, and bucket assignment is per-row JVM math.
  The ntile() alternative would serialize the table through one task.
- ``skew_key_diagnosis``: the measurement behind ``operators/skew.py``
  salting — per-key frequencies are one hash aggregate (map-side
  combined), the summary is O(distinct keys) -> 1 row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.functions.rounding import (duck_round_ratio,
                                                          spark_round_ratio)
from transcript_analysis_spark.plans.data_pipeline import _t
from transcript_analysis_spark.plans.registry import register
from transcript_analysis_spark.sources.tables import TABLES


# --- multi-level rollup --------------------------------------------------

@register(
    "sales_rollup_cube",
    oracle="""
    SELECT COALESCE(n.n_name, 'ALL') AS nation,
           COALESCE(o.o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(n.n_name) * 2 + GROUPING(o.o_orderpriority)
                AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY ROLLUP (n.n_name, o.o_orderpriority)
    """,
    tags=("warehouse", "rollup"),
)
def sales_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (nation -> priority -> grand total) in one
    pass: Spark's ``rollup`` expands each input row into one row per
    grouping level and aggregates them in a single hash aggregate, so
    the subtotal levels cost one Expand, not one scan each. The
    reference dashboard recomputes each breakdown as a separate query
    (server/dashboard.py); this is the one-pass warehouse form.

    ``grouping_id`` bit layout (first rollup column = high bit) is part
    of the SQL standard and identical in DuckDB's GROUPING(). NULL
    group keys are coalesced to 'ALL' so rolled-up levels are
    distinguishable from genuine NULL keys by ``gid`` alone.

    Empty-input caveat (engine divergence found by tools/diff_fuzz.py):
    Spark emits ZERO rows for grouping sets over an empty input where
    the SQL standard emits the grand-total row — unreachable here (the
    base tables are non-empty by contract) but pinned in
    tests/test_diff_fuzz.py for the day Spark goes standard."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (o.join(c, o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (joined.rollup("n_name", "o_orderpriority")
            .agg(F.grouping_id().cast("bigint").alias("gid"),
                 F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .select(F.coalesce("n_name", F.lit("ALL")).alias("nation"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                    "gid", "n_orders", "revenue"))


# --- snapshot diff (CDC) -------------------------------------------------
# Two deterministic snapshots derived from the orders table:
#   old = orders except keys divisible by 101   (those are "added" later)
#   new = orders except keys divisible by 107   ("removed"), with
#         totalprice doubled where key % 103 == 0 ("changed").
# Doubling a double is exact (exponent bump), so changed-row detection
# is engine-exact without any epsilon.

@register(
    "orders_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 101 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 103 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 107 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           ROUND(o.o_totalprice, 2) AS old_price,
           ROUND(n.o_totalprice, 2) AS new_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
          OR o.o_totalprice <> n.o_totalprice
    """,
    tags=("warehouse", "cdc"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the change-data-capture primitive: given two
    versions of a keyed table, emit added / removed / changed rows.
    One full outer join on the primary key (both sides shuffle once on
    the key; bucketed-by-key snapshots make it shuffle-free), unchanged
    rows filtered before materialization so output is O(churn)."""
    o = _t(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 101 != 0)
            .select("o_orderkey", "o_totalprice"))
    new = (o.filter(F.col("o_orderkey") % 107 != 0)
            .select("o_orderkey",
                    F.when(F.col("o_orderkey") % 103 == 0,
                           F.col("o_totalprice") * 2)
                     .otherwise(F.col("o_totalprice")).alias("o_totalprice")))
    j = old.alias("o").join(new.alias("n"),
                            F.col("o.o_orderkey") == F.col("n.o_orderkey"),
                            "full_outer")
    return (j.filter(F.col("o.o_orderkey").isNull()
                     | F.col("n.o_orderkey").isNull()
                     | (F.col("o.o_totalprice") != F.col("n.o_totalprice")))
            .select(
                F.coalesce("o.o_orderkey", "n.o_orderkey").alias("o_orderkey"),
                F.when(F.col("o.o_orderkey").isNull(), F.lit("added"))
                 .when(F.col("n.o_orderkey").isNull(), F.lit("removed"))
                 .otherwise(F.lit("changed")).alias("change_type"),
                F.round("o.o_totalprice", 2).alias("old_price"),
                F.round("n.o_totalprice", 2).alias("new_price")))


# --- SCD type-2 history --------------------------------------------------

@register(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, ts_us,
             SUM(is_change) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ),
    segs AS (
      SELECT user_id, event_type, run_id,
             MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type,
           valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us, run_id)
             AS valid_to_us,
           n_events
    FROM segs
    """,
    tags=("warehouse", "scd"),
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: per
    user, collapse consecutive same-type events into validity
    intervals [valid_from, valid_to) with valid_to = next interval's
    start (NULL = current state). The warehouse dimension-history op
    the reference's per-row status updates (island_worker.py UPDATE
    statements) would need for time-travel queries.

    Order key is (ts, event_id) so duplicate timestamps are
    deterministic. Every window is partitioned by user_id; the ts tie
    within a run cannot split it (run boundaries come from the lag
    comparison under the same total order)."""
    e = _t(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        F.when(F.lag("event_type").over(w).isNull()
               | (F.lag("event_type").over(w) != F.col("event_type")), 1)
         .otherwise(0).alias("is_change"))
    runs = ordered.withColumn(
        "run_id",
        F.sum("is_change").over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
                  .rowsBetween(Window.unboundedPreceding, 0)))
    segs = (runs.groupBy("user_id", "event_type", "run_id")
            .agg(F.min("ts_us").alias("valid_from_us"),
                 F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "run_id")
    return segs.select("user_id", "event_type", "valid_from_us",
                       F.lead("valid_from_us").over(w2).alias("valid_to_us"),
                       "n_events")


# --- equi-depth histogram ------------------------------------------------

_DECILES = [i / 10.0 for i in range(1, 10)]


@register(
    "equi_depth_price_histogram",
    oracle=f"""
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice,
                           {_DECILES!r}) AS qs
      FROM orders
    )
    SELECT CAST(len(list_filter(c.qs, q -> o.o_totalprice > q)) + 1
                AS INT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o.o_totalprice), 2) AS lo,
           ROUND(MAX(o.o_totalprice), 2) AS hi,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o CROSS JOIN cuts c
    GROUP BY bucket
    """,
    tags=("warehouse", "histogram"),
)
def equi_depth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram without a global sort: the nine
    cut points come from ONE ``percentile`` aggregate (identical
    linear interpolation to DuckDB's quantile_cont — proven by
    winsorized_order_stats), broadcast back as a single row, and each
    row's bucket is the count of cut points below it — per-row JVM
    array math. ntile() would order the whole table through one task;
    at 100 TB swap ``percentile`` for ``approx_percentile`` (t-digest)
    with the same plan shape."""
    o = _t(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr(f"percentile(o_totalprice, array({','.join(map(str, _DECILES))}))")
        .alias("qs"))
    return (o.join(F.broadcast(cuts))
            .select((F.size(F.filter(
                        "qs", lambda q: F.col("o_totalprice") > q)) + 1)
                    .cast("int").alias("bucket"),
                    "o_totalprice")
            .groupBy("bucket")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


# --- exponential time-decay (EWMA) ---------------------------------------

@register(
    "ewma_user_value",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND(SUM(value * POWER(0.5, n - rn)), 4) AS decayed_value
    FROM ranked GROUP BY user_id
    """,
    tags=("warehouse", "timeseries"),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed recency weighting per user (half-life =
    one event): the freshest event counts fully, each older one half
    as much — the recency-prior aggregation behind engagement scores
    and streaming feature stores. The decay weight 0.5^(n-rn) is a
    power of two, hence EXACT in binary floating point, so the only
    float operation is the final sum (rounded on both sides). Window
    partitioned by user_id — parallelism scales with users."""
    from pyspark.sql import Window
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = e.select(
        "user_id", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"))
    return (ranked.groupBy("user_id")
            .agg(F.max("n").cast("bigint").alias("n_events"),
                 F.round(F.sum(F.col("value")
                               * F.pow(F.lit(0.5),
                                       F.col("n") - F.col("rn"))), 4)
                 .alias("decayed_value")))


# --- grouped second-moment statistics ------------------------------------

@register(
    "group_correlation_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(stddev_pop(l_quantity), 4) AS qty_stddev,
           ROUND(stddev_pop(l_extendedprice), 2) AS price_stddev
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("warehouse", "statistics"),
)
def group_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group — correlation, population
    covariance, and standard deviations — the profiling pass a
    warehouse runs before trusting a column pair for modeling. One
    hash aggregate with map-side partial co-moments (Spark and DuckDB
    both stream Welford-style updates); correlation is scale-free so
    6 decimals sits far above the last-ulp accumulation noise."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("qty_price_corr"),
                 F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2)
                 .alias("qty_price_covar"),
                 F.round(F.stddev_pop("l_quantity"), 4).alias("qty_stddev"),
                 F.round(F.stddev_pop("l_extendedprice"), 2)
                 .alias("price_stddev")))


# --- long-to-wide pivot --------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PRIO_ALIAS = ("p1_urgent", "p2_high", "p3_medium", "p4_not_specified",
               "p5_low")


@register(
    "nation_priority_pivot",
    oracle=f"""
    SELECT n.n_name AS nation,
           {', '.join(
               f"COUNT(CASE WHEN o.o_orderpriority = '{p}' THEN 1 END)"
               f" AS {a}" for p, a in zip(_PRIORITIES, _PRIO_ALIAS))}
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    tags=("warehouse", "pivot"),
)
def nation_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide pivot (the pair of curation.py's status_unpivot):
    order counts per nation with one column per priority, via Spark's
    native ``pivot`` with EXPLICIT values — the explicit list keeps
    the plan to a single aggregate (no extra distinct-values scan) and
    the output schema deterministic. Missing cells coalesce to 0 to
    match SQL conditional-count semantics."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (o.join(c, o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    wide = (joined.groupBy(F.col("n_name").alias("nation"))
            .pivot("o_orderpriority", list(_PRIORITIES))
            .agg(F.count(F.lit(1))))
    return wide.select(
        "nation",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
          for p, a in zip(_PRIORITIES, _PRIO_ALIAS)])


# --- per-group linear regression -----------------------------------------

@register(
    "price_quantity_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4)
             AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("warehouse", "statistics"),
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit with the SQL-standard
    regr_* aggregates (price explained by quantity): slope, intercept
    and R^2 in ONE hash aggregate with map-side partial co-moments —
    the grouped-model-fit shape that replaces a per-group pandas loop.
    Scale-free R^2 rounds at 6; slope/intercept at the column's own
    scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6)
                 .alias("slope"),
                 F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4)
                 .alias("intercept"),
                 F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6)
                 .alias("r2")))


# --- robust (median/MAD) outlier profile ---------------------------------

MAD_K = 1.4826          # normal-consistency constant
MAD_SIGMAS = 3.0


@register(
    "mad_outlier_profile",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(d.med), 6) AS median_value,
           ROUND(MAX(m.mad), 6) AS mad,
           CAST(COUNT(CASE WHEN d.adev > {MAD_SIGMAS} * {MAD_K} * m.mad
                           THEN 1 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
    tags=("warehouse", "quality", "statistics"),
)
def mad_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median and MAD (median
    absolute deviation) instead of mean/stddev — the detector that
    does not let the outliers it hunts inflate its own threshold
    (complements the z-score `hourly_anomaly_flags`). Two grouped
    exact-percentile aggregates (group count is tiny; at 100 TB swap
    `approx_percentile`, same shape) with the medians broadcast back;
    the flag compare runs on identical doubles in both engines."""
    e = _t(spark, sf_dir, "events")
    med = (e.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5)").alias("med")))
    dev = (e.join(F.broadcast(med), "event_type")
           .select("event_type", "value", "med",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    mad = (dev.groupBy("event_type")
           .agg(F.expr("percentile(adev, 0.5)").alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.max("med"), 6).alias("median_value"),
                 F.round(F.max("mad"), 6).alias("mad"),
                 F.count(F.when(F.col("adev")
                                > MAD_SIGMAS * MAD_K * F.col("mad"), 1))
                 .cast("bigint").alias("n_outliers")))


# --- table profiler ------------------------------------------------------
# Numeric/timestamp columns report min/max as rounded doubles (epoch
# seconds for timestamps); string columns as strings — mixing them in
# one string column would hit engine-specific double formatting.

_PROFILE_COLS = (
    ("o_orderkey", "num"), ("o_custkey", "num"),
    ("o_orderstatus", "str"), ("o_totalprice", "num"),
    ("o_orderdate", "ts"), ("o_orderpriority", "str"),
)


def _profile_branch_sql(col: str, kind: str) -> str:
    if kind == "ts":
        v = f"epoch(o.{col})"
    elif kind == "num":
        v = f"o.{col}"
    else:
        v = None
    num_min = f"ROUND(CAST(MIN({v}) AS DOUBLE), 4)" if v else "NULL"
    num_max = f"ROUND(CAST(MAX({v}) AS DOUBLE), 4)" if v else "NULL"
    str_min = f"MIN(o.{col})" if kind == "str" else "NULL"
    str_max = f"MAX(o.{col})" if kind == "str" else "NULL"
    return f"""
      SELECT '{col}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(o.{col}) AS BIGINT) AS n_nonnull,
             CAST(COUNT(DISTINCT o.{col}) AS BIGINT) AS n_distinct,
             CAST({num_min} AS DOUBLE) AS min_num,
             CAST({num_max} AS DOUBLE) AS max_num,
             CAST({str_min} AS VARCHAR) AS min_str,
             CAST({str_max} AS VARCHAR) AS max_str
      FROM orders o"""


@register(
    "orders_table_profile",
    oracle=" UNION ALL ".join(_profile_branch_sql(c, k)
                              for c, k in _PROFILE_COLS),
    tags=("warehouse", "quality", "profiling"),
)
def orders_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile of the orders table — row counts,
    null counts, distinct cardinalities, and typed min/max per column
    (the first query a warehouse runs against an unfamiliar table, and
    the stats a quality gate pins before trusting a load). One
    aggregate per column unioned together; Spark runs the branches
    over one cached scan and each aggregate is map-side combined. At
    100 TB swap exact COUNT(DISTINCT) for approx_count_distinct or
    the portable HLL (hll_distinct_profile) — same plan shape."""
    o = _t(spark, sf_dir, "orders")
    parts = []
    for col, kind in _PROFILE_COLS:
        if kind == "ts":
            v = F.expr(f"unix_timestamp(cast({col} as timestamp))")
        elif kind == "num":
            v = F.col(col)
        else:
            v = None
        parts.append(o.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count(col).cast("bigint").alias("n_nonnull"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            (F.round(F.min(v).cast("double"), 4) if v is not None
             else F.lit(None).cast("double")).alias("min_num"),
            (F.round(F.max(v).cast("double"), 4) if v is not None
             else F.lit(None).cast("double")).alias("max_num"),
            (F.min(col) if kind == "str"
             else F.lit(None).cast("string")).alias("min_str"),
            (F.max(col) if kind == "str"
             else F.lit(None).cast("string")).alias("max_str"),
        ).select(F.lit(col).alias("column_name"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# --- time-bounded conversion funnel --------------------------------------

CONV_WINDOW_US = 24 * 3600 * 1_000_000  # 24h in microseconds


@register(
    "conversion_within_24h",
    oracle=f"""
    WITH first_view AS (
      SELECT user_id, MIN(epoch_us(ts)) AS view_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT v.user_id, v.view_us,
             MIN(epoch_us(p.ts)) AS purchase_us
      FROM first_view v
      JOIN events p
        ON p.user_id = v.user_id AND p.event_type = 'purchase'
       AND epoch_us(p.ts) > v.view_us
       AND epoch_us(p.ts) <= v.view_us + {CONV_WINDOW_US}
      GROUP BY v.user_id, v.view_us
    )
    SELECT CAST((SELECT COUNT(*) FROM first_view) AS BIGINT)
             AS n_viewed,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           {duck_round_ratio('COUNT(*) * 100',
                             '(SELECT COUNT(*) FROM first_view)', 4)}
             AS conversion_pct,
           CAST(MIN(purchase_us - view_us) AS BIGINT) AS min_lag_us,
           CAST(MAX(purchase_us - view_us) AS BIGINT) AS max_lag_us
    FROM conv
    """,
    tags=("warehouse", "funnel"),
)
def conversion_within_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: of users whose journey starts
    with a view, how many purchase within 24 hours of that FIRST view
    (the attribution-window form of funnel_view_click_purchase, which
    is unbounded). Two stages: first-view per user (one aggregate),
    then a range-bounded equi-join on user_id — the purchase side is
    pre-filtered to one event type before the shuffle, and the range
    predicate rides the same user_id join (no second shuffle). The
    conversion rate uses integer half-up rounding (engine-portable)."""
    e = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    first_view = (e.filter(F.col("event_type") == "view")
                  .groupBy("user_id")
                  .agg(F.min(us).alias("view_us")))
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", us.alias("p_us")))
    conv = (first_view.join(purchases, "user_id")
            .filter((F.col("p_us") > F.col("view_us"))
                    & (F.col("p_us") <= F.col("view_us") + CONV_WINDOW_US))
            .groupBy("user_id", "view_us")
            .agg(F.min("p_us").alias("purchase_us")))
    totals = first_view.agg(F.count("*").cast("bigint").alias("n_viewed"))
    return (conv.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.min(F.col("purchase_us") - F.col("view_us")).cast("bigint")
        .alias("min_lag_us"),
        F.max(F.col("purchase_us") - F.col("view_us")).cast("bigint")
        .alias("max_lag_us"))
        .join(F.broadcast(totals))
        .select("n_viewed", "n_converted",
                spark_round_ratio("n_converted * 100", "n_viewed", 4)
                .alias("conversion_pct"),
                "min_lag_us", "max_lag_us"))


# --- join-key skew diagnosis ---------------------------------------------

@register(
    "skew_key_diagnosis",
    oracle=f"""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt
      FROM orders GROUP BY o_custkey
    ),
    summary AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM per_key
    )
    SELECT s.n_rows, s.n_keys, s.max_cnt,
           (SELECT MIN(key) FROM per_key p WHERE p.cnt = s.max_cnt)
             AS heaviest_key,
           {duck_round_ratio('s.n_rows', 's.n_keys', 4)} AS avg_per_key,
           {duck_round_ratio('s.max_cnt * s.n_keys', 's.n_rows', 4)}
             AS skew_ratio,
           CAST((s.max_cnt * s.n_keys) // s.n_rows + 1 AS BIGINT)
             AS salt_buckets
    FROM summary s
    """,
    tags=("warehouse", "skew"),
)
def skew_key_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew measurement — the stats behind a salting decision
    (operators/skew.py applies it): per-key frequencies in one
    map-side-combined hash aggregate, then an O(distinct keys) summary
    giving the hottest key, the max/avg skew ratio, and the salt
    fan-out that would level the hottest key to the average
    (skew_ratio rounded via integer half-up — engine-portable).
    Heaviest-key ties resolve to the smallest key on both engines."""
    o = _t(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("cnt"))
    summary = per_key.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min(F.struct((-F.col("cnt")).alias("neg"),
                       F.col("key").alias("key"))).alias("_top"))
    return summary.select(
        "n_rows", "n_keys", "max_cnt",
        F.col("_top.key").alias("heaviest_key"),
        spark_round_ratio("n_rows", "n_keys", 4).alias("avg_per_key"),
        spark_round_ratio("max_cnt * n_keys", "n_rows", 4).alias("skew_ratio"),
        (F.expr("(max_cnt * n_keys) div n_rows") + 1).cast("bigint")
        .alias("salt_buckets"))


# --- join cardinality estimation -----------------------------------------

@register(
    "join_cardinality_estimate",
    oracle="""
    WITH ca AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
    ),
    cb AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    pred AS (
      SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS predicted_rows,
             CAST(COUNT(*) AS BIGINT) AS n_matching_keys
      FROM ca JOIN cb ON cb.k = ca.k
    )
    SELECT p.predicted_rows, p.n_matching_keys,
           CAST((SELECT COUNT(*)
                 FROM orders o JOIN lineitem l
                   ON l.l_orderkey = o.o_orderkey) AS BIGINT)
             AS actual_rows
    FROM pred p
    """,
    tags=("warehouse", "optimizer"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality from per-key histograms BEFORE
    running the join: |A join B| = sum over keys of cA(k)*cB(k). The
    histogram join is O(distinct keys) — a fraction of the real join's
    shuffle — which is how an engine (or an operator author) decides
    whether a planned join will explode before paying for it; the
    CBO-statistics story as a runnable operator. The actual join count
    is emitted beside the prediction, so the oracle also certifies the
    identity itself."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ca = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("ca"))
    cb = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("cb"))
    pred = (ca.join(cb, "k")
            .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint")
                 .alias("predicted_rows"),
                 F.count("*").cast("bigint").alias("n_matching_keys")))
    actual = (o.join(li, o.o_orderkey == li.l_orderkey)
              .agg(F.count("*").cast("bigint").alias("actual_rows")))
    return pred.join(F.broadcast(actual))


# --- BI time-intelligence ------------------------------------------------

@register(
    "monthly_revenue_yoy",
    oracle="""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mon, revenue,
           LAG(revenue) OVER (PARTITION BY mon ORDER BY yr)
             AS prev_year_revenue,
           ROUND((revenue - LAG(revenue) OVER (PARTITION BY mon
                                               ORDER BY yr))
                 / LAG(revenue) OVER (PARTITION BY mon ORDER BY yr)
                 * 100, 4) AS yoy_pct
    FROM monthly
    """,
    tags=("warehouse", "timeseries"),
)
def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per calendar month — the warehouse
    time-intelligence staple (LAG across the year axis, PARTITIONED by
    month-of-year so no window ever serializes more than one month's
    year-series; input is pre-aggregated to O(months)). The growth
    ratio divides the ROUNDED revenues, so both engines divide
    identical doubles."""
    from pyspark.sql import Window
    o = _t(spark, sf_dir, "orders")
    monthly = (o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    w = Window.partitionBy("mon").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "yr", "mon", "revenue",
        prev.alias("prev_year_revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("yoy_pct"))


@register(
    "nation_revenue_share",
    oracle="""
    WITH per_nation AS (
      SELECT n.n_name AS nation, ROUND(SUM(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    tot AS (SELECT ROUND(SUM(revenue), 2) AS total FROM per_nation)
    SELECT p.nation, p.revenue,
           ROUND(p.revenue / t.total * 100, 6) AS share_pct,
           CAST(1 + (SELECT COUNT(*) FROM per_nation q
                     WHERE q.revenue > p.revenue
                        OR (q.revenue = p.revenue AND q.nation < p.nation))
                AS BIGINT) AS revenue_rank
    FROM per_nation p CROSS JOIN tot t
    """,
    tags=("warehouse", "analytics"),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total revenue and rank per nation. The rank comes
    from a self-join over the 25-row AGGREGATED frame (count of
    strictly-better rows) — the ranking never touches a global window
    and its cost is bounded by the group count squared, not the fact
    table. Shares divide rounded doubles on both engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_nation = (o.join(c, o.o_custkey == c.c_custkey)
                  .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
                  .groupBy(F.col("n_name").alias("nation"))
                  .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    per_nation = per_nation.localCheckpoint(eager=False)
    tot = per_nation.agg(F.round(F.sum("revenue"), 2).alias("total"))
    other = per_nation.select(F.col("nation").alias("q_nation"),
                              F.col("revenue").alias("q_revenue"))
    better = (per_nation.join(
        other,
        (F.col("q_revenue") > F.col("revenue"))
        | ((F.col("q_revenue") == F.col("revenue"))
           & (F.col("q_nation") < F.col("nation"))), "left")
        .groupBy("nation", "revenue")
        .agg((F.count("q_nation") + 1).cast("bigint").alias("revenue_rank")))
    return (better.join(F.broadcast(tot))
            .select("nation", "revenue",
                    F.round(F.col("revenue") / F.col("total") * 100, 6)
                    .alias("share_pct"),
                    "revenue_rank"))


# --- RFM customer segmentation -------------------------------------------

@register(
    "rfm_customer_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(epoch_us(o_orderdate)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(last_us, [CAST(0.3333333333333333 AS DOUBLE),
                                    CAST(0.6666666666666666 AS DOUBLE)]) AS rq,
             quantile_cont(CAST(frequency AS DOUBLE),
                           [CAST(0.3333333333333333 AS DOUBLE),
                            CAST(0.6666666666666666 AS DOUBLE)]) AS fq,
             quantile_cont(monetary, [CAST(0.3333333333333333 AS DOUBLE),
                                      CAST(0.6666666666666666 AS DOUBLE)]) AS mq
      FROM rfm
    )
    SELECT r.custkey, r.frequency, r.monetary,
           CAST(1 + len(list_filter(c.rq, q -> r.last_us > q)) AS INT)
             AS r_score,
           CAST(1 + len(list_filter(c.fq, q -> r.frequency > q)) AS INT)
             AS f_score,
           CAST(1 + len(list_filter(c.mq, q -> r.monetary > q)) AS INT)
             AS m_score
    FROM rfm r CROSS JOIN cuts c
    """,
    tags=("warehouse", "segmentation"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: per-customer
    stats in one aggregate, tercile scores 1-3 per axis assigned
    against ONE broadcast row of quantile cut points — the equi-depth
    pattern again (never an ntile window over the customer table).
    Monetary terciles cut on the ROUNDED totals so both engines
    compare identical doubles."""
    o = _t(spark, sf_dir, "orders")
    rfm = (o.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.max(F.expr("unix_micros(cast(o_orderdate as timestamp))"))
                .alias("last_us"),
                F.count("*").cast("bigint").alias("frequency"),
                F.round(F.sum("o_totalprice"), 2).alias("monetary")))
    terciles = ("array(cast(0.3333333333333333 as double),"
                " cast(0.6666666666666666 as double))")
    cuts = rfm.agg(
        F.expr(f"percentile(last_us, {terciles})").alias("rq"),
        F.expr(f"percentile(cast(frequency as double), {terciles})")
        .alias("fq"),
        F.expr(f"percentile(monetary, {terciles})").alias("mq"))
    score = lambda cut, v: (F.size(F.filter(cut, lambda q: F.col(v) > q))  # noqa: E731
                            + 1).cast("int")
    return (rfm.join(F.broadcast(cuts))
            .select("custkey", "frequency", "monetary",
                    score("rq", "last_us").alias("r_score"),
                    score("fq", "frequency").alias("f_score"),
                    score("mq", "monetary").alias("m_score")))


# --- corpus Zipf fit -----------------------------------------------------

@register(
    "corpus_zipf_fit",
    oracle="""
    WITH freq AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    counts AS (SELECT w, COUNT(*) AS c FROM freq GROUP BY w),
    ranked AS (
      SELECT a.w, a.c,
             1 + (SELECT COUNT(*) FROM counts b
                  WHERE b.c > a.c OR (b.c = a.c AND b.w < a.w)) AS rnk
      FROM counts a
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(ln(CAST(c AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
           ROUND(regr_r2(ln(CAST(c AS DOUBLE)),
                         ln(CAST(rnk AS DOUBLE))), 6) AS fit_r2
    FROM ranked
    """,
    tags=("text", "statistics"),
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: OLS slope of
    log(freq) on log(rank) (a natural corpus sits near -1; a corpus
    of boilerplate or template spam does not — a one-row corpus
    health check). Frequency ranking is a self-join COUNT over the
    vocabulary-sized aggregate (bounded by |vocab|^2, never a global
    window); the regression is one regr_* aggregate."""
    d = _t(spark, sf_dir, "documents")
    counts = (d.select(F.explode(F.split("text", " ")).alias("w"))
              .groupBy("w").agg(F.count("*").alias("c"))
              .localCheckpoint(eager=False))
    b = counts.select(F.col("w").alias("bw"), F.col("c").alias("bc"))
    ranked = (counts.join(
        b, (F.col("bc") > F.col("c"))
        | ((F.col("bc") == F.col("c")) & (F.col("bw") < F.col("w"))),
        "left")
        .groupBy("w", "c")
        .agg((F.count("bw") + 1).alias("rnk")))
    lc = F.log(F.col("c").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lc, lr), 6).alias("fit_r2"))


# --- inter-event think-time histogram ------------------------------------

@register(
    "interevent_time_histogram",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT CAST(FLOOR(log2(CAST(gap_us AS DOUBLE) / 1000000.0 + 1.0))
                AS INT) AS gap_bucket_log2s,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
    tags=("warehouse", "timeseries"),
)
def interevent_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Think-time distribution: per-user inter-event gaps bucketed on
    a log2-seconds scale — the profile that picks a sessionization gap
    parameter from data instead of folklore (the 30-minute default of
    session_windows_per_user becomes an informed choice). One
    user-partitioned lag + one hash aggregate; log2 of identical
    doubles buckets identically in both engines."""
    from pyspark.sql import Window
    e = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select((us - F.lag(us).over(w)).alias("gap_us"))
    return (gaps.filter(F.col("gap_us").isNotNull())
            .select(F.floor(F.log2(F.col("gap_us").cast("double")
                                   / 1000000.0 + 1.0))
                    .cast("int").alias("gap_bucket_log2s"))
            .groupBy("gap_bucket_log2s")
            .agg(F.count("*").cast("bigint").alias("n_gaps")))


# --- market-basket part affinity -----------------------------------------

@register(
    "part_affinity_top20",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
      FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT okey) AS n FROM baskets),
    part_freq AS (SELECT part, COUNT(*) AS f FROM baskets GROUP BY part),
    pairs AS (
      SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS support
      FROM baskets a JOIN baskets b
        ON b.okey = a.okey AND b.part > a.part
      GROUP BY a.part, b.part
    )
    SELECT p.part_a, p.part_b, p.support,
           {duck_round_ratio('p.support * n.n',
                             'fa.f * fb.f', 6)} AS lift
    FROM pairs p
    JOIN part_freq fa ON fa.part = p.part_a
    JOIN part_freq fb ON fb.part = p.part_b
    CROSS JOIN n_orders n
    ORDER BY p.support DESC, p.part_a, p.part_b LIMIT 20
    """,
    tags=("mining", "warehouse"),
)
def part_affinity_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over real baskets (parts co-purchased in
    one order) with LIFT = P(a,b)/(P(a)P(b)) — support alone surfaces
    popular parts, lift surfaces parts bought together BECAUSE of each
    other. Pair growth is bounded by (parts per order)^2 per order,
    not corpus^2; the frequency lookups are vocabulary-sized joins and
    the lift is an exact integer ratio (half-up rounded) because
    support and frequencies are counts. Top-20 by support is a
    TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = (li.select(F.col("l_orderkey").alias("okey"),
                         F.col("l_partkey").alias("part")).distinct()
               .localCheckpoint(eager=False))
    n_orders = baskets.agg(F.countDistinct("okey").alias("n"))
    part_freq = baskets.groupBy("part").agg(F.count("*").alias("f"))
    b = baskets.select(F.col("okey").alias("b_okey"),
                       F.col("part").alias("part_b"))
    pairs = (baskets.join(b, (F.col("b_okey") == F.col("okey"))
                          & (F.col("part_b") > F.col("part")))
             .groupBy(F.col("part").alias("part_a"), "part_b")
             .agg(F.count("*").alias("support")))
    fa = part_freq.select(F.col("part").alias("part_a"),
                          F.col("f").alias("fa"))
    fb = part_freq.select(F.col("part").alias("part_b"),
                          F.col("f").alias("fb"))
    return (pairs.join(fa, "part_a").join(fb, "part_b")
            .join(F.broadcast(n_orders))
            .select("part_a", "part_b", "support",
                    spark_round_ratio("support * n", "fa * fb", 6)
                    .alias("lift"))
            .orderBy(F.desc("support"), "part_a", "part_b").limit(20))


# --- supplier lead-time profile ------------------------------------------

@register(
    "supplier_lead_time_stats",
    oracle="""
    WITH lead AS (
      SELECT l.l_suppkey AS suppkey,
             CAST(GREATEST(0, epoch_us(l.l_shipdate)
                              - epoch_us(o.o_orderdate))
                  // 86400000000 AS BIGINT) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           CAST(MIN(lead_days) AS BIGINT) AS min_days,
           ROUND(quantile_cont(CAST(lead_days AS DOUBLE), 0.5), 4)
             AS median_days,
           ROUND(quantile_cont(CAST(lead_days AS DOUBLE), 0.95), 4)
             AS p95_days,
           CAST(MAX(lead_days) AS BIGINT) AS max_days
    FROM lead GROUP BY suppkey
    """,
    tags=("warehouse", "statistics"),
)
def supplier_lead_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per supplier (min / median / p95 / max
    in whole days) — the operational-SLA profile behind supplier
    scorecards. One fact-fact equi-join on the order key (both sides
    partition on it; bucketed tables make it shuffle-free) and one
    grouped exact-percentile aggregate; `approx_percentile` is the
    stated swap at 100 TB. Day arithmetic is integer floor-division of
    microsecond epochs — identical truncation in both engines for the
    non-negative lead times."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lead = (li.join(o, li.l_orderkey == o.o_orderkey)
            .select(F.col("l_suppkey").alias("suppkey"),
                    # GREATEST(0, ·): a data-error negative lead would
                    # split the engines (Spark `div` truncates toward
                    # zero, DuckDB `//` floors) — clamp BEFORE dividing
                    # so both integer divisions see non-negatives.
                    F.expr("greatest(0,"
                           " unix_micros(cast(l_shipdate as timestamp))"
                           " - unix_micros(cast(o_orderdate as timestamp)))"
                           " div 86400000000").cast("bigint")
                    .alias("lead_days")))
    return (lead.groupBy("suppkey")
            .agg(F.count("*").cast("bigint").alias("n_shipments"),
                 F.min("lead_days").cast("bigint").alias("min_days"),
                 F.round(F.expr("percentile(cast(lead_days as double), 0.5)"),
                         4).alias("median_days"),
                 F.round(F.expr("percentile(cast(lead_days as double),"
                                " 0.95)"), 4).alias("p95_days"),
                 F.max("lead_days").cast("bigint").alias("max_days")))


# --- CDC apply (inverse of the snapshot diff) ----------------------------

@register(
    "cdc_apply_changes",
    oracle="""
    SELECT o_orderkey,
           ROUND(CASE WHEN o_orderkey % 103 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END, 2) AS o_totalprice
    FROM orders WHERE o_orderkey % 107 <> 0
    """,
    tags=("warehouse", "cdc"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — the inverse of `orders_snapshot_diff`: replay the
    change feed (added / removed / changed) onto the old snapshot and
    emit the reconstructed new snapshot. The Spark side composes the
    REGISTERED diff query (so the feed cannot drift from it), while
    the oracle simply states the target snapshot — the cross-engine
    hash therefore proves the round trip apply(old, diff(old, new))
    == new, which is the correctness contract of any MERGE-based
    downstream sync (reference parity: island_worker.py's
    INSERT ... ON CONFLICT apply loop, done as one declarative plan).

    Plan shape: one full-outer join on the snapshot key (the same
    shuffle the diff itself needs; bucketed-by-key snapshots make
    both shuffle-free), per-row CASE arbitration, O(snapshot) output
    with the feed side broadcast when churn is small."""
    o = _t(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 101 != 0)
            .select("o_orderkey", "o_totalprice"))
    feed = orders_snapshot_diff(spark, sf_dir)
    j = old.alias("o").join(
        feed.alias("d"),
        F.col("o.o_orderkey") == F.col("d.o_orderkey"), "full_outer")
    return (j.filter(F.coalesce(F.col("d.change_type"), F.lit("keep"))
                     != "removed")
            .select(
                F.coalesce("o.o_orderkey", "d.o_orderkey")
                 .alias("o_orderkey"),
                F.round(
                    F.when(F.col("d.change_type").isin("added", "changed"),
                           F.col("d.new_price"))
                     .otherwise(F.col("o.o_totalprice")), 2)
                 .alias("o_totalprice")))


# --- per-group percentile-rank normalization -----------------------------

@register(
    "quantile_rank_normalize",
    oracle=f"""
    WITH ranked AS (
      SELECT c_custkey, c_nationkey,
             ROUND(c_acctbal, 2) AS acctbal,
             RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
               AS rk,
             CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n
      FROM customer
    )
    SELECT c_custkey, c_nationkey, acctbal,
           CAST(rk AS BIGINT) AS rk, n,
           CASE WHEN n <= 1 THEN CAST(0.0 AS DOUBLE)
                ELSE {duck_round_ratio('rk - 1', 'n - 1', 6)}
           END AS pct_rank
    FROM ranked
    """,
    tags=("warehouse", "stats", "normalize"),
)
def quantile_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group percentile-rank normalization — the rank-based
    feature transform (maps any skewed per-group distribution onto
    [0, 1], robust to outliers where z-scoring is not): within each
    nation, a customer's balance becomes (rank-1)/(n-1) with RANK
    semantics for ties, so equal balances normalize identically.

    All inputs to the ratio are exact integers (rank, group size), so
    the half-up-rounded output is engine-deterministic. Every window
    is group-partitioned — no global sort, no single-task stage; at
    scale this is one shuffle on the group key."""
    from pyspark.sql import Window
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    wn = Window.partitionBy("c_nationkey")
    ranked = c.select(
        "c_custkey", "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).cast("long").alias("rk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"))
    pct = F.when(F.col("n") <= 1, F.lit(0.0)).otherwise(
        spark_round_ratio("rk - 1", "n - 1", 6))
    return ranked.select("c_custkey", "c_nationkey", "acctbal",
                         "rk", "n", pct.alias("pct_rank"))


# --- catalog row counts (inspect_schema.py parity, new r8) ----------------

@register(
    "catalog_row_counts",
    # Built from the SAME sources.tables.TABLES list the Spark side
    # iterates — one source of truth, so adding a table can never
    # silently desync the two sides (r8 advice item).
    oracle=" UNION ALL ".join(
        f"SELECT CAST('{t}' AS VARCHAR) AS table_name, "
        f"CAST(COUNT(*) AS BIGINT) AS row_count FROM {t}"
        for t in TABLES),
    tags=("warehouse", "catalog", "A1"),
)
def catalog_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-table row counts across the whole catalog — the
    countable half of the reference's `inspect_schema.py:33-87`
    catalog walk (its schema/layout half is the `describe_tables`
    facade in sources/tables.py, which answers from parquet footers
    without a scan; THIS query states the same counts as a verifiable
    plan). Ten one-row count aggregates unioned: each is map-side
    combined, none shuffles more than a single long per partition."""
    from transcript_analysis_spark.sources.tables import TABLES, load_table
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.count("*").cast("bigint").alias("row_count"))
        .select(F.lit(t).alias("table_name"), "row_count")
        for t in TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
