"""Batch-equivalent window queries over `events` (SURVEY §2.9).

The reference has no true stream processing — its incremental
constructs (T1-T5) are restartable batch. The Spark-native
generalization is windowed event-time processing; these queries are
the deterministic batch forms (oracle-checked), and
`transcript_analysis_spark/streaming/windows.py` runs the same logic
as Structured Streaming with watermarks (tested against these batch
results in tests/test_streaming.py).

Timestamp parity: events.ts is nanosecond-precision parquet; Spark
reads micros (see sources/tables.py), DuckDB reads nanos. All group
keys and outputs are truncated to whole seconds or coarser, so both
engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transcript_analysis_spark.functions.rounding import duck_round_ratio
from transcript_analysis_spark.plans.registry import register
from transcript_analysis_spark.sources.tables import load_table

SESSION_GAP_SEC = 1800  # 30 min


@register(
    "tumbling_hourly_event_stats",
    oracle="""
    SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*)            AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    headline=True,
    tags=("T1", "streaming", "window"),
)
def tumbling_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form). The streaming
    form is the same plan with readStream + withWatermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.countDistinct("user_id").alias("n_users"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n_events", "sum_value", "n_users")
    )


@register(
    "sliding_10min_event_stats",
    oracle="""
    WITH cand AS (
      SELECT e.*, unnest([
               time_bucket(INTERVAL '5 minutes', ts),
               time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
             ]) AS window_start
      FROM events e
    )
    SELECT STRFTIME(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM cand
    GROUP BY cand.window_start
    """,
    tags=("streaming", "window"),
)
def sliding_10min_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide (each event
    belongs to exactly 2 windows). Spark's `window(ts, len, slide)`
    replicates rows per overlapping window; the oracle derives the same
    two epoch-aligned starts per event."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "n_events", "sum_value")
    )


@register(
    "session_windows_per_user",
    oracle=f"""
    WITH e AS (
      SELECT user_id, value,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, value, sec,
             CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec)
                       > {SESSION_GAP_SEC}
                  OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, value, sec,
             -- CAST: DuckDB SUM(INTEGER) yields HUGEINT, which pandas
             -- canonicalizes to float64; Spark's sum is BIGINT. The
             -- driver hashes through pandas, so dtypes must agree.
             CAST(SUM(new_session) OVER (
                    PARTITION BY user_id ORDER BY sec
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(sec)             AS session_start_sec,
           MAX(sec)             AS session_end_sec,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    headline=True,
    tags=("streaming", "session"),
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user gaps-and-islands with a 30-minute
    inactivity gap (the reference's T2 task-claim sessions generalized;
    streaming form uses `session_window()`). Boundaries computed on
    whole-second epochs so both engines agree exactly.

    Note: ties on the same second sort together; the cumulative-flag
    formulation is order-stable because the flag depends only on the
    sec values, not row order within a second."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "value",
        F.unix_timestamp("ts").alias("sec"))
    w = Window.partitionBy("user_id").orderBy("sec")
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("sec").over(w).isNull()
               | ((F.col("sec") - F.lag("sec").over(w)) > SESSION_GAP_SEC), 1)
         .otherwise(0))
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.min("sec").alias("session_start_sec"),
             F.max("sec").alias("session_end_sec"),
             F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("streaming", "W6"),
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition matrix (lag over event time) — the
    ordered-iteration-with-state family W6 as a window function."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "event_id",
                 F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "vtt_timestamp_parse",
    oracle="""
    WITH vtt AS (
      SELECT event_id,
             STRFTIME(ts, '%H:%M:%S') || '.' ||
             LPAD(CAST(event_id % 1000 AS VARCHAR), 3, '0') AS vtt_ts
      FROM events
    )
    SELECT event_id, vtt_ts,
           ROUND(CAST(SPLIT_PART(vtt_ts, ':', 1) AS BIGINT) * 3600
                 + CAST(SPLIT_PART(vtt_ts, ':', 2) AS BIGINT) * 60
                 + CAST(SPLIT_PART(SPLIT_PART(vtt_ts, ':', 3), '.', 1) AS BIGINT)
                 + CAST(SPLIT_PART(vtt_ts, '.', 2) AS BIGINT)
                   / CAST(1000.0 AS DOUBLE), 3) AS seconds
    FROM vtt
    """,
    tags=("date", "scalar"),
)
def vtt_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VTT caption timestamp parsing HH:MM:SS.mmm -> seconds
    (reference `update_missing_transcripts.py:117-123`, the yt-dlp
    fallback path) as pure string/arithmetic expressions; VTT strings
    derived deterministically from events for the oracle."""
    e = load_table(spark, sf_dir, "events")
    vtt = e.select(
        "event_id",
        F.concat(F.date_format("ts", "HH:mm:ss"), F.lit("."),
                 F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0"))
         .alias("vtt_ts"))
    part = lambda i: F.split("vtt_ts", ":").getItem(i)
    return vtt.select(
        "event_id", "vtt_ts",
        F.round(part(0).cast("long") * 3600
                + part(1).cast("long") * 60
                + F.split(part(2), r"\.").getItem(0).cast("long")
                + F.split("vtt_ts", r"\.").getItem(1).cast("long")
                  / F.lit(1000.0), 3).alias("seconds"))


@register(
    "stale_events_cleanup",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS mx FROM events)
    SELECT COUNT(*) FILTER (WHERE ts <  a.mx - INTERVAL 7 DAY)  AS n_stale,
           COUNT(*) FILTER (WHERE ts >= a.mx - INTERVAL 7 DAY)  AS n_fresh,
           STRFTIME(a.mx - INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS cutoff
    FROM events, anchor a
    GROUP BY a.mx
    """,
    tags=("date", "T-family"),
)
def stale_events_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-window cleanup predicate — `NOW() - INTERVAL '30
    days'` (reference `server/state_task_server.py:117-119`), anchored
    to max event time for determinism."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    cutoff = F.col("mx") - F.expr("INTERVAL 7 DAYS")
    return (e.crossJoin(F.broadcast(anchor))
            .groupBy("mx")
            .agg(F.count(F.when(F.col("ts") < cutoff, 1)).alias("n_stale"),
                 F.count(F.when(F.col("ts") >= cutoff, 1)).alias("n_fresh"))
            .select(
                "n_stale", "n_fresh",
                F.date_format(cutoff, "yyyy-MM-dd HH:mm:ss").alias("cutoff")))


@register(
    "asof_purchase_context",
    oracle="""
    WITH p AS (
      SELECT user_id, date_trunc('second', ts) AS pts,
             MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, date_trunc('second', ts)
    )
    SELECT e.event_type,
           COUNT(*)                          AS n_events,
           COUNT(p.purchase_value)           AS n_matched,
           ROUND(AVG(p.purchase_value), 4)   AS avg_asof_purchase
    FROM events e
    ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.pts
    GROUP BY e.event_type
    """,
    headline=True,
    tags=("asof", "custom-operator"),
)
def asof_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — attach each event's most recent preceding purchase
    value per user (operators/asof.py: union-then-window composition,
    since Spark has no native ASOF JOIN; the oracle uses DuckDB's
    native ASOF JOIN, so the composition is checked against a real
    engine implementation). Purchases are second-truncated and deduped
    per (user, second) so both engines resolve ties identically."""
    from transcript_analysis_spark.operators.asof import asof_join
    e = load_table(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id",
                          F.date_trunc("second", "ts").alias("ts"))
                 .agg(F.max("value").alias("purchase_value")))
    joined = asof_join(e.select("event_id", "user_id", "ts", "event_type"),
                       purchases, key="user_id", ts="ts",
                       payload_cols=["purchase_value"])
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("asof_purchase_value").alias("n_matched"),
                 F.round(F.avg("asof_purchase_value"), 4)
                  .alias("avg_asof_purchase")))


@register(
    "hourly_to_daily_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS n, SUM(value) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT STRFTIME(date_trunc('day', h), '%Y-%m-%d') AS day,
           event_type,
           CAST(SUM(n) AS BIGINT)  AS n_events,
           ROUND(SUM(v), 2)        AS sum_value,
           COUNT(*)                AS active_hours
    FROM hourly GROUP BY date_trunc('day', h), event_type
    """,
    tags=("rollup", "hypertable"),
)
def hourly_to_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the hypertable/continuous-aggregate
    pattern): daily stats derived FROM the hourly pre-aggregate, not
    the raw events — sums-of-sums re-aggregation, which is how a
    materialized hourly table serves coarser granularities for free at
    scale."""
    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")))
    return (hourly.groupBy(F.date_format(F.date_trunc("day", "h"),
                                         "yyyy-MM-dd").alias("day"),
                           "event_type")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.round(F.sum("v"), 2).alias("sum_value"),
                 F.count(F.lit(1)).alias("active_hours")))


@register(
    "events_dedup_first",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, date_trunc('second', ts)
               ORDER BY event_id) AS rk
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dupes_removed
    FROM ranked GROUP BY event_type
    """,
    tags=("dedup", "streaming", "U3"),
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-log dedup, keep-first semantics: collapse retried/
    double-delivered events on the (user, type, second) natural key,
    keeping the lowest event_id — the batch form of streaming
    `dropDuplicates` on an at-least-once feed (T2's delivery model).
    One window shuffle on the dedup key; at scale the same key is the
    stream's partitioning so the dedup is local per partition."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type",
                           F.date_trunc("second", "ts")).orderBy("event_id")
    ranked = e.withColumn("rk", F.row_number().over(w))
    return (ranked.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).cast("long")
                  .alias("n_unique"),
                 F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).cast("long")
                  .alias("n_dupes_removed")))


@register(
    "time_weighted_value",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
             CAST(ROUND(value * 100, 0) AS BIGINT)               AS cents,
             event_id
      FROM events
    ),
    stepped AS (
      SELECT event_type, cents,
             LEAD(sec) OVER (PARTITION BY event_type
                             ORDER BY sec, event_id) - sec AS dt
      FROM seq
    )
    SELECT event_type,
           COUNT(*)                 AS n_intervals,
           CAST(SUM(dt) AS BIGINT)  AS total_sec,
           {duck_round_ratio("SUM(cents * dt)", "SUM(dt) * 100", 6)}
             AS time_weighted_avg
    FROM stepped WHERE dt IS NOT NULL
    GROUP BY event_type
    """,
    tags=("timeseries", "window", "W6"),
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per event type (the TimescaleDB
    `time_weight` pattern): each reading holds until the next one, so
    the mean weights each value by its interval. Values are scaled to
    integer cents BEFORE the weighted sum so the big sum is exact
    int64 arithmetic — a float weighted sum's rounding would depend on
    engine summation order."""
    from transcript_analysis_spark.functions.rounding import \
        spark_round_ratio
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        "event_type", "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    stepped = seq.select(
        "event_type", "cents",
        (F.lead("sec").over(w) - F.col("sec")).alias("dt"))
    return (stepped.filter(F.col("dt").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("dt").cast("long").alias("total_sec"),
                 spark_round_ratio("sum(cents * dt)", "sum(dt) * 100", 6)
                  .alias("time_weighted_avg")))


@register(
    "weekly_cohort_retention",
    oracle="""
    WITH wk AS (
      SELECT user_id, date_trunc('week', ts) AS w
      FROM events GROUP BY user_id, date_trunc('week', ts)
    ),
    cohort AS (SELECT user_id, MIN(w) AS cw FROM wk GROUP BY user_id)
    SELECT STRFTIME(c.cw, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(w.w) - epoch(c.cw)) / 604800 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_users
    FROM wk w JOIN cohort c USING (user_id)
    GROUP BY c.cw, week_offset
    """,
    tags=("timeseries", "cohort"),
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active week, counted
    in each subsequent week they return — the standard engagement
    triangle. Two aggregations plus one equi-join on user_id; both
    engines truncate weeks to ISO Mondays in UTC so the keys match
    exactly."""
    e = load_table(spark, sf_dir, "events")
    wk = (e.select("user_id", F.date_trunc("week", "ts").alias("w"))
          .distinct())
    cohort = wk.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (wk.join(cohort, "user_id")
            .select(F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
                    ((F.unix_timestamp("w") - F.unix_timestamp("cw"))
                     / 604800).cast("long").alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


@register(
    "funnel_view_click_purchase",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
      FROM events
    ),
    v AS (SELECT user_id, MIN(sec) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(sec) AS t2
          FROM e JOIN v ON v.user_id = e.user_id AND e.sec > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(sec) AS t3
          FROM e JOIN c ON c.user_id = e.user_id AND e.sec > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after,
           (SELECT COUNT(*) FROM p) AS n_purchased_after,
           {duck_round_ratio("(SELECT COUNT(*) FROM c)",
                             "(SELECT COUNT(*) FROM v)", 6)}
             AS click_rate,
           {duck_round_ratio("(SELECT COUNT(*) FROM p)",
                             "(SELECT COUNT(*) FROM v)", 6)}
             AS purchase_rate
    """,
    tags=("funnel", "timeseries"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click which
    precedes a purchase (strictly increasing whole seconds — same-
    second ties are excluded identically in both engines). Three
    min-aggregates joined on user_id, each step's input bounded by the
    previous stage's survivors; no window, no self-join over raw
    events x events."""
    from transcript_analysis_spark.functions.rounding import \
        spark_round_ratio
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec"))
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("sec").alias("t1")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id").filter(F.col("sec") > F.col("t1"))
         .groupBy("user_id").agg(F.min("sec").alias("t2")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id").filter(F.col("sec") > F.col("t2"))
         .groupBy("user_id").agg(F.min("sec").alias("t3")))
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked_after"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased_after"))
    return (nv.crossJoin(nc).crossJoin(np_)
            .select("n_viewed", "n_clicked_after", "n_purchased_after",
                    spark_round_ratio("n_clicked_after", "n_viewed", 6)
                     .alias("click_rate"),
                    spark_round_ratio("n_purchased_after", "n_viewed", 6)
                     .alias("purchase_rate")))


@register(
    "hourly_anomaly_flags",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    base AS (SELECT event_type, CAST(MIN(x) AS BIGINT) AS m
             FROM hourly GROUP BY event_type),
    cent AS (
      SELECT h.event_type, h.x - b.m AS x
      FROM hourly h JOIN base b ON b.event_type = h.event_type
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT)      AS n,
             CAST(SUM(x) AS BIGINT)        AS s,
             CAST(SUM(x * x) AS BIGINT)    AS ss
      FROM cent GROUP BY event_type
    )
    SELECT c.event_type,
           st.n AS n_hours,
           CAST(SUM(CASE WHEN st.n > 1
                          AND (st.n * c.x - st.s) * (st.n * c.x - st.s)
                              * (st.n - 1)
                              > 4 * st.n * (st.n * st.ss - st.s * st.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
    FROM cent c JOIN stats st ON st.event_type = c.event_type
    GROUP BY c.event_type, st.n
    """,
    tags=("anomaly", "timeseries"),
)
def hourly_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous-hour detection: hours whose event count sits more
    than 2 sample standard deviations from that type's mean. The
    |z| > 2 test is algebraically rearranged into PURE INTEGER
    arithmetic — (n*x - s)^2 * (n-1) > 4 * n * (n*ss - s^2) — so both
    engines evaluate the exact same predicate with no float
    variance-formula drift (Welford vs two-pass would differ in the
    last ulp right at the boundary).

    Counts are CENTERED on the per-type minimum first (variance and
    deviations are shift-invariant): with raw counts, s^2 overflows
    int64 once a type exceeds ~3e9 events — a 100 TB stream does.
    After centering, magnitudes are bounded by deviations, not
    totals."""
    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy("event_type",
                        F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).cast("long").alias("x")))
    base = hourly.groupBy("event_type").agg(
        F.min("x").cast("long").alias("m"))
    cent = (hourly.join(base, "event_type")
            .select("event_type", (F.col("x") - F.col("m")).alias("x")))
    stats = (cent.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("x").cast("long").alias("s"),
                  F.sum(F.col("x") * F.col("x")).cast("long").alias("ss")))
    j = cent.join(stats, "event_type")
    dev = F.col("n") * F.col("x") - F.col("s")
    anomalous = ((F.col("n") > 1)
                 & (dev * dev * (F.col("n") - 1)
                    > 4 * F.col("n")
                    * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))))
    return (j.groupBy("event_type", F.col("n").alias("n_hours"))
            .agg(F.sum(F.when(anomalous, 1).otherwise(0)).cast("long")
                  .alias("n_anomalous")))
