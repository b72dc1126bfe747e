"""Relational operator coverage (SURVEY.md §2.2-§2.8).

Each query is the Spark-first restatement of a reference operator
family, exercised on the driver's TPC-H-ish corpus, with a DuckDB
oracle. Reference citations are on each function.

Design notes for 100 TB scale (applies to every query here):

- All plans are declarative DataFrame ops — Catalyst handles predicate
  pushdown, column pruning, and join strategy selection (SURVEY §4
  X1-X4, X16).
- Dimension tables (region/nation/part/supplier) are broadcast
  explicitly where the join is guaranteed small-side; fact-fact joins
  shuffle on their equi-keys and AQE handles skew.
- Aggregates are hash aggregates with map-side partial aggregation —
  no collect()-and-loop anywhere.
- Float outputs are rounded on both sides (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.registry import register
from transcript_analysis_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A-family: aggregations
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags=("A1", "A5", "A6", "A7"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregate: the dashboard aggregate family
    (reference `server/dashboard.py:126-176`, `sql/check_scoring.sql:22-33`)
    as one hash-aggregate with map-side partials."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "last_order_per_nation",
    oracle="""
    SELECT n.n_name,
           STRFTIME(MAX(o.o_orderdate), '%Y-%m-%d') AS last_order_date,
           COUNT(*)                                 AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("J1", "A5"),
)
def last_order_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join + GROUP BY MAX — the last-publish-per-channel
    query (reference `maintain_database.py:289-306`). nation is
    broadcast; orders⋈customer shuffles on the key."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order_date"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "nation_dashboard",
    oracle="""
    SELECT n.n_name,
           COUNT(c.c_custkey)                                        AS n_customers,
           COUNT(*) FILTER (WHERE c.c_acctbal > 5000)                AS n_high_balance,
           COUNT(*) FILTER (WHERE c.c_mktsegment = 'BUILDING')       AS n_building,
           ROUND(COALESCE(SUM(c.c_acctbal), 0), 2)                   AS total_balance
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("J2", "A7"),
)
def nation_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + conditional counts — the channel dashboard
    rollup (reference `server/dashboard.py:162-176`)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("n_high_balance"),
            F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n_building"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_balance"),
        )
    )


@register(
    "corpus_counts",
    oracle="""
    SELECT (SELECT COUNT(*) FROM customer)                       AS n_customers,
           (SELECT COUNT(*) FROM orders)                         AS n_orders,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders)        AS n_customers_with_orders,
           (SELECT COUNT(DISTINCT o_orderdate) FROM orders)      AS n_order_dates
    """,
    tags=("A1", "A2", "A3"),
)
def corpus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table stats + COUNT(DISTINCT) — the dashboard stat block
    (reference `server/dashboard.py:126-149`). Parquet metadata makes
    plain counts O(files); distinct counts hash-aggregate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    counts = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        F.countDistinct("o_orderdate").alias("n_order_dates"),
    )
    n_cust = c.agg(F.count(F.lit(1)).alias("n_customers"))
    return n_cust.crossJoin(counts).select(
        "n_customers", "n_orders", "n_customers_with_orders", "n_order_dates")


@register(
    "status_histogram",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("A6",),
)
def status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status histogram — the task-state histogram
    (reference `server/dashboard.py:231-235`, `sql/check_scoring.sql:22-26`)."""
    return (_t(spark, sf_dir, "orders")
            .groupBy("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n")))


@register(
    "deterministic_sample_extrapolate",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) * 50                                            AS est_rows,
           COUNT(*) FILTER (WHERE l_quantity > 25) * 50             AS est_high_qty
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    GROUP BY l_returnflag
    """,
    tags=("A4",),
)
def deterministic_sample_extrapolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-aggregate extrapolation — TABLESAMPLE + FILTER * 100
    (reference `sql/check_scoring.sql:29-33`), made deterministic with
    a key-modulus sample so the oracle reproduces it exactly."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey") % 50 == 0)
        .groupBy("l_returnflag")
        .agg(
            (F.count(F.lit(1)) * 50).alias("est_rows"),
            (F.count(F.when(F.col("l_quantity") > 25, 1)) * 50).alias("est_high_qty"),
        )
    )


@register(
    "monthly_revenue_rollup",
    oracle="""
    SELECT STRFTIME(o_orderdate, '%Y-%m')      AS order_month,
           COUNT(*)                            AS n_orders,
           ROUND(SUM(o_totalprice), 2)         AS revenue,
           ROUND(AVG(o_totalprice), 4)         AS avg_order_value
    FROM orders
    GROUP BY STRFTIME(o_orderdate, '%Y-%m')
    """,
    tags=("A5", "date"),
)
def monthly_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-bucketed rollup — the date/time scalar family (SURVEY §2.8)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
        )
    )


@register(
    "weighted_axis_score",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             SUM(l_extendedprice * (l_discount - 0.05))        AS raw_sum,
             SUM(ABS(l_extendedprice * (l_discount - 0.05)))   AS max_sum
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND(raw_sum, 2) AS raw_score,
           ROUND(max_sum, 2) AS max_score,
           CASE WHEN max_sum = 0 THEN 50.0
                ELSE ROUND(100.0 * (max_sum + raw_sum) / (2 * max_sum), 3)
           END AS pct_score
    FROM base
    """,
    tags=("A11",),
)
def weighted_axis_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8values axis reduce (A11): raw += effect*multiplier,
    max += abs(effect), pct = 100*(max+raw)/(2*max) with the max=0 → 50
    branch (reference `run_8values_survey.py:306-324`)."""
    l = _t(spark, sf_dir, "lineitem")
    effect = F.col("l_extendedprice") * (F.col("l_discount") - 0.05)
    base = l.groupBy("l_returnflag").agg(
        F.sum(effect).alias("raw_sum"),
        F.sum(F.abs(effect)).alias("max_sum"),
    )
    return base.select(
        "l_returnflag",
        F.round("raw_sum", 2).alias("raw_score"),
        F.round("max_sum", 2).alias("max_score"),
        F.when(F.col("max_sum") == 0, F.lit(50.0))
         .otherwise(F.round(100.0 * (F.col("max_sum") + F.col("raw_sum"))
                            / (2 * F.col("max_sum")), 3))
         .alias("pct_score"),
    )


# ---------------------------------------------------------------------------
# J-family: joins
# ---------------------------------------------------------------------------

@register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J4", "T1"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — THE incremental-work operator of the reference
    (pending = candidates minus done, `client/async_processing_client.py:226-248`)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


@register(
    "customers_with_big_order",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tags=("J3",),
)
def customers_with_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join — EXISTS chosen by the reference for index probes
    (`client/async_processing_client.py:233-246`); Spark plans left-semi."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@register(
    "brand_revenue",
    oracle="""
    SELECT p.p_brand,
           COUNT(*)                                           AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    headline=True,
    tags=("J5", "J9"),
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast lookup join — the hand-rolled dict join of
    `migrate_data.py:30-77` done as `join(broadcast(dim))`; the fact
    side never shuffles."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
        )
    )


@register(
    "shipdate_within_order_window",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*)                    AS n_lineitems,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate >= o.o_orderdate
       AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
    tags=("J6",),
)
def shipdate_within_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + interval-range join — the reference's word-range →
    segment-interval mapping shape (`build_islands_from_scores.py:145-167`):
    equi key keeps it a hash join, the range predicate filters post-match."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        l.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "missing_nation_priority_combos",
    oracle="""
    WITH expected AS (
      SELECT n.n_name, p.o_orderpriority
      FROM nation n
      CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    ),
    existing AS (
      SELECT DISTINCT n.n_name, o.o_orderpriority
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    )
    SELECT e.n_name, e.o_orderpriority
    FROM expected e
    WHERE NOT EXISTS (SELECT 1 FROM existing x
                      WHERE x.n_name = e.n_name
                        AND x.o_orderpriority = e.o_orderpriority)
    """,
    tags=("J8", "J4"),
)
def missing_nation_priority_combos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-join work seeding + anti-join against done — the expected
    work matrix (videos × models) of `server/async_processing_server.py:80-112`
    and `run_8values_survey.py:468-504`."""
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    prios = o.select("o_orderpriority").distinct()
    expected = n.select("n_name").crossJoin(prios)
    existing = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "o_orderpriority")
        .distinct()
    )
    return expected.join(existing, ["n_name", "o_orderpriority"], "left_anti")


# ---------------------------------------------------------------------------
# W/O-family: windows, sorts, top-k
# ---------------------------------------------------------------------------

@register(
    "customer_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           ROUND(COALESCE(LAG(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey), 0), 2)             AS prev_order_price
    FROM orders
    """,
    tags=("A8", "W6"),
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum + lag — `cum_word_count` maintenance
    (reference `maintain_database.py:462-481`) and the prev-row interval
    construction (`build_islands_from_scores.py:150-165`), as window
    functions instead of insert-time state."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
         .alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2)
         .alias("prev_order_price"),
    )


@register(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
    tags=("O3",),
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k — the cosine top-k shape (reference
    `run_8values_survey.py:269-283`) over a generic measure."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.select("o_custkey", "o_orderkey", "o_totalprice",
                     F.row_number().over(w).cast("long").alias("rk"))
            .filter(F.col("rk") <= 3))


@register(
    "first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS first_order_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk = 1
    """,
    tags=("O4",),
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON first-per-group (reference
    `embed_transcripts_to_vector_db.py:377-394`) via row_number."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.select("o_custkey", "o_orderkey", "o_orderdate",
                     F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") == 1)
            .select("o_custkey",
                    F.col("o_orderkey").alias("first_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_order_date")))


@register(
    "global_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("O1", "O2"),
)
def global_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans a TakeOrderedAndProject (per-
    partition top-k then merge; no global sort)."""
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(10))


# ---------------------------------------------------------------------------
# U-family: set ops
# ---------------------------------------------------------------------------

@register(
    "customer_only_nations",
    oracle="""
    SELECT n.n_name
    FROM nation n
    JOIN (
      SELECT DISTINCT c_nationkey AS k FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey AS k FROM supplier
    ) d ON n.n_nationkey = d.k
    """,
    tags=("U1", "U2"),
)
def customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference + DISTINCT — the uploads-minus-DB missing-video
    computation (reference `maintain_database.py:109-151`) as a
    relational EXCEPT instead of driver-side Python sets."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    n = _t(spark, sf_dir, "nation")
    return (c.exceptAll(s)
            .join(F.broadcast(n), F.col("k") == n.n_nationkey)
            .select("n_name"))


# ---------------------------------------------------------------------------
# Scalar-function family (string / JSON)
# ---------------------------------------------------------------------------

@register(
    "normalize_documents",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN TRIM(norm) = '' THEN 0
                ELSE LEN(STRING_SPLIT_REGEX(TRIM(norm), '\s+'))
           END AS word_count,
           norm AS text_formatted
    FROM (
      SELECT doc_id,
             REGEXP_REPLACE(
               REGEXP_REPLACE(LOWER(text), '\[.*?\]|\{.*?\}', '', 'g'),
               '[^a-z0-9\s]', '', 'g') AS norm
      FROM documents
    )
    """,
    tags=("P1",),
)
def normalize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization projection P1 — lower / strip bracketed
    spans / strip punctuation / word count (reference
    `maintain_database.py:470-474`), all JVM-side string expressions."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), r"\[.*?\]|\{.*?\}", ""),
        r"[^a-z0-9\s]", "")
    return d.select(
        "doc_id",
        F.when(F.trim(norm) == "", F.lit(0))
         .otherwise(F.size(F.split(F.trim(norm), r"\s+")))
         .cast("long").alias("word_count"),
        norm.alias("text_formatted"),
    )


@register(
    "events_json_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                   AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)                                            AS sum_k,
           ROUND(SUM(value), 2)                                       AS sum_value
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "A5"),
)
def events_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + rollup — `channel_snippet->>'title'` family
    (reference `server/dashboard.py:166`, `sql/schema.sql:38,61`) via
    get_json_object on a string column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "events_json_shred",
    oracle="""
    WITH shred AS (
      SELECT event_type,
             '{"meta": {"t": "' || event_type || '"}, "ids": ['
               || (event_id % 7) || ',' || (user_id % 5)
               || '], "k": '
               || (CASE WHEN json_valid(props)
                        THEN props ->> '$.k' END) || '}' AS doc
      FROM events
    )
    SELECT event_type,
           COUNT(*)                                        AS n_events,
           CAST(SUM(CASE WHEN json_valid(doc)
                         THEN CAST(doc ->> '$.k' AS BIGINT) END)
                AS BIGINT)                                 AS sum_k,
           CAST(SUM(CASE WHEN json_valid(doc)
                         THEN CAST(doc ->> '$.ids[0]' AS BIGINT) END)
                AS BIGINT)                                 AS sum_id0,
           CAST(SUM(CASE WHEN json_valid(doc)
                         THEN json_array_length(doc, '$.ids') END)
                AS BIGINT)                                 AS sum_arrlen,
           CAST(SUM(CASE WHEN json_valid(doc)
                          AND (doc ->> '$.meta.t') = event_type
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_meta_match,
           CAST(SUM(CASE WHEN NOT json_valid(doc)
                          OR (doc ->> '$.zzz') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_missing
    FROM shred
    GROUP BY event_type
    """,
    tags=("json", "A5"),
)
def events_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep JSON-path shredding — the full get_json_object surface
    (nested object path, array index, array length, missing key) over
    a document CONSTRUCTED per row from typed columns, then rolled up
    exactly. Second registered JSON oracle beyond `events_json_rollup`
    (r11 verdict item 6): the generative twin is `tools/diff_fuzz.py
    --mode json`; this pins one rich hand-written shape the driver
    re-checks every window. Reference analog: the
    `channel_snippet->>'title'` JSON-path family
    (`server/dashboard.py:166`, `sql/schema.sql:38,61`). The oracle's
    extractions are json_valid-guarded (the fuzzer adapter discipline,
    r12 advice): DuckDB's ->> RAISES on malformed JSON where Spark's
    get_json_object returns NULL, so a non-integer props.$.k must
    degrade to NULLs on both sides, not crash the oracle.

    Scale shape: map-only construction + extraction (JVM codegen, no
    UDF), one hash aggregate on a 5-value key — a single shuffle of
    5 rows per partition after partial aggregation."""
    e = _t(spark, sf_dir, "events")
    doc = F.expr(
        """'{"meta": {"t": "' || event_type || '"}, "ids": ['
           || (event_id % 7) || ',' || (user_id % 5)
           || '], "k": ' || get_json_object(props, '$.k') || '}'""")
    d = e.select("event_type", doc.alias("doc"))
    gjo = F.get_json_object
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(gjo("doc", "$.k").cast("long")).alias("sum_k"),
        F.sum(gjo("doc", "$.ids[0]").cast("long")).alias("sum_id0"),
        F.sum(F.json_array_length(gjo("doc", "$.ids"))
              .cast("long")).alias("sum_arrlen"),
        F.sum(F.when(gjo("doc", "$.meta.t") == F.col("event_type"),
                     F.lit(1)).otherwise(F.lit(0))
              .cast("long")).alias("n_meta_match"),
        F.sum(F.when(gjo("doc", "$.zzz").isNull(), F.lit(1))
              .otherwise(F.lit(0)).cast("long")).alias("n_missing"),
    )


@register(
    "sql_frontend_revenue_by_region",
    oracle="""
    SELECT r.r_name,
           COUNT(*)                                              AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    headline=True,
    tags=("sql", "J1"),
)
def sql_frontend_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql frontend surface: the same Catalyst plans are
    reachable through ANSI SQL over registered views (the engine's
    second API, replacing the reference's SQL-strings-to-Postgres
    path). 5-way star join: Catalyst broadcast-joins every dim."""
    from transcript_analysis_spark.sources.tables import register_views
    # r13: register only the referenced tables — catalog scoping,
    # not a result change (measured -12% min-of-5 at sf0.1).
    register_views(spark, sf_dir, tables=[
        "lineitem", "orders", "customer", "nation", "region"])
    return spark.sql("""
        SELECT r.r_name,
               COUNT(*)                                              AS n_items,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """)


@register(
    "sql_frontend_recursive_gapfill",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '2001-12-01'
    ),
    rev AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT)       AS n_orders,
             ROUND(SUM(o_totalprice), 2)    AS revenue
      FROM orders GROUP BY 1
    )
    SELECT strftime(months.m, '%Y-%m')       AS month,
           COALESCE(rev.n_orders, 0)         AS n_orders,
           COALESCE(rev.revenue, 0.0)        AS revenue
    FROM months LEFT JOIN rev ON rev.month = strftime(months.m, '%Y-%m')
    """,
    tags=("sql", "recursive", "gapfill"),
)
def sql_frontend_recursive_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling via a RECURSIVE CTE through the spark.sql
    frontend (Spark 4's WITH RECURSIVE): generate the fiscal month
    series 1995-01..2001-12, left-join the monthly revenue rollup, and
    zero-fill months with no orders — the TimescaleDB
    `time_bucket_gapfill` pattern. The recursion is O(#months) driver
    rows; the corpus side stays one hash aggregate."""
    from transcript_analysis_spark.sources.tables import register_views
    register_views(spark, sf_dir, tables=["orders"])  # r13 scoping
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < DATE '2001-12-01'
        ),
        rev AS (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                 COUNT(*)                            AS n_orders,
                 ROUND(SUM(o_totalprice), 2)         AS revenue
          FROM orders GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM')      AS month,
               COALESCE(rev.n_orders, 0L)            AS n_orders,
               COALESCE(rev.revenue, 0.0D)           AS revenue
        FROM months LEFT JOIN rev
          ON rev.month = date_format(months.m, 'yyyy-MM')
    """)


@register(
    "revenue_rollup_hierarchy",
    oracle="""
    SELECT COALESCE(r.r_name, '__ALL__')  AS region_name,
           COALESCE(n.n_name, '__ALL__')  AS nation_name,
           COUNT(*)                        AS n_orders,
           ROUND(SUM(o.o_totalprice), 2)   AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    tags=("A5", "rollup"),
)
def revenue_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total) — the
    multi-level dashboard rollup in one pass (Spark expands grouping
    sets in a single shuffle). NULL grouping markers are coalesced to a
    sentinel so the oracle hash matches. (Empty-input grouping-sets
    divergence: see sales_rollup_cube / tests/test_diff_fuzz.py.)"""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .select(F.coalesce("r_name", F.lit("__ALL__")).alias("region_name"),
                F.coalesce("n_name", F.lit("__ALL__")).alias("nation_name"),
                "n_orders", "revenue")
    )


@register(
    "status_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot", "A7"),
)
def status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order-status columns per priority. Spark's
    pivot with an explicit value list is one hash aggregate — no extra
    pass to discover values."""
    o = _t(spark, sf_dir, "orders")
    wide = (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1))))
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"))


@register(
    "status_unpivot",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'status_f' AS status_col,
           CAST(status_f AS BIGINT) AS n_orders FROM wide
    UNION ALL
    SELECT o_orderpriority, 'status_o', CAST(status_o AS BIGINT) FROM wide
    UNION ALL
    SELECT o_orderpriority, 'status_p', CAST(status_p AS BIGINT) FROM wide
    """,
    tags=("pivot", "unpivot"),
)
def status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide -> long): the inverse of `status_pivot`,
    via the native `DataFrame.unpivot` (Spark's UNPIVOT, one
    Generate — no N-way self-union scan). The oracle spells it as the
    ANSI UNION ALL equivalent."""
    wide = status_pivot(spark, sf_dir)
    return (wide.unpivot(
        ["o_orderpriority"], ["status_f", "status_o", "status_p"],
        "status_col", "n_orders")
        .select("o_orderpriority", "status_col",
                F.col("n_orders").cast("long").alias("n_orders")))


@register(
    "customer_order_ranks",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK()       OVER w AS price_rank,
           DENSE_RANK() OVER w AS price_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT)     AS price_quartile,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                           AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "O3"),
)
def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family (rank / dense_rank / ntile / lead)
    — introduced by the Spark translation of W4 (SURVEY §2.5 note) and
    exposed as first-class operators."""
    o = _t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.rank().over(wp).cast("long").alias("price_rank"),
        F.dense_rank().over(wp).cast("long").alias("price_dense_rank"),
        F.ntile(4).over(wp).cast("long").alias("price_quartile"),
        F.lead("o_orderkey").over(wd).alias("next_orderkey"))


@register(
    "null_semantics_audit",
    oracle="""
    WITH x AS (
      SELECT c_custkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
      FROM customer
    )
    SELECT COUNT(*)                                  AS n_rows,
           COUNT(seg_or_null)                        AS n_nonnull_seg,
           COUNT(DISTINCT seg_or_null)               AS n_distinct_seg,
           ROUND(AVG(bal_or_null), 4)                AS avg_pos_bal,
           ROUND(SUM(COALESCE(bal_or_null, 0)), 2)   AS sum_bal_zerofill,
           COUNT(*) FILTER (WHERE seg_or_null IS NULL) AS n_null_seg
    FROM x
    """,
    tags=("nulls", "A7"),
)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL discipline in one query: NULLIF generation, COUNT(col) vs
    COUNT(*), null-skipping AVG, COALESCE zero-fill, IS NULL counting
    — the COALESCE-sentinel family of the reference
    (`setup_8values.py:123-127`)."""
    c = _t(spark, sf_dir, "customer")
    x = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.when(F.col("c_acctbal") < 0, None)
         .otherwise(F.col("c_acctbal")).alias("bal_or_null"))
    return x.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg_or_null").alias("n_nonnull_seg"),
        F.countDistinct("seg_or_null").alias("n_distinct_seg"),
        F.round(F.avg("bal_or_null"), 4).alias("avg_pos_bal"),
        F.round(F.sum(F.coalesce("bal_or_null", F.lit(0.0))), 2)
         .alias("sum_bal_zerofill"),
        F.count(F.when(F.col("seg_or_null").isNull(), 1)).alias("n_null_seg"))


@register(
    "handle_normalization",
    oracle="""
    SELECT c_custkey,
           TRIM(LTRIM(LOWER(c_name), '@#'))               AS handle,
           LEFT(c_name, 12)                               AS truncated,
           CAST(LENGTH(REGEXP_REPLACE(c_name, '\\s+', '', 'g')) AS BIGINT)
                                                          AS squeezed_len,
           REPLACE(c_mktsegment, 'BUILD', 'BLD')          AS seg_short
    FROM customer
    """,
    tags=("string", "scalar"),
)
def handle_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Handle/label cleanup family (reference lstrip('@')/strip at
    `server/dashboard.py:250,271`, whitespace-squeeze label
    normalization `run_8values_survey.py:218-219`, str[:1000] error
    truncation `island_worker.py:142`) as JVM string expressions."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim(F.expr("ltrim('@#', lower(c_name))")).alias("handle"),
        F.substring("c_name", 1, 12).alias("truncated"),
        F.length(F.regexp_replace("c_name", r"\s+", "")).cast("long")
         .alias("squeezed_len"),
        F.replace(F.col("c_mktsegment"), F.lit("BUILD"), F.lit("BLD"))
         .alias("seg_short"))


@register(
    "order_value_statistics",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4)  AS p90_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4)          AS stddev_price,
           ROUND(CORR(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS corr_price_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("stats", "A5"),
)
def order_value_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: exact interpolated quantiles
    (median/p90), sample stddev, correlation — the distribution
    analytics the reference's roadmap islands analysis calls for
    (`ROADMAP.md:68-73` length distributions). At scale, swap exact
    percentile for `percentile_approx` without plan changes."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)
                  .alias("median_price"),
                 F.round(F.expr("percentile(o_totalprice, 0.9)"), 4)
                  .alias("p90_price"),
                 F.round(F.stddev_samp("o_totalprice"), 4)
                  .alias("stddev_price"),
                 F.round(F.corr("o_totalprice",
                                F.col("o_custkey").cast("double")), 6)
                  .alias("corr_price_cust")))


@register(
    "nation_segment_sets",
    oracle="""
    SELECT c_nationkey                                             AS nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
                                                                   AS segments,
           COUNT(DISTINCT c_mktsegment)                            AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("A9", "array"),
)
def nation_segment_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation with deterministic ordering:
    sort_array(collect_set(...)) — the ordered-collection contract
    applied to set aggregation. The set is serialized to a
    comma-joined string because the correctness harness hashes rows
    through pandas, which cannot hash array cells."""
    c = _t(spark, sf_dir, "customer")
    return (c.groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment")))
                  .alias("segments"),
                 F.countDistinct("c_mktsegment").alias("n_segments")))


@register(
    "all_account_parties",
    oracle="""
    SELECT party_kind, COUNT(*) AS n,
           ROUND(SUM(acctbal), 2) AS total_balance
    FROM (
      SELECT 'customer' AS party_kind, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier', s_acctbal FROM supplier
    )
    GROUP BY party_kind
    """,
    tags=("U1", "union"),
)
def all_account_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogenous sources into one rollup — the
    combine-then-aggregate shape (idempotent re-insert semantics are
    dropDuplicates + append, SURVEY §2.7 note)."""
    c = (_t(spark, sf_dir, "customer")
         .select(F.lit("customer").alias("party_kind"),
                 F.col("c_acctbal").alias("acctbal")))
    s = (_t(spark, sf_dir, "supplier")
         .select(F.lit("supplier").alias("party_kind"),
                 F.col("s_acctbal").alias("acctbal")))
    return (c.unionByName(s)
            .groupBy("party_kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("acctbal"), 2).alias("total_balance")))


@register(
    "status_priority_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("A5", "cube", "olap"),
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all 2^k grouping sets in one pass (the OLAP
    companion to `revenue_rollup_hierarchy`'s ROLLUP): per-status,
    per-priority, per-pair, and grand-total rows, with NULL as the
    all-values marker in rolled-up dimensions. One shuffle; Spark
    expands grouping sets map-side. (Empty-input grouping-sets
    divergence: see sales_rollup_cube / tests/test_diff_fuzz.py.)"""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price")))


@register(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(FLOOR(epoch(date_trunc('day', o_orderdate))) AS BIGINT)
               AS day_sec,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day,
           revenue,
           ROUND(SUM(revenue) OVER (
             ORDER BY day_sec
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW), 2)
             AS rolling_7day,
           CAST(COUNT(*) OVER (
             ORDER BY day_sec
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS days_in_window
    FROM daily
    """,
    tags=("A8", "window", "timeseries"),
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed rolling aggregate: per-day revenue plus its
    trailing 7-day sum — the range frame follows the TIME axis (gaps
    in the calendar shrink the window), unlike a 7-ROW frame which
    would silently span gaps. Two-level: daily pre-aggregate first, so
    the window input is O(days), then one ordered range frame over
    epoch seconds (518400 = 6 days; the frame is [day-6d, day]).
    The inner daily revenues are pre-rounded on both sides so the
    outer rolling sums add identical doubles."""
    o = _t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
             .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
             .withColumn("day_sec", F.unix_timestamp("day")))
    # An unpartitioned ordered window would serialize all days through
    # ONE task. Partition by year instead, with boundary overlap: each
    # year's last 6 days are ALSO copied into the next year's
    # partition (pad rows), so the first week of January sees its
    # late-December lookback; pad rows are dropped after the frame.
    # Exact at any calendar size, and the window shuffle now spreads
    # across years instead of one reducer.
    yr = daily.withColumn("yr", F.year("day"))
    pad = (yr.filter((F.month("day") == 12) & (F.dayofmonth("day") >= 26))
             .withColumn("yr", F.col("yr") + 1)
             .withColumn("__pad", F.lit(True)))
    both = yr.withColumn("__pad", F.lit(False)).unionByName(pad)
    w = (Window.partitionBy("yr").orderBy("day_sec")
         .rangeBetween(-518400, Window.currentRow))
    return (both.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("rolling_7day"),
        F.count(F.lit(1)).over(w).cast("long").alias("days_in_window"),
        "__pad")
        .filter(~F.col("__pad")).drop("__pad"))


@register(
    "approx_order_stats",
    tags=("A3", "sketch"),
)
def approx_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch family that replaces exact DISTINCT/percentile at
    100 TB: HyperLogLog++ distinct counts (rsd 2%) and approximate
    percentiles — single-pass, mergeable, bounded-memory aggregates
    (exact forms need a full shuffle of the key space). Rows-only
    check by design: sketch outputs are implementation-defined, so no
    cross-engine oracle exists; accuracy is instead pinned against the
    exact aggregates in tests/test_oracle_parity.py (±5%)."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.approx_count_distinct("o_custkey", rsd=0.02)
                  .alias("approx_custs"),
                 F.percentile_approx("o_totalprice", 0.5, 10000)
                  .alias("approx_median"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "customer_name_neardups",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND b.c_custkey > a.c_custkey
     AND b.c_custkey <= a.c_custkey + 10
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    tags=("dedup", "entity-resolution"),
)
def customer_name_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: near-identical names inside
    a (nation, key-window) block — the blocked-pairs pattern again,
    with `levenshtein` (built-in, JVM-side, identical semantics in
    DuckDB) as the comparator. At scale the block is the standard ER
    move: candidate pairs come from a cheap blocking key, the
    expensive comparator runs only inside blocks."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name",
                                             "c_nationkey")
    a = c.select(F.col("c_custkey").alias("key_a"),
                 F.col("c_name").alias("name_a"),
                 F.col("c_nationkey").alias("nk"))
    b = c.select(F.col("c_custkey").alias("key_b"),
                 F.col("c_name").alias("name_b"),
                 F.col("c_nationkey").alias("nk"))
    return (a.join(b, ["nk"])
            .filter((F.col("key_b") > F.col("key_a"))
                    & (F.col("key_b") <= F.col("key_a") + 10))
            .withColumn("edit_dist",
                        F.levenshtein("name_a", "name_b").cast("long"))
            .filter(F.col("edit_dist") <= 1)
            .select("key_a", "key_b", "edit_dist"))


@register(
    "sql_frontend_correlated_subqueries",
    oracle="""
    SELECT n.n_name,
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
              AND c.c_acctbal > 9000)                 AS n_rich,
           EXISTS (SELECT 1 FROM customer c
                   WHERE c.c_nationkey = n.n_nationkey
                     AND c.c_mktsegment = 'BUILDING') AS has_building
    FROM nation n
    """,
    tags=("sql", "subquery", "J3"),
)
def sql_frontend_correlated_subqueries(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Correlated subqueries through the SQL frontend: a scalar
    COUNT subquery and an EXISTS predicate per outer row. Catalyst
    DECORRELATES both into joins (a left-outer aggregate join and an
    existence join) — the surface a reference user writing raw SQL
    exercises constantly, planned without per-row re-execution."""
    from transcript_analysis_spark.sources.tables import register_views
    register_views(spark, sf_dir,
                   tables=["nation", "customer"])  # r13 scoping
    return spark.sql("""
        SELECT n.n_name,
               (SELECT COUNT(*) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey
                  AND c.c_acctbal > 9000)                 AS n_rich,
               EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_nationkey = n.n_nationkey
                         AND c.c_mktsegment = 'BUILDING') AS has_building
        FROM nation n
    """)


@register(
    "nations_with_both_parties",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("U2", "set-op"),
)
def nations_with_both_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — the remaining set operation (EXCEPT is
    `customer_only_nations`, UNION ALL is `all_account_parties`):
    nation keys present on BOTH sides, planned as a left-semi join
    over distincts."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "revenue_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("A5", "grouping-sets", "olap"),
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind ROLLUP/CUBE):
    exactly the per-status, per-priority, and grand-total groupings —
    no cross pairs — in one pass. Spark reaches it through the SQL
    GROUPING SETS clause over a registered view. (Empty-input
    grouping-sets divergence: see sales_rollup_cube /
    tests/test_diff_fuzz.py.)"""
    from transcript_analysis_spark.sources.tables import register_views
    register_views(spark, sf_dir, tables=["orders"])  # r13 scoping
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)
