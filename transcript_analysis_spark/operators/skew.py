"""Skew mitigation — salting for hot keys (SURVEY §4 X6/X7; §7.1
step 7: "a handful of models/videos dominate").

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit fallback for the cases AQE cannot fix: skewed AGGREGATION
keys and skewed BROADCAST-ineligible joins. Both are provided here as
composable operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: list[str], aggs: dict[str, str],
                     salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 aggregates on (key, salt) — the hot key's rows spread over
    `salt_buckets` reducers; phase 2 merges the partials on the key
    alone (tiny input: buckets x distinct keys). Only algebraic
    aggregates are supported: sum, count, min, max.

    `aggs` maps output column -> "fn(col)" e.g. {"n": "count(*)",
    "total": "sum(x)"}.
    """
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    phase1_aggs, phase2_aggs = [], []
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(", 1)
        fn = fn.strip().lower()
        part = f"__p_{out}"
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col))
                               .alias(part))
            phase2_aggs.append(F.sum(part).cast("long").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(part))
            phase2_aggs.append(F.sum(part).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(part))
            phase2_aggs.append(F.min(part).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(part))
            phase2_aggs.append(F.max(part).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {spec}")
    partials = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    return partials.groupBy(*keys).agg(*phase2_aggs)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side with a
    random bucket; replicate the right side across all buckets.
    Correct for 1:N joins where `right` is modest but too large to
    broadcast; for dims that fit in memory, prefer broadcast().
    """
    salted_left = left.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    buckets = left.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("__salt"))
    replicated_right = right.crossJoin(F.broadcast(buckets))
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def key_skew_stats(df: DataFrame, keys: list[str]) -> dict:
    """Skew diagnostic: one distributed aggregation over the key
    histogram, one driver-side scalar row. Reports the hot-key ratio
    (max key count / median key count) — the number that predicts
    whether a shuffle on `keys` straggles.

    At 100 TB run it on a sample (`df.sample(0.01)`); key-count RATIOS
    are stable under uniform sampling."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("median_n"),
        F.avg("n").alias("mean_n")).first()
    if row.n_keys == 0:  # empty input: a diagnostic, not a crash
        return {"n_keys": 0, "max_n": 0, "median_n": 0.0,
                "mean_n": 0.0, "skew_ratio": 1.0}
    ratio = float(row.max_n) / max(1.0, float(row.median_n))
    return {"n_keys": row.n_keys, "max_n": row.max_n,
            "median_n": float(row.median_n), "mean_n": float(row.mean_n),
            "skew_ratio": round(ratio, 2)}


def recommend_salt_buckets(stats: dict, target_ratio: float = 4.0,
                           max_buckets: int = 64) -> int:
    """Salt-factor recommendation from `key_skew_stats`: enough
    buckets to bring the hot key's per-reducer share down to
    `target_ratio` x median, capped (each bucket multiplies phase-2
    input). 1 means no salting needed — AQE alone will cope."""
    import math
    ratio = stats["skew_ratio"]
    if ratio <= target_ratio:
        return 1
    # ceil on the float ratio (int() truncation underestimates), and
    # never 1 once the guard has decided salting IS needed: ratio just
    # above target must still split the hot key at least in half.
    return min(max_buckets, max(2, math.ceil(ratio / target_ratio)))


def auto_salted_aggregate(df: DataFrame, keys: list[str],
                          aggs: dict[str, str],
                          sample_fraction: float | None = None,
                          target_ratio: float = 4.0,
                          max_buckets: int = 64) -> DataFrame:
    """Stats-driven aggregation: measure key skew, then dispatch —
    plain one-phase groupBy when the key histogram is flat, two-phase
    salted aggregation sized by `recommend_salt_buckets` when it is
    hot. Closes the manual-opt-in gap for AGGREGATION skew (AQE only
    rebalances JOIN shuffles).

    The diagnostic pass is one distributed aggregation; at 100 TB pass
    `sample_fraction` (e.g. 0.01) — key-count RATIOS are stable under
    uniform sampling, so the decision is the same at 1% of the scan
    cost. The result is always exact: sampling only informs the
    DISPATCH, never the aggregation input."""
    probe = df.sample(sample_fraction) if sample_fraction else df
    stats = key_skew_stats(probe, keys)
    buckets = recommend_salt_buckets(stats, target_ratio=target_ratio,
                                     max_buckets=max_buckets)
    if buckets <= 1:
        exprs = [F.expr(spec).alias(out) for out, spec in aggs.items()]
        return df.groupBy(*keys).agg(*exprs)
    return salted_aggregate(df, keys, aggs, salt_buckets=buckets)
