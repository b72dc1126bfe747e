"""As-of join — a custom operator Spark lacks natively (brief §custom
operators; PySpark guide "as-of / range join").

`asof_join(left, right)`: for every left row, attach the nearest
right row with the same key — the most recent at-or-before row
(`direction="backward"`, default) or the earliest at-or-after row
(`direction="forward"`), optionally bounded by `tolerance`
(pd.merge_asof semantics, verified against it in tests).

Implementation: union-then-window, not merge_asof-per-group:
tag both sides, union, and take the last/first non-null right payload
over (key ORDER BY ts, side) — one shuffle on the key, fully
JVM-side, no Python, no per-group pandas. This composes with any
payload width and inherits AQE skew handling on the key column.

Equality-timestamp semantics: a right row AT the same instant as the
left row IS visible in both directions (matching DuckDB's ASOF JOIN
and pd.merge_asof defaults) — enforced by the side tag's sort
position at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_RTS = "__p___rts"  # right-side timestamp carried as an extra payload


def asof_join(left: DataFrame, right: DataFrame,
              key: str, ts: str,
              payload_cols: list[str],
              how: str = "left",
              direction: str = "backward",
              tolerance=None) -> DataFrame:
    """Attach to each `left` row the nearest `right` payload with the
    same `key` (backward: right.ts <= left.ts; forward: right.ts >=
    left.ts). Payload columns are null when no right row qualifies —
    including when the nearest one is further than `tolerance`
    (seconds for timestamp `ts`, plain difference for numeric `ts`).
    `how='inner'` drops unmatched left rows."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    carry = [*payload_cols]
    lhs = left.withColumn("__side", F.lit(1 if direction == "backward" else 0))
    for c in carry:
        lhs = lhs.withColumn(f"__p_{c}",
                             F.lit(None).cast(right.schema[c].dataType))
    lhs = lhs.withColumn(_RTS, F.lit(None).cast(right.schema[ts].dataType))
    rhs = (right.select(
        key, ts,
        *[F.col(c).alias(f"__p_{c}") for c in carry])
        .withColumn(_RTS, F.col(ts))
        .withColumn("__side", F.lit(0 if direction == "backward" else 1)))
    left_cols = [c for c in left.columns]
    unioned = lhs.select(
        *left_cols, "__side", _RTS, *[f"__p_{c}" for c in carry]
    ).unionByName(
        rhs.select(
            *[F.col(c) if c in (key, ts)
              else F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_cols],
            "__side", _RTS, *[f"__p_{c}" for c in carry]),
        allowMissingColumns=False)
    # Sort-position contract: the qualifying right row at an EQUAL ts
    # must fall inside the left row's window in both directions —
    # backward scans preceding rows (right tagged 0, sorts first);
    # forward scans following rows (right tagged 1, sorts last).
    if direction == "backward":
        w = (Window.partitionBy(key).orderBy(ts, "__side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        left_tag = 1
    else:
        w = (Window.partitionBy(key).orderBy(ts, "__side")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
        left_tag = 0
    filled = unioned.select(
        *left_cols, "__side",
        pick(_RTS).alias("__f_rts"),
        *[pick(f"__p_{c}").alias(f"__f_{c}") for c in carry])
    out = filled.filter(F.col("__side") == left_tag).drop("__side")
    if tolerance is not None:
        if isinstance(right.schema[ts].dataType, TimestampType):
            delta = F.abs(F.unix_timestamp(ts)
                          - F.unix_timestamp("__f_rts"))
        else:
            delta = F.abs(F.col(ts) - F.col("__f_rts"))
        within = delta <= F.lit(tolerance)
        for c in carry:
            out = out.withColumn(f"__f_{c}",
                                 F.when(within, F.col(f"__f_{c}")))
    out = out.drop("__f_rts")
    for c in carry:
        out = out.withColumnRenamed(f"__f_{c}", f"asof_{c}")
    if how == "inner":
        out = out.dropna(subset=[f"asof_{payload_cols[0]}"])
    return out
